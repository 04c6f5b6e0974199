package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingDecontaminateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Stage the reference corpus's ORIGINAL documents as two micro-batch
    * files (split by doc_id parity, ordered mtimes): the stream then sees
    * exactly the doc universe the ORACLE-GATED batch `decontaminate`
    * reports on, so stream==batch is a full-set equality, not a sample. */
  private def stage(dir: String): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staged = Files.createTempDirectory("docs_decontam")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): java.nio.file.Path = {
      val tmp = Files.createTempDirectory(s"dc_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      staged.resolve(s"$name.parquet")
    }
    val f0 = writeOne(docs.filter("doc_id % 2 = 0"), "batch0")
    val f1 = writeOne(docs.filter("doc_id % 2 = 1"), "batch1")
    f0.toFile.setLastModified(System.currentTimeMillis() - 120000)
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    staged.toString
  }

  test("stream flags exactly the batch decontaminate set, with equal counts, stateless") {
    val dir = SparkSuite.Sf0001
    val staged = stage(dir)
    val q = StreamingDecontaminate.flagged(spark, staged, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_decontam").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum >= 500L, "both staged batches must ingest")
      val streamed = spark.table("stream_decontam")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // the oracle-gated batch op over the same corpus — (doc, distinct
      // shared grams) must match EXACTLY, not just the flagged id set
      val batch = graft.operators.TextAnalysis.decontaminate(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed == batch,
        s"stream/batch contamination reports differ: stream-only=${(streamed.keySet -- batch.keySet).take(5)}, " +
          s"batch-only=${(batch.keySet -- streamed.keySet).take(5)}")
      // fixture plants contamination (originals of every 97th eval copy) —
      // an empty report would mean the guard is disconnected from the data
      assert(streamed.nonEmpty, "planted contamination not flagged")
      // the row-local form must keep ZERO streaming state: no watermark,
      // no aggregation store — that is the whole point of the design
      assert(q.recentProgress.forall(p => Option(p.stateOperators).forall(_.isEmpty)),
        "decontamination guard should run stateless")
    } finally q.stop()
  }

  test("a doc under 5 words is never flagged (descending-sequence guard)") {
    // sequence(1, n-4) with n<5 would generate a DESCENDING sequence and
    // junk grams; the guard must emit an empty gram array instead
    val staged = Files.createTempDirectory("docs_decontam_short").toString
    import spark.implicits._
    Seq((1L, "too short", "en", "src1", 9L), (2L, "a b c d", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    val q = StreamingDecontaminate.flagged(spark, staged, SparkSuite.Sf0001)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_decontam_short").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stream_decontam_short").isEmpty,
        "sub-5-word docs must produce no grams and no flags")
    } finally q.stop()
  }
}
