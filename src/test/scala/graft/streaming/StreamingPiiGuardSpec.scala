package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingPiiGuardSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Stage the corpus WITH the gated rates table's planted decoration
    * (every 3rd doc an email, every 5th a phone), as two micro-batch files:
    * the stream then sees exactly the text universe
    * `TextAnalysis.piiRates` reports on, so the per-source re-aggregation
    * of streamed flags must equal the oracle-gated table column for
    * column. */
  private def stage(dir: String): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" reach user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val staged = Files.createTempDirectory("docs_pii")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): java.nio.file.Path = {
      val tmp = Files.createTempDirectory(s"pii_$name")
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

  test("streamed flags re-aggregate to the oracle-gated rates table, stateless") {
    val dir = SparkSuite.Sf0001
    val staged = stage(dir)
    val q = StreamingPiiGuard.flagged(spark, staged)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_pii").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum >= 500L, "both staged batches must ingest")
      val streamed = spark.table("stream_pii")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // the synthetic prose carries no PII of its own: the flagged id set
      // must be exactly the planted decoration
      assert(streamed.map(_._1).toSet ==
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
          .collect().map(_.getLong(0)).filter(i => i % 3 == 0 || i % 5 == 0).toSet,
        "guard flags differ from the planted PII set")
      // per-source re-aggregation equals the gated batch table
      val batch = graft.operators.TextAnalysis.piiRates(spark, dir).collect()
        .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(6), r.getLong(7))).toMap
      val reagg = streamed.groupBy(_._2).map { case (src, rows) =>
        src -> (rows.count(_._3 > 0).toLong, rows.count(_._4 > 0).toLong,
          rows.length.toLong, rows.map(_._3).sum, rows.map(_._4).sum)
      }
      // sources where nothing was flagged are absent from the stream but
      // present in the rates table with zero counts
      batch.foreach { case (src, cols) =>
        val got = reagg.getOrElse(src, (0L, 0L, 0L, 0L, 0L))
        assert(got == cols, s"source $src: stream $got vs batch $cols")
      }
      assert(streamed.nonEmpty, "planted PII not flagged")
      // row-local regexes must keep ZERO streaming state
      assert(q.recentProgress.forall(p => Option(p.stateOperators).forall(_.isEmpty)),
        "PII guard should run stateless")
    } finally q.stop()
  }

  test("a clean document is never flagged") {
    val staged = Files.createTempDirectory("docs_pii_clean").toString
    import spark.implicits._
    Seq((1L, "plain lowercase prose with no contact runs", "en", "src1", 42L),
        (2L, "digits like 42 or 7 are too short to be phones", "en", "src1", 46L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(staged)
    val q = StreamingPiiGuard.flagged(spark, staged)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_pii_clean").start()
    try {
      q.processAllAvailable()
      assert(spark.table("stream_pii_clean").isEmpty,
        "clean docs must produce no flags")
    } finally q.stop()
  }
}
