package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Batch 0 = the original documents; batch 1 = exact copies with doc_id
    * offset +10⁶ — every batch-1 row is a cross-batch duplicate, so the
    * stream's state must survive the batch boundary to suppress them. */
  private def stageTwoBatches(dir: String): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // batch 1 = id-shifted exact copies of batch 0: every batch-1 doc is a
    // duplicate the stateful dedup must reject across the batch boundary
    StreamFixtures.stageTwoFrames(docs,
      docs.withColumn("doc_id", col("doc_id") + 1000000L), "docs_dedup_stream")
  }

  test("streaming keep-first dedup across micro-batches matches batch keep-first") {
    val dir = SparkSuite.Sf0001
    val staged = stageTwoBatches(dir)
    val q = StreamingDedup.dedupStream(spark, staged)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_dedup")
      .start()
    try {
      q.processAllAvailable()
      // both batches were ingested
      assert(q.recentProgress.map(_.numInputRows).sum == 1000L)
      val streamed = spark.table("stream_dedup")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

      // batch twin: keep-first over the union of both staged batches
      val union = spark.read.parquet(staged)
        .select(col("doc_id"), md5(col("text")).as("text_hash"))
      val w = Window.partitionBy("text_hash").orderBy("doc_id")
      val batch = union.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("text_hash", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet

      assert(streamed == batch)
      // survivors are exactly the 500 originals (no +10⁶ id survives)
      assert(streamed.map(_._2).forall(_ < 1000000L))
      assert(streamed.size == 500)
    } finally q.stop()
  }

  test("keep-first state survives a checkpointed stop/restart") {
    import org.apache.spark.sql.Row
    import StreamingDedup.documentsSchema
    val docs = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
    val staged = Files.createTempDirectory("docs_dedup_restart")
    val ckpt = Files.createTempDirectory("dedup_ckpt").toString
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory(s"restart_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    writeOne(docs, "batch0")
    // memory sinks cannot recover from a checkpoint; the parquet file sink
    // can, and is what a real pipeline would use
    val outDir = Files.createTempDirectory("dedup_restart_out").toString
    def startQuery() = StreamingDedup.dedupStream(spark, staged.toString, maxFilesPerTrigger = 10)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .start()
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(spark.read.parquet(outDir).count() == 500)
    } finally q1.stop()
    // after a full stop: 500 exact duplicates (id +10^6) plus ONE new doc
    val newDoc = spark.createDataFrame(
      java.util.List.of(Row(9999999L, "a genuinely new restart-batch document", "en", "restart", 38L)),
      documentsSchema)
    writeOne(docs.withColumn("doc_id", col("doc_id") + 1000000L).unionAll(newDoc), "batch1")
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      // the restarted query recovered its state store: every duplicate is
      // suppressed, only the new document joins the 500 survivors
      val out = spark.read.parquet(outDir)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(out.length == 501, s"expected 500 originals + 1 new doc, got ${out.length}")
      assert(out.count(_._2 == 9999999L) == 1, "new doc missing after restart")
      assert(out.map(_._2).filter(_ != 9999999L).forall(_ < 1000000L),
        "a cross-restart duplicate escaped suppression")
      assert(out.map(_._1).distinct.length == out.length, "duplicate hash emitted")
    } finally q2.stop()
  }

  test("bounded-horizon dedup evicts state at the watermark and re-admits beyond it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import StreamingDedup.TimedDoc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(3600000L + min * 60000L)
    val input = MemoryStream[TimedDoc]
    val q = StreamingDedup
      .dedupStreamBounded(input.toDS(), "0 seconds", horizonMs = 10 * 60000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup_bounded").start()
    try {
      def emitted(): Seq[(String, Long)] = spark.table("stream_dedup_bounded")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // batch 1: first sight of A and B
      input.addData(TimedDoc(1, "A", t(0)), TimedDoc(2, "B", t(0)))
      q.processAllAvailable()
      assert(emitted().toSet == Set(("A", 1L), ("B", 2L)))
      // batch 2: in-horizon duplicate of A suppressed (and extends A's
      // lease to 10:15); C advances the watermark to 10:30, past B's lease
      input.addData(TimedDoc(3, "A", t(5)), TimedDoc(4, "C", t(30)))
      q.processAllAvailable()
      assert(emitted().toSet == Set(("A", 1L), ("B", 2L), ("C", 4L)))
      // batch 3: nothing for A/B — their timed-out state (leases 10:15 /
      // 10:10 < watermark 10:30) is evicted during this batch
      input.addData(TimedDoc(5, "D", t(35)))
      q.processAllAvailable()
      assert(emitted().toSet == Set(("A", 1L), ("B", 2L), ("C", 4L), ("D", 5L)))
      // batch 4: A re-arrives beyond the horizon -> state was evicted ->
      // re-admitted with the NEW id (by design: dedup-within-horizon)
      input.addData(TimedDoc(6, "A", t(36)))
      q.processAllAvailable()
      val fin = emitted()
      assert(fin.toSet == Set(("A", 1L), ("B", 2L), ("C", 4L), ("D", 5L), ("A", 6L)),
        s"got $fin")
      assert(fin.count(_._1 == "A") == 2, "expected A admitted twice (evicted between)")
      assert(!fin.map(_._2).contains(3L), "in-horizon duplicate must stay suppressed")
    } finally q.stop()
  }
}
