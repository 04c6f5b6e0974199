package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_ssj")

  test("stream-stream interval join matches the batch inner range join") {
    val dir = SparkSuite.Sf001 // sf0.001 has only 1 matching pair; 0.01 is denser
    val staged = stageTwoBatches(dir)
    val q = StreamStreamJoin.attributionStream(spark, staged)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_attribution")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_attribution")
        .select("p_id", "c_user", "c_ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)).toSet

      val windowUs = 5L * 60 * 1000000
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"), col("event_id"), col("event_type"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus").as("p_tus"), col("event_id").as("p_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
      val batch = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_tus") <= col("p_tus") &&
            col("c_tus") >= col("p_tus") - windowUs)
        .select(col("p_id"), col("c_user"), (col("c_tus") / 1000).cast("long").as("c_ms"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      assert(streamed.nonEmpty, "expected at least one streamed join result")
      assert(streamed == batch,
        s"streamed=${streamed.size} pairs, batch=${batch.size} pairs")
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched purchases on watermark expiry, equal to batch LEFT join") {
    val dir = SparkSuite.Sf001
    val staged = stageTwoBatches(dir)
    // a third file far past the stream's max event time pushes BOTH sides'
    // watermarks beyond every purchase's match horizon, so all unmatched
    // purchases null-emit deterministically (sentinel event_id -1, excluded
    // from the comparison)
    val maxTs = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("max(ts)").collect()(0).getAs[java.time.LocalDateTime](0)
    val flushTs = maxTs.plusMinutes(30).format(
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    val flushTmp = Files.createTempDirectory("ssj_flush")
    spark.sql(
      s"""SELECT * FROM VALUES
         |  (CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), TIMESTAMP_NTZ'$flushTs', 'purchase', CAST(0.0 AS DOUBLE)),
         |  (CAST(-2 AS BIGINT), CAST(-1 AS BIGINT), TIMESTAMP_NTZ'$flushTs', 'click',    CAST(0.0 AS DOUBLE))
         |  AS t(event_id, user_id, ts, event_type, value)""".stripMargin)
      .coalesce(1).write.mode("overwrite").parquet(flushTmp.toString)
    val part = Files.list(flushTmp).filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
    val flushed = java.nio.file.Paths.get(staged).resolve("batch2_flush.parquet")
    Files.copy(part, flushed, StandardCopyOption.REPLACE_EXISTING)
    flushed.toFile.setLastModified(System.currentTimeMillis())

    val q = StreamStreamJoin.attributionStreamLeftOuter(spark, staged)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_attribution_left")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.table("stream_attribution_left").filter(col("p_id") =!= -1L)
      val streamed = out.select("p_id", "c_user")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet

      val windowUs = 5L * 60 * 1000000
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"), col("event_id"), col("event_type"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus").as("p_tus"), col("event_id").as("p_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
      val batch = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_tus") <= col("p_tus") &&
            col("c_tus") >= col("p_tus") - windowUs, "left")
        .select(col("p_id"), col("c_user"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1))).toSet

      assert(streamed.exists(_._2 == -999L),
        "expected at least one null-extended (zero-click) purchase from watermark expiry")
      assert(streamed == batch,
        s"streamed=${streamed.size} rows, batch=${batch.size} rows; " +
          s"missing=${(batch -- streamed).take(5)}, extra=${(streamed -- batch).take(5)}")
      // state is watermark-bounded: the join buffers far fewer rows than the
      // stream has seen (eviction actually happened)
      val totalEvents = spark.read.parquet(s"$dir/events.parquet").count()
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(Long.MaxValue)
      assert(stateRows < totalEvents,
        s"join state holds $stateRows rows for a $totalEvents-event stream — no eviction?")
    } finally q.stop()
  }
}
