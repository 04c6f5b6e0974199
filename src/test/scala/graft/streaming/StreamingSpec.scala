package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.EventOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streaming profile mode matches the batch fused stats per window") {
    val dir = SparkSuite.Sf0001
    val staged = java.nio.file.Files.createTempDirectory("events_profile_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = EventStreamProfiler.hourlyProfileStream(spark, staged.toString)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_profile").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_profile").collect().map(_.toSeq).toSet
      val batch = EventStreamProfiler.hourlyProfileBatch(spark, dir).collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    // The most common production streaming shape: a stream joined to a
    // static (broadcastable) dimension table — no state store involved,
    // each micro-batch plans the join like a batch query.
    val dir = SparkSuite.Sf0001
    val staged = java.nio.file.Files.createTempDirectory("events_enrich_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val static = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_nationkey"))
    val stream = spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .parquet(staged.toString)
      .join(static, Seq("user_id"), "inner")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_events"))
    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("stream_enriched").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_enriched")
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val batch = spark.read.parquet(s"$dir/events.parquet")
        .join(static, Seq("user_id"), "inner")
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_events"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming native session windows match the batch session_window query") {
    val dir = SparkSuite.Sf0001
    val staged = java.nio.file.Files.createTempDirectory("events_sess_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = EventStreamProfiler.sessionWindowStream(spark, staged.toString)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_sessions_native").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_sessions_native")
        .select("user_id", "sess_start", "sess_end", "n_events")
        .collect().map(_.toSeq).toSet
      val batch = EventOps.sessionWindows(spark, dir)
        .select("user_id", "sess_start", "sess_end", "n_events")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming hourly rollup matches the batch rollup (complete replay)") {
    val dir = SparkSuite.Sf0001
    // the file stream source needs a directory; stage the single-file fixture
    val staged = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = EventStreamProfiler.hourlyRollupStream(spark, staged.toString)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_hourly")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_hourly")
        .select("hour_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      val batch = EventOps.hourlyRollup(spark, dir)
        .select("hour_start", "event_type", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
