package graft.streaming

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
