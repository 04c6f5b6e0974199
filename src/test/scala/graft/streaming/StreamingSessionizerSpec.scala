package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.EventOps

class StreamingSessionizerSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_sessions_stream")

  test("stateful streaming sessionization across micro-batches matches batch") {
    val dir = SparkSuite.Sf0001
    val staged = stageTwoBatches(dir)
    val q = StreamingSessionizer.sessionStream(spark, staged)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum == 1000L)
      // update-mode memory sink appends one summary per (user, batch);
      // all three stats are monotonic, so max per user = final state
      val streamed = spark.table("stream_sessions")
        .groupBy("user_id")
        .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"),
          max("longest_session").as("longest_session"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val batch = EventOps.sessionize(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
