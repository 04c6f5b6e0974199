package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.EventOps

class StreamingSessionizerSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Split the single-file events fixture into two event-time-ordered files
    * so the stream runs TWO micro-batches and per-user state genuinely
    * crosses a batch boundary. */
  private def stageTwoBatches(dir: String): String = {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val median = events.selectExpr("percentile_approx(ts, 0.5)").collect()(0).getAs[java.time.LocalDateTime](0)
    val staged = Files.createTempDirectory("events_sessions_stream")
    def writeOne(cond: org.apache.spark.sql.Column, name: String): java.nio.file.Path = {
      val tmp = Files.createTempDirectory(s"half_$name")
      events.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      staged.resolve(s"$name.parquet")
    }
    val f0 = writeOne(col("ts") < median, "batch0")
    val f1 = writeOne(col("ts") >= median, "batch1")
    // file source picks oldest-first under maxFilesPerTrigger: order them
    f0.toFile.setLastModified(System.currentTimeMillis() - 120000)
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    staged.toString
  }

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
