package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The windowed distinct-users HLL monitor: streaming == batch EXACTLY
  * (register-max accumulation is order-insensitive, so micro-batch
  * boundaries cannot change the estimate), and the estimate sits inside
  * HLL tolerance of the exact per-window distinct count.
  */
class StreamingNdvSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_ndv_stream")

  test("streaming per-window HLL user NDV equals the batch twin bit-for-bit") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val q = EventStreamProfiler.hourlyDistinctUsersStream(spark, staged)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_ndv_users").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_ndv_users").collect()
        .map(r => r.getAs[java.time.LocalDateTime](0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = EventStreamProfiler.hourlyDistinctUsersBatch(spark, staged).collect()
        .map(r => r.getAs[java.time.LocalDateTime](0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed.keySet == batch.keySet, "window sets differ")
      assert(streamed == batch, "micro-batch boundaries changed the sketch estimate")
    } finally q.stop()
  }

  test("estimates sit inside HLL tolerance of the exact per-window distinct count") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val est = EventStreamProfiler.hourlyDistinctUsersBatch(spark, staged).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(staged)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("ndv"))
      .select(col("window.start").cast("timestamp_ntz").as("h"), col("ndv"))
      .collect().map(r => r.getAs[java.time.LocalDateTime](0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (w, e) =>
      val a = est(w).toDouble
      assert(math.abs(a - e) <= math.max(2.0, 0.06 * e), s"window $w: est=$a exact=$e")
    }
  }
}
