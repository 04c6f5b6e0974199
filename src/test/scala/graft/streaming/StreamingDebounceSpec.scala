package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingDebounceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streaming debounce verdicts match the batch lag-window rule bit-for-bit") {
    val dir = SparkSuite.Sf0001
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
    // strict time split: ties stay in batch 0, so per-key arrival order is
    // exactly the batch window's (tus, event_id) order
    val cut = ev.selectExpr("percentile_approx(tus, 0.5)").collect()(0).getLong(0)
    val staged = StreamFixtures.stageSplit(ev, col("tus") <= cut, "events_debounce")

    // 1-hour holdoff: sf0.001's tightest same-key gap is ~9 min, so the
    // rule genuinely fires (60 s would drop nothing at this scale)
    val q = StreamingDebounce.debounceStream(spark, staged, holdoffUs = 3600000000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_debounce").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum == ev.count())
      val streamed = spark.table("stream_debounce")
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("kept")).toMap

      val w = Window.partitionBy("user_id", "event_type").orderBy("tus", "event_id")
      val batch = ev.withColumn("prev", lag(col("tus"), 1).over(w))
        .withColumn("kept", col("prev").isNull || col("tus") - col("prev") >= 3600000000L)
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("kept")).toMap

      assert(streamed.size == batch.size)
      assert(streamed == batch)
      // the rule actually bites on this fixture
      assert(streamed.values.exists(v => !v))
    } finally q.stop()
  }
}
