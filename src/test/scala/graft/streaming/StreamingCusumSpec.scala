package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingCusumSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streaming CUSUM steps equal the batch recursion across micro-batches") {
    val dir = SparkSuite.Sf0001
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), unix_micros(col("ts").cast("timestamp")).as("tus"))
    val cut = ev.selectExpr("percentile_approx(tus, 0.5)").collect()(0).getLong(0)
    val staged = StreamFixtures.stageSplit(ev, col("tus") <= cut, "events_cusum")

    // reference rate = overall mean events/type/hour, computed once offline
    val hourly = ev.withColumn("h", expr("tus div 3600000000"))
      .groupBy("event_type", "h").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ref = hourly.map(_._3).sum / hourly.size

    val q = StreamingCusum.cusumStream(spark, staged, refPerHour = ref)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_cusum").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_cusum").collect()
        .map(r => StreamingCusum.Step(r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).toSet

      val twin = StreamingCusum.batchTwin(hourly, ref, thresholdMeans = 1)
      // the stream's last open hour per type hasn't closed yet
      val lastHour = hourly.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val expected = twin.filterNot(s => s.hour == lastHour(s.event_type)).toSet
      assert(streamed == expected,
        s"missing=${(expected -- streamed).take(3)} extra=${(streamed -- expected).take(3)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("a late event for an already-closed hour is dropped, never re-scored (ADVICE r9)") {
    // drive updateState directly with a hand-rolled GroupState double:
    // batch 1 closes hour 0 (event in hour 1 arrives); batch 2 delivers a
    // LATE hour-0 event — it must emit nothing and leave state untouched
    val ref = 2L
    var saved: Option[StreamingCusum.CusumState] = None
    class FakeState extends org.apache.spark.sql.streaming.GroupState[StreamingCusum.CusumState] {
      override def exists: Boolean = saved.isDefined
      override def get: StreamingCusum.CusumState = saved.get
      override def getOption: Option[StreamingCusum.CusumState] = saved
      override def update(s: StreamingCusum.CusumState): Unit = saved = Some(s)
      override def remove(): Unit = saved = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(ms: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(ms: Long): Unit = ()
      override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
      override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    val hr = 3600000000L
    val step = StreamingCusum.updateState(ref, 1) _
    val b1 = step("t", Iterator(
      StreamingCusum.Ev("t", 10L), StreamingCusum.Ev("t", 20L), // hour 0
      StreamingCusum.Ev("t", hr + 5L)), new FakeState).toSeq    // hour 1 opens
    assert(b1.map(_.hour) == Seq(0L), "hour 0 closes exactly once")
    val stateAfterB1 = saved.get
    val b2 = step("t", Iterator(StreamingCusum.Ev("t", 30L)), new FakeState).toSeq
    assert(b2.isEmpty, s"late hour-0 event must be dropped, got $b2")
    assert(saved.get == stateAfterB1, "late event must not perturb the open-hour state")
    // and the open hour still closes normally afterwards
    val b3 = step("t", Iterator(StreamingCusum.Ev("t", 2 * hr + 1L)), new FakeState).toSeq
    assert(b3.map(_.hour) == Seq(1L), "hour 1 closes once despite the late arrival in between")
  }
}
