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
}
