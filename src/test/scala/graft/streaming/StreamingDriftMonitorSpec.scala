package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingDriftMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val uniform =
    Seq("click", "error", "purchase", "signup", "view").map(_ -> 0.2).toMap

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_drift_stream")

  test("streaming per-window chi2 equals the batch computation on the same windows") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val q = StreamingDriftMonitor.monitor(spark, staged, uniform)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_drift")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_drift").collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(7), r.getDouble(8))).toMap
      val batch = StreamingDriftMonitor.driftSelect(
        spark.read.parquet(staged)
          .withColumn("ts_utc", col("ts").cast("timestamp"))
          .groupBy(window(col("ts_utc"), "1 hour")),
        uniform).collect()
        .map(r => r.getTimestamp(0) -> (r.getLong(7), r.getDouble(8))).toMap
      assert(streamed.keySet == batch.keySet, "window sets differ")
      batch.foreach { case (w, (n, chi2)) =>
        assert(streamed(w)._1 == n, s"window $w count: ${streamed(w)._1} != $n")
        // identical fixed-order expression on identical integer cells →
        // bit-identical doubles, stream vs batch
        assert(streamed(w)._2 == chi2, s"window $w chi2: ${streamed(w)._2} != $chi2")
      }
      assert(batch.values.forall(_._2 >= 0.0))
    } finally q.stop()
  }

  test("a wrong reference mix alarms every window; the true mix stays calm overall") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val skewed = Map("click" -> 0.9, "error" -> 0.025, "purchase" -> 0.025,
      "signup" -> 0.025, "view" -> 0.025)
    val q = StreamingDriftMonitor.monitor(spark, staged, skewed)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_drift_skew").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stream_drift_skew")
        .collect().map(r => (r.getLong(7), r.getDouble(8)))
      assert(rows.nonEmpty)
      // dof = 4, 1% critical = 13.28: a 0.9-click reference against a
      // ~uniform stream must blow past it in any window with real traffic
      rows.filter(_._1 >= 50).foreach { case (n, chi2) =>
        assert(chi2 > 13.28, s"skewed reference went unalarmed: chi2 $chi2 at n=$n")
      }
    } finally q.stop()
  }

  test("a novel event type outside the reference mix alarms instead of going blind") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    // 980 'spam' rows the reference mix has never seen + a calm known tail
    val rows = (0 until 980).map(i => (base, "spam", i.toLong)) ++
      (0 until 10).map(i => (base, "click", 1000L + i)) ++
      (0 until 10).map(i => (base, "view", 2000L + i))
    val df = rows.toDF("ts_utc", "event_type", "event_id")
    val out = StreamingDriftMonitor.driftSelect(
      df.groupBy(window(col("ts_utc"), "1 hour")),
      Map("click" -> 0.5, "view" -> 0.5)).collect()
    assert(out.length == 1)
    val r = out(0)
    val (nOther, nTotal, chi2) = (r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(nOther == 980 && nTotal == 1000, "unknown types must count into the total")
    // expected click/view = 500 each against observed 10: chi2 ~ 960
    assert(!chi2.isNaN && chi2 > 13.28, s"novel-type drift went unalarmed: chi2 $chi2")
    // and the pathological all-unknown window must not produce NaN
    val allSpam = StreamingDriftMonitor.driftSelect(
      (0 until 100).map(i => (base, "spam", i.toLong)).toDF("ts_utc", "event_type", "event_id")
        .groupBy(window(col("ts_utc"), "1 hour")),
      Map("click" -> 0.5, "view" -> 0.5)).collect()(0)
    assert(!allSpam.getDouble(5).isNaN && allSpam.getDouble(5) > 13.28,
      s"all-unknown window scored ${allSpam.getDouble(5)}")
  }
}
