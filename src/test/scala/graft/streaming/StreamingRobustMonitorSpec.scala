package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The streaming robust-quantile monitor: stream and batch both sit inside
  * KLL tolerance of the EXACT per-(window,type) quantiles (bit-equality is
  * not the contract here — KLL compaction is randomized, unlike the HLL
  * monitor's order-insensitive register max), and the fence algebra is
  * internally consistent.
  */
class StreamingRobustMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private type Key = (java.time.LocalDateTime, String)

  private def collectMon(df: org.apache.spark.sql.DataFrame): Map[Key, (Long, Double, Double, Double, Double)] =
    df.collect().map { r =>
      (r.getAs[java.time.LocalDateTime]("win_start"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med_est"), r.getAs[Double]("iqr_est"),
          r.getAs[Double]("lo_fence"), r.getAs[Double]("hi_fence")))
    }.toMap

  private def exactSorted(staged: String): Map[Key, IndexedSeq[Double]] =
    spark.read.parquet(staged)
      .filter(col("value").isNotNull)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(sort_array(collect_list(col("value"))).as("vs"))
      .select(col("window.start").cast("timestamp_ntz").as("w"), col("event_type"), col("vs"))
      .collect().map { r =>
        (r.getAs[java.time.LocalDateTime](0), r.getString(1)) -> r.getSeq[Double](2).toIndexedSeq
      }.toMap

  /** Rank-band check: a KLL quantile at rank p is an ORDER STATISTIC whose
    * rank is within ±eps of p (not an interpolated value — on a 3-row
    * group it can differ from `percentile()` by half the spread while
    * being exactly correct), so the assertion is membership in the
    * [p−eps, p+eps] rank window of the sorted group. */
  private def inRankBand(sorted: IndexedSeq[Double], est: Double, p: Double, eps: Double): Boolean = {
    val n = sorted.size
    val lo = sorted(math.max(0, math.floor((p - eps) * (n - 1)).toInt))
    val hi = sorted(math.min(n - 1, math.ceil((p + eps) * (n - 1)).toInt))
    lo <= est && est <= hi
  }

  test("stream == batch window/type sets; quantiles land in exact rank bands") {
    val staged = StreamFixtures.stageEventsTwoBatches(spark, SparkSuite.Sf0001, "events_robust_stream")
    val q = StreamingRobustMonitor.monitorStream(spark, staged)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_robust").start()
    try {
      q.processAllAvailable()
      val streamed = collectMon(spark.table("stream_robust"))
      val batch = collectMon(StreamingRobustMonitor.monitorBatch(spark, staged))
      val exact = exactSorted(staged)
      assert(streamed.keySet == batch.keySet, "window/type sets differ")
      assert(streamed.keySet == exact.keySet)
      // KLL k=400 rank error ≲0.9% — on tiny per-window groups one order
      // statistic of slack (eps covering ±1 rank) absorbs it entirely.
      // Check stream and batch SEPARATELY (`streamed ++ batch` would be
      // right-biased: with equal key sets every streamed entry would be
      // shadowed and the stream path never verified)
      for ((label, mon) <- Seq("stream" -> streamed, "batch" -> batch);
           (k, (n, med, iqr, lo, hi)) <- mon) {
        val vs = exact(k)
        assert(n.toInt == vs.size, s"$label $k n=$n vs ${vs.size}")
        val eps = math.max(0.01, 1.0 / vs.size)
        assert(inRankBand(vs, med, 0.5, eps), s"$label $k med=$med sorted=$vs")
        assert(iqr >= 0.0 && lo <= med && med <= hi, s"$label $k fences inconsistent")
      }
    } finally q.stop()
  }

  test("state is bounded: the plan carries a streaming aggregation with watermark") {
    val staged = StreamFixtures.stageEventsTwoBatches(spark, SparkSuite.Sf0001, "events_robust_stream2")
    val df = StreamingRobustMonitor.monitorStream(spark, staged)
    val plan = df.queryExecution.analyzed.toString
    // the watermark node must be present — it is what bounds open-window
    // state (an `|| df.isStreaming` disjunct would make this vacuous)
    assert(plan.contains("EventTimeWatermark"),
      s"expected a watermarked streaming aggregation, plan:\n$plan")
    assert(df.isStreaming)
  }
}
