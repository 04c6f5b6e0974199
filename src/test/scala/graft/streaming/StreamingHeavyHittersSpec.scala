package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Stream-vs-batch equivalence for the Misra-Gries window monitor. With
  * k ≥ distinct values the summary is exact (eviction can never fire), so
  * stream == batch == the exact per-window histogram; with k below the
  * domain size only the ORDER-INVARIANT MG guarantees are asserted (the
  * surviving borderline entries legitimately depend on merge order).
  */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_hh_stream")

  private def runStream(staged: String, k: Int, name: String): Map[java.sql.Timestamp, (Map[String, Long], Long)] = {
    val q = StreamingHeavyHitters.monitor(spark, staged, k)
      .writeStream.outputMode("complete").format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      spark.table(name).collect()
        .map(r => r.getTimestamp(0) -> (r.getMap[String, Long](1).toMap, r.getLong(2))).toMap
    } finally q.stop()
  }

  test("k >= domain: streaming summary equals the exact per-window histogram") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val streamed = runStream(staged, k = 8, "stream_hh_exact")
    val exact = spark.read.parquet(staged)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type")).count()
      .select(col("window.start").as("w"), col("event_type"), col("count"))
      .collect()
      .groupBy(_.getTimestamp(0))
      .map { case (w, rows) => w -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
    assert(streamed.keySet == exact.keySet, "window sets differ")
    exact.foreach { case (w, hist) =>
      val (mg, n) = streamed(w)
      assert(mg == hist, s"window $w: $mg != $hist")
      assert(n == hist.values.sum)
    }
  }

  test("k < domain: MG guarantees hold per window across micro-batch merges") {
    val staged = stageTwoBatches(SparkSuite.Sf0001)
    val k = 3
    val streamed = runStream(staged, k, "stream_hh_mg")
    val exact = spark.read.parquet(staged)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type")).count()
      .select(col("window.start").as("w"), col("event_type"), col("count"))
      .collect()
      .groupBy(_.getTimestamp(0))
      .map { case (w, rows) => w -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
    streamed.foreach { case (w, (mg, n)) =>
      val hist = exact(w)
      assert(n == hist.values.sum)
      assert(mg.size <= k)
      hist.filter(_._2 * (k + 1) > n).keys.foreach { heavy =>
        assert(mg.contains(heavy), s"window $w: heavy $heavy evicted")
      }
      mg.foreach { case (v, c) =>
        assert(c <= hist(v), s"window $w: $v over-counted")
        assert((hist(v) - c) * (k + 1) <= n, s"window $w: $v under-counted past the bound")
      }
    }
  }
}
