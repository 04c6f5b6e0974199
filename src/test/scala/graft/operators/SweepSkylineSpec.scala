package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile.ProfileQueries

/** Semantic invariants for the sweep-line / skyline / growth / weighted-
  * percentile batch (exact-value parity is driver-gated vs DuckDB; these
  * pin the properties that must hold regardless of fixtures).
  */
class SweepSkylineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("pareto frontier: returned = exactly the non-dominated parts (brute force)") {
    val parts = spark.read.parquet(s"${SparkSuite.Sf0001}/part.parquet")
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val expected = parts.filter { case (_, s, p) =>
      !parts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p)
      }
    }.map(_._1).toSet
    val got = RelationalExt.paretoFrontier(spark, SparkSuite.Sf0001)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expected, s"frontier mismatch: got=${got.size} want=${expected.size}")
  }

  test("max concurrency: hourly peaks match a brute-force sweep; deltas cancel") {
    val rows = EventOps.maxConcurrency(spark, SparkSuite.Sf0001).collect()
    // peak 0 is legitimate: an hour whose only change point is a session end
    // that drops concurrency to zero reports the 0 it observed there
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("peak_concurrency") >= 0))
    // brute-force: rebuild sessions driver-side and sweep
    val gapUs = 30L * 60 * 1000000
    val ev = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val ts = es.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = ts.head; var prev = ts.head
      for (t <- ts.tail) {
        if (t - prev > gapUs) { out += ((start, prev)); start = t }
        prev = t
      }
      out += ((start, prev)); out
    }.toSeq
    val deltas = (sessions.map(s => (s._1, 1L)) ++ sessions.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val peaks = scala.collection.mutable.Map.empty[Long, Long]
    for ((t, d) <- deltas) {
      run += d
      val hour = t / 3600000000L
      peaks(hour) = math.max(peaks.getOrElse(hour, Long.MinValue), run)
    }
    assert(run == 0L, s"deltas must cancel, got $run")
    val got = rows.map(r => (r.getAs[java.time.LocalDateTime]("hour_start")
      .toEpochSecond(java.time.ZoneOffset.UTC) / 3600,
      r.getAs[Long]("peak_concurrency"))).toMap
    assert(got == peaks.toMap, "hourly peak mismatch vs brute-force sweep")
  }

  test("user growth: cumulative is monotone and reconciles with distinct users") {
    val rows = EventOps.userGrowth(spark, SparkSuite.Sf0001).collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cum_users not monotone")
    val totalUsers = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select("user_id").distinct().count()
    assert(cums.last == totalUsers)
    assert(rows.map(_.getAs[Long]("new_users")).sum == totalUsers)
    assert(rows.forall(r => r.getAs[Long]("active_users") <= r.getAs[Long]("cum_users")))
  }

  test("weighted percentiles: ordered; unit weights reduce to the row percentile") {
    val row = ProfileQueries.weightedPercentiles(spark, SparkSuite.Sf0001).collect().head
    val (p25, p50, p75) = (row.getAs[Double]("wp25"), row.getAs[Double]("wp50"),
      row.getAs[Double]("wp75"))
    assert(p25 <= p50 && p50 <= p75, s"$p25 / $p50 / $p75")
    import spark.implicits._
    // unit weights: lower weighted median of 1..100 is 50
    val uni = (1 to 100).map(v => (v.toDouble, 1.0)).toDF("v", "w")
    val r1 = ProfileQueries.weightedPercentilesOf(uni, "v", "w").collect().head
    assert(r1.getAs[Double]("wp50") == 50.0)
    // weight mass dominates: one heavy value owns every percentile
    val skew = Seq((1.0, 1.0), (100.0, 1000.0)).toDF("v", "w")
    val r2 = ProfileQueries.weightedPercentilesOf(skew, "v", "w").collect().head
    assert(r2.getAs[Double]("wp25") == 100.0 && r2.getAs[Double]("wp75") == 100.0)
  }
}
