package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.functions.MisraGriesAgg.misra_gries_agg
import graft.profile.ProfileQueries

/** The Misra-Gries frequent-items aggregate: the n/(k+1) guarantee on a
  * planted Zipf stream (under real multi-partition merges), exactness when
  * k covers the domain, and the fixture gate's order-invariant booleans.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  /** Zipf-ish planted stream: value "v<i>" occurs 2000/i times, i = 1..40.
    * n = 2000·H(40) ≈ 8557; with k=8 the threshold n/9 ≈ 951 makes v1 and
    * v2 true-heavy while 40 distinct values force constant eviction. */
  private def planted(k: Int): (Map[String, Long], Map[String, Long], Long) = {
    import spark.implicits._
    val truth = (1 to 40).map(i => s"v$i" -> (2000L / i)).toMap
    val stream = truth.toSeq.flatMap { case (v, c) => Seq.fill(c.toInt)(v) }
    // deterministic interleave so no partition is single-valued
    val df = new scala.util.Random(7).shuffle(stream).toDF("v").repartition(16)
    val row = df.agg(misra_gries_agg(col("v"), k).as("mg"), count(col("v")).as("n")).collect()(0)
    (truth, row.getMap[String, Long](0).toMap, row.getLong(1))
  }

  test("planted Zipf: every true-heavy item survives and bounds hold across merges") {
    val k = 8
    val (truth, mg, n) = planted(k)
    assert(n == truth.values.sum)
    assert(mg.size <= k)
    val bound = n.toDouble / (k + 1)
    truth.filter(_._2 > bound).keys.foreach { heavy =>
      assert(mg.contains(heavy), s"heavy $heavy (true=${truth(heavy)}, bound=$bound) evicted")
    }
    mg.foreach { case (v, c) =>
      assert(c <= truth(v), s"$v over-counted: mg=$c true=${truth(v)}")
      assert((truth(v) - c) * (k + 1) <= n, s"$v under-counted past the bound: mg=$c true=${truth(v)}")
    }
  }

  test("k >= domain size: summary is exact (no eviction ever fires)") {
    val (truth, mg, _) = planted(64)
    assert(mg == truth)
  }

  test("summary is invariant in total count under repartitioning") {
    import spark.implicits._
    val df = (1 to 500).map(i => s"x${i % 7}").toDF("v")
    for (parts <- Seq(1, 13)) {
      val row = df.repartition(parts)
        .agg(misra_gries_agg(col("v"), 10).as("mg")).collect()(0)
      // k=10 > 7 distinct: exact regardless of partitioning
      assert(row.getMap[String, Long](0).values.sum == 500L)
    }
  }

  test("fixture gate: heavy langs found, bounds booleans true") {
    val rows = ProfileQueries.heavyValuesGate(spark, dir).collect()
    assert(rows.nonEmpty, "no true-heavy lang at this SF — pick a smaller k")
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("found_in_summary")), s"$r")
      assert(r.getBoolean(r.fieldIndex("ok_bounds")), s"$r")
    }
    assert(rows.map(_.getString(0)).contains("en"))
  }

  test("summary operator: one row, k-bounded map, full stream count") {
    val row = ProfileQueries.heavyValues(spark, dir).collect()(0)
    val m = row.getMap[String, Long](row.fieldIndex("summary"))
    assert(m.size <= 5 && m.nonEmpty)
    assert(row.getLong(row.fieldIndex("n")) > 0)
  }
}
