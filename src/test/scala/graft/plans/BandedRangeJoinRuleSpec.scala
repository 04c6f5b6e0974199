package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class BandedRangeJoinRuleSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkSuite.spark
    graft.GraftExtensions.register(s) // installs BandedRangeJoinRule
    s
  }

  private val WindowUs = 5L * 60 * 1000000

  /** The NAIVE attribution query — plain range predicate, no manual
    * banding. Without the rule Spark plans this as BroadcastNestedLoopJoin. */
  private def naiveAttribution(dir: String = SparkSuite.Sf0001): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("p_tus"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_tus") <= col("p_tus") &&
          col("c_tus") >= col("p_tus") - WindowUs)
      .groupBy("event_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  private def collectPhysical(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectPhysical(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectPhysical)
  }

  test("naive fixed-width range join is auto-banded: no nested-loop join in the plan") {
    val df = naiveAttribution()
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("__graft_band"),
      s"rule did not fire; optimized plan:\n$optimized")
    df.collect() // finalize AQE
    val nodes = collectPhysical(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "banded rewrite should eliminate the nested-loop join")
  }

  test("auto-banded naive join matches the manually banded operator") {
    // sf0.01 for a denser pair set; the manual operator is oracle-verified
    // at this SF. Manual is a LEFT join (keeps zero-click purchases), the
    // naive query is INNER — compare on the non-zero subset.
    val auto = naiveAttribution(SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val manual = graft.operators.EventOps.purchaseClickAttribution(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      .filter(_._2 > 0)
    assert(auto.nonEmpty, "expected at least one attributed purchase at sf0.01")
    assert(auto == manual, s"auto=${auto.size} rows, manual nonzero=${manual.size} rows")
  }

  test("two-sided window join is banded and matches a driver-computed reference") {
    val W1 = 3L * 60 * 1000000 // 3 min before
    val W2 = 2L * 60 * 1000000 // 2 min after
    val ev = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("tus").as("p_tus"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("tus").as("v_tus"))
    val naive = purchases.join(views,
        col("user_id") === col("v_user") &&
          col("v_tus") >= col("p_tus") - W1 &&
          col("v_tus") <= col("p_tus") + W2)
      .groupBy("event_id").agg(count(lit(1)).as("n_views"))
    assert(naive.queryExecution.optimizedPlan.toString.contains("__graft_band"),
      "two-sided window should be banded")
    val got = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!collectPhysical(naive.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    // independent reference: plain nested loop on the driver (1000 rows)
    val ps = purchases.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vs = views.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ps.map { case (u, pt, id) =>
      id -> vs.count { case (vu, vt) => vu == u && vt >= pt - W1 && vt <= pt + W2 }.toLong
    }.filter(_._2 > 0).toMap
    assert(got == expected, s"got=${got.size} purchases, expected=${expected.size}")
  }

  test("rule leaves non-matching joins alone") {
    val n = spark.read.parquet(s"${SparkSuite.Sf0001}/nation.parquet")
    val r = spark.read.parquet(s"${SparkSuite.Sf0001}/region.parquet")
    val plain = n.join(r, col("n_regionkey") === col("r_regionkey"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("__graft_band"))
    assert(plain.count() == 25)
  }
}
