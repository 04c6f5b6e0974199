package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.TpchBattery

/** Plan-shape gates for the round-9 TPC-H battery (correctness itself is
  * driver-gated via the DuckDB oracles): the properties each query's 100 TB
  * story depends on, pinned so a planner regression fails CI.
  */
class TpchBatterySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: allNodes(r.child)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** Final AQE plan node names — `collect()` executes the Dataset's OWN
    * QueryExecution so its AdaptiveSparkPlanExec settles (a noop write
    * would run a SEPARATE QueryExecution and leave this one un-executed,
    * making the walked plan the initial, pre-AQE one). */
  private def ranNodes(df: DataFrame): Seq[String] = {
    df.collect()
    allNodes(df.queryExecution.executedPlan).map(_.nodeName)
  }

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    allNodes(df.queryExecution.executedPlan).collect { case s: FileSourceScanExec => s }

  test("q4: EXISTS is a semi join, never a plain join (no double-count)") {
    val names = ranNodes(TpchBattery.q4LateOrders(spark, SparkSuite.Sf0001))
    assert(names.exists(n => n.contains("Join")),
      s"expected a join, got ${names.distinct.mkString(",")}")
    // the lateness condition is non-equi but the order key is equi — must
    // stay a hash/sort-merge semi join, not BroadcastNestedLoop
    assert(!names.exists(_.contains("BroadcastNestedLoopJoin")),
      s"semi join fell back to nested loop: ${names.distinct.mkString(",")}")
  }

  test("q4/q6 filters reach the parquet scans as pushed filters") {
    val q4scans = scans(TpchBattery.q4LateOrders(spark, SparkSuite.Sf0001))
    assert(q4scans.exists(_.metadata.get("PushedFilters").exists(_.contains("o_orderdate"))),
      "q4 order-date filter not pushed")
    val q6scans = scans(TpchBattery.q6ForecastRevenue(spark, SparkSuite.Sf0001))
    val pushed = q6scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"), s"q6 PushedFilters=$pushed")
  }

  test("q6: pure scan-aggregate — no join, no Expand, partial+final agg") {
    val names = ranNodes(TpchBattery.q6ForecastRevenue(spark, SparkSuite.Sf0001))
    assert(!names.exists(_.contains("Join")), s"unexpected join: ${names.distinct.mkString(",")}")
    assert(names.count(_.contains("HashAggregate")) >= 2, "expected partial+final HashAggregate")
  }

  test("q5/q7/q8: dimension sides broadcast (the only shuffles are fact joins/aggs)") {
    for ((name, df) <- Seq(
        "q5" -> TpchBattery.q5LocalSupplierVolume(spark, SparkSuite.Sf0001),
        "q7" -> TpchBattery.q7VolumeShipping(spark, SparkSuite.Sf0001),
        "q8" -> TpchBattery.q8MarketShare(spark, SparkSuite.Sf0001))) {
      val names = ranNodes(df)
      assert(names.count(_.contains("BroadcastHashJoin")) >= 2,
        s"$name expected >=2 broadcast joins: ${names.distinct.mkString(",")}")
      assert(!names.exists(_.contains("BroadcastNestedLoopJoin")),
        s"$name has a nested-loop join: ${names.distinct.mkString(",")}")
    }
  }

  test("q15: the revenue aggregate is computed once (exchange reused for the max branch)") {
    val df = TpchBattery.q15TopSupplier(spark, SparkSuite.Sf0001)
    val names = ranNodes(df)
    // two consumers (revenue rows + its max) over ONE lineitem scan subtree:
    // either a ReusedExchange/TableCacheQueryStage appears, or at worst the
    // scan count stays bounded at 2 branches — never more
    val liScans = scans(df).count(_.metadata.get("Location").exists(_.contains("lineitem")))
    assert(liScans <= 2, s"q15 scans lineitem $liScans times")
  }

  test("q21: EXISTS/NOT EXISTS plan as semi+anti hash joins; top-100 is TakeOrdered") {
    val names = ranNodes(TpchBattery.q21WaitingSuppliers(spark, SparkSuite.Sf0001))
    assert(!names.exists(_.contains("BroadcastNestedLoopJoin")),
      s"correlation fell back to nested loop: ${names.distinct.mkString(",")}")
    assert(names.exists(_.contains("TakeOrderedAndProject")),
      s"expected TakeOrderedAndProject: ${names.distinct.mkString(",")}")
  }

  test("q22: 1-row average broadcast; recent-orders anti join is not nested-loop") {
    val names = ranNodes(TpchBattery.q22IdleCustomers(spark, SparkSuite.Sf0001))
    // the scalar-average cross join is the ONLY tolerable BNLJ (rowCount=1);
    // the custkey anti join must be a hash join
    val bnlj = names.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"expected at most the 1-row scalar BNLJ, got $bnlj")
    assert(names.exists(n => n.contains("BroadcastHashJoin") || n.contains("SortMergeJoin") ||
      n.contains("ShuffledHashJoin")), s"no hash join in: ${names.distinct.mkString(",")}")
  }

  test("battery returns non-trivial rows at sf0.001") {
    // semantics are driver-gated vs DuckDB at sf0.01; this pins that every
    // query also exercises real rows at the smoke SF
    val counts = Map(
      "q4" -> TpchBattery.q4LateOrders(spark, SparkSuite.Sf0001).count(),
      "q5" -> TpchBattery.q5LocalSupplierVolume(spark, SparkSuite.Sf0001).count(),
      "q6" -> TpchBattery.q6ForecastRevenue(spark, SparkSuite.Sf0001)
        .filter(col("n_items") > 0).count(),
      "q7" -> TpchBattery.q7VolumeShipping(spark, SparkSuite.Sf0001).count(),
      // q8/q22 are the two whose filters could silently degenerate to empty
      // on a fixture regen (see q22's scaladoc) — smoke them explicitly
      "q8" -> TpchBattery.q8MarketShare(spark, SparkSuite.Sf0001).count(),
      "q13" -> TpchBattery.q13CustomerDistribution(spark, SparkSuite.Sf0001).count(),
      "q14" -> TpchBattery.q14PromoEffect(spark, SparkSuite.Sf0001)
        .filter(col("n_items") > 0).count(),
      "q15" -> TpchBattery.q15TopSupplier(spark, SparkSuite.Sf0001).count(),
      "q17" -> TpchBattery.q17SmallQuantityRevenue(spark, SparkSuite.Sf0001)
        .filter(col("n_items") > 0).count(),
      "q19" -> TpchBattery.q19DisjunctiveRevenue(spark, SparkSuite.Sf0001)
        .filter(col("n_items") > 0).count(),
      "q21" -> TpchBattery.q21WaitingSuppliers(spark, SparkSuite.Sf0001).count(),
      "q22" -> TpchBattery.q22IdleCustomers(spark, SparkSuite.Sf0001).count())
    counts.foreach { case (n, c) => assert(c > 0, s"$n returned 0 rows") }
  }
}
