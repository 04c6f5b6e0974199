package graft.profile

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, SparkSuite}

/** Tolerance gates for the mergeable-sketch profile (`sketchProfile`) — the
  * 100 TB twin of the exact `fullProfile`. Sketch estimates are
  * engine-specific so there is no DuckDB oracle; instead the EXACT profile
  * (which IS oracle-gated as profile_summary_*) serves as ground truth, and
  * the plan is gated to the shape that makes the sketch form scale: one
  * scan, one partial+final aggregation, no Expand replication.
  */
class SketchProfileSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  test("sketch profile matches the exact profile within sketch tolerances (lineitem, events)") {
    for (table <- Seq("lineitem", "events")) {
      val exact = ProfileQueries.fullProfile(spark, dir, table).collect()(0)
      val sk = ProfileQueries.sketchProfile(spark, dir, table).collect()(0)
      val numCols = Fixtures.numericCols(table)
      val tCols = Fixtures.temporalCols.getOrElse(table, Seq.empty)
      assert(sk.getLong(sk.fieldIndex("n_rows")) == exact.getLong(exact.fieldIndex("n_rows")))
      (numCols ++ tCols).foreach { c =>
        // min/max/null-count are algebraic — identical, not approximate
        assert(sk.get(sk.fieldIndex(s"min_$c")) == exact.get(exact.fieldIndex(s"min_$c")), s"min_$c")
        assert(sk.get(sk.fieldIndex(s"max_$c")) == exact.get(exact.fieldIndex(s"max_$c")), s"max_$c")
        assert(sk.getLong(sk.fieldIndex(s"nulls_$c")) == exact.getLong(exact.fieldIndex(s"nulls_$c")), s"nulls_$c")
        // HLL++ at rsd 2%: allow 3σ
        val e = exact.getLong(exact.fieldIndex(s"ndv_$c")).toDouble
        val a = sk.getLong(sk.fieldIndex(s"ndv_$c")).toDouble
        assert(math.abs(a - e) / math.max(e, 1.0) <= 0.06, s"ndv_$c: exact=$e sketch=$a")
      }
      numCols.foreach { c =>
        val ea = exact.getDouble(exact.fieldIndex(s"avg_$c"))
        val sa = sk.getDouble(sk.fieldIndex(s"avg_$c"))
        assert(sa == ea, s"avg_$c must be the identical decimal-exact average")
        // quantile sketch: the guarantee is on RANK, not value (the sketch
        // returns an actual element whose rank is within ε of the target;
        // a value comparison fails on low-cardinality columns where exact
        // interpolation sits between elements). Assert each returned
        // quartile's true rank interval covers the target ± 5%.
        val approxQ = Seq(25, 50, 75).map(pct => sk.getDouble(sk.fieldIndex(s"q${pct}_$c")))
        val ranks = spark.sql(
          (s"SELECT count($c) AS n, " +
            approxQ.zipWithIndex.map { case (v, i) =>
              s"count_if($c < $v) AS below_$i, count_if($c <= $v) AS at_$i"
            }.mkString(", ") +
            s" FROM parquet.`$dir/$table.parquet`")).collect()(0)
        val n = ranks.getLong(0).toDouble
        Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (p, i) =>
          val below = ranks.getLong(ranks.fieldIndex(s"below_$i")) / n
          val atOrBelow = ranks.getLong(ranks.fieldIndex(s"at_$i")) / n
          assert(below <= p + 0.05 && atOrBelow >= p - 0.05,
            s"quartile p=$p of $c: sketch value ${approxQ(i)} spans rank [$below, $atOrBelow]")
        }
      }
    }
  }

  test("sketch profile plan: one scan, partial+final aggregation, no Expand") {
    val df = ProfileQueries.sketchProfile(spark, dir, "lineitem")
    df.collect()
    val ns = allNodes(df.queryExecution.executedPlan)
    val names = ns.map(_.nodeName)
    assert(!names.exists(_.contains("Expand")),
      s"sketch profile must not replicate the scan per distinct column: ${names.distinct.mkString(",")}")
    assert(ns.count(_.isInstanceOf[FileSourceScanExec]) == 1,
      "sketch profile must read the table exactly once")
    val aggs = names.count(n => n.contains("HashAggregate") || n.contains("SortAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregation, got: ${names.distinct.mkString(",")}")
  }
}
