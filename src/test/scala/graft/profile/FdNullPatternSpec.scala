package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Invariants for FD discovery and the missingness profile. */
class FdNullPatternSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("fd discovery: the primary key determines every other column") {
    val df = ProfileQueries.fdDiscovery(spark, SparkSuite.Sf0001)
    val rows = df.collect()
    assert(rows.length == 30) // 6 columns, all directed pairs
    // r16 plan gate: one fused branch per determinant — 6 scans, not 30
    val scans = df.queryExecution.optimizedPlan.collectLeaves().count {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    assert(scans == 6, s"expected 6 table scans (one per determinant), got $scans")
    val fromKey = rows.filter(_.getAs[String]("det") == "o_orderkey")
    assert(fromKey.length == 5 && fromKey.forall(_.getAs[Boolean]("holds")))
    // o_orderkey is unique: n_groups from the key == row count
    val n = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet").count()
    assert(fromKey.forall(_.getAs[Long]("n_groups") == n))
    // status (3-ish values) cannot determine the key on any non-trivial table
    val bad = rows.find(r => r.getAs[String]("det") == "o_orderstatus" &&
      r.getAs[String]("dep") == "o_orderkey").get
    assert(!bad.getAs[Boolean]("holds"))
  }

  test("fd screen: screened verdicts == exact verdicts, branches only for survivors") {
    val dir = SparkSuite.Sf0001
    val exact = ProfileQueries.fdDiscovery(spark, dir).collect()
      .map(r => (r.getAs[String]("det"), r.getAs[String]("dep")) ->
        r.getAs[Boolean]("holds")).toMap
    val scr = ProfileQueries.fdDiscoveryScreened(spark, dir)
    val srows = scr.collect()
    assert(srows.length == 30)
    // no false negatives: every pair's screened verdict (sketch-pruned ⇒
    // false, survivor ⇒ exact branch) must equal the exact truth
    srows.foreach { r =>
      val k = (r.getAs[String]("det"), r.getAs[String]("dep"))
      assert(r.getAs[Boolean]("holds") == exact(k), s"verdict drift at $k")
    }
    // the screen prunes, and every key-determined pair survives it
    val surv = ProfileQueries.fdScreenSurvivors(spark, dir, "orders")
    assert(surv.size < 30, "the screen must actually prune")
    val survSet = surv.toSet
    Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
      "o_orderpriority").foreach(c => assert(survSet(("o_orderkey", c))))
    // PLAN GATE (VERDICT r15 #1, tightened r16): the screened DAG scans the
    // table exactly ONCE per surviving DETERMINANT (all of a determinant's
    // surviving deps fused into one grouped aggregate) — never once per
    // pair, never all 30
    val nDet = surv.map(_._1).distinct.size
    val scans = scr.queryExecution.optimizedPlan.collectLeaves().count {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    assert(scans == nDet,
      s"expected $nDet table scans (one per surviving determinant), got $scans")
    val gate = ProfileQueries.fdScreenGate(spark, dir).collect().head
    assert(gate.getAs[Long]("n_pairs") == 30L)
    assert(gate.getAs[Boolean]("screen_pruned"))
    assert(gate.getAs[Boolean]("key_fds_survive"))
  }

  test("null patterns: 4-bit masks partitioning all rows") {
    val rows = ProfileQueries.nullPatterns(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("null_pattern").matches("[01]{4}")))
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet").count())
    // user_id is never null -> every pattern starts with 0
    assert(rows.forall(_.getAs[String]("null_pattern").startsWith("0")))
  }
}
