package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Brute-force gates for the round-11 governance reports (deletion impact,
  * release diff). The DuckDB oracles pin cross-engine value equality; these
  * specs pin the SEMANTICS against naive recomputations an auditor would
  * trust, and that the fixtures actually exercise each report's signal.
  */
class GovernanceReportsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("release diff matches a brute force over manifest + purge flags") {
    val purge = Dedup.takedownPurgeSet(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val toks = TextAnalysis.tokenCounts(spark, dir)
      .select("doc_id", "ws_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = TextAnalysis.trainingManifest(spark, dir)
      .select("doc_id", "source", "keep_dedup", "keep_quality", "final_keep")
      .collect().map { r =>
        val a = r.getBoolean(4)
        val b = r.getBoolean(2) && r.getBoolean(3) && !purge.contains(r.getLong(0))
        (r.getString(1), toks(r.getLong(0)), a, b)
      }
    val diff = TextAnalysis.releaseDiff(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(diff.keySet == m.map(_._1).distinct.toSet)
    diff.foreach { case (src, (da, db, added, removed, ta, tb, delta)) =>
      val rows = m.filter(_._1 == src)
      assert(da == rows.count(_._3).toLong, s"$src docs_a")
      assert(db == rows.count(_._4).toLong, s"$src docs_b")
      assert(added == rows.count(r => r._4 && !r._3).toLong, s"$src docs_added")
      assert(removed == rows.count(r => r._3 && !r._4).toLong, s"$src docs_removed")
      assert(ta == rows.filter(_._3).map(_._2).sum, s"$src tokens_a")
      assert(tb == rows.filter(_._4).map(_._2).sum, s"$src tokens_b")
      assert(delta == tb - ta, s"$src tokens_delta")
    }
    // the fixture must exercise BOTH directions of the churn: the bucket
    // relaxation recovers docs AND the takedown purge removes kept docs
    assert(diff.values.map(_._3).sum > 0, "rule change adds nothing")
    assert(diff.values.map(_._4).sum > 0, "purge removes nothing kept")
  }

  test("shard balance matches a brute force over the manifest sidecar") {
    val shards = TextAnalysis.shardManifest(spark, dir)
      .select("n_docs", "n_tokens", "n_windows")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val report = TextAnalysis.shardBalance(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = shards.length.toLong
    val toks = shards.map(_._2)
    val wins = shards.map(_._3)
    assert(report("n_shards") == n)
    assert(report("docs_total") == shards.map(_._1).sum)
    assert(report("tokens_total") == toks.sum)
    assert(report("tokens_min_shard") == toks.min)
    assert(report("tokens_max_shard") == toks.max)
    assert(report("tokens_imbalance_permille") == toks.max * n * 1000L / toks.sum)
    assert(report("windows_total") == wins.sum)
    assert(report("windows_imbalance_permille") == wins.max * n * 1000L / wins.sum)
    // a perfectly-balanced OR degenerate (single-shard) fixture would make
    // the straggler signal vacuous
    assert(n > 1)
    assert(report("tokens_imbalance_permille") > 1000L,
      "fixture shards are exactly balanced - imbalance signal untested")
  }

  test("deletion cascade matches a brute force down the FK chain") {
    val cust = graft.Fixtures.table(spark, dir, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    val purged = cust.filter(_ % 53 == 0).toSet
    val orders = graft.Fixtures.table(spark, dir, "orders")
      .selectExpr("o_orderkey", "o_custkey",
        "date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    val purgedOrders = orders.filter(o => purged(o._2))
    val li = graft.Fixtures.table(spark, dir, "lineitem")
      .select("l_orderkey").collect().map(_.getLong(0))
    val purgedOrderKeys = purgedOrders.map(_._1).toSet
    val report = RelationalExt.deletionCascade(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report("customers_total") == cust.length.toLong)
    assert(report("customers_purged") == purged.size.toLong)
    assert(report("orders_total") == orders.length.toLong)
    assert(report("orders_purged") == purgedOrders.length.toLong)
    assert(report("order_months_total") == orders.map(_._3).distinct.length.toLong)
    assert(report("order_months_touched") == purgedOrders.map(_._3).distinct.length.toLong)
    assert(report("lineitems_total") == li.length.toLong)
    assert(report("lineitems_purged") == li.count(purgedOrderKeys).toLong)
    // the fixture must exercise the cascade end to end
    assert(report("customers_purged") > 0 && report("lineitems_purged") > 0,
      "purge list cascades to nothing")
  }

  test("pii rates match the planted decoration exactly, per source") {
    val docs = graft.Fixtures.table(spark, dir, "documents")
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val rates = TextAnalysis.piiRates(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rates.keySet == docs.map(_._2).distinct.toSet)
    rates.foreach { case (src, (n, de, dp, da, ppm, emails, phones)) =>
      val ids = docs.filter(_._2 == src).map(_._1)
      // the synthetic prose carries no PII of its own, so counts are
      // exactly the planted decoration: every 3rd doc one email, every
      // 5th one phone
      assert(n == ids.length.toLong, s"$src n_docs")
      assert(de == ids.count(_ % 3 == 0).toLong, s"$src docs_email")
      assert(dp == ids.count(_ % 5 == 0).toLong, s"$src docs_phone")
      assert(da == ids.count(i => i % 3 == 0 || i % 5 == 0).toLong, s"$src docs_any")
      assert(ppm == da * 1000000L / n, s"$src pii_ppm")
      assert(emails == de && phones == dp, s"$src totals")
    }
    // both PII kinds must actually occur on the fixture
    assert(rates.values.map(_._2).sum > 0 && rates.values.map(_._3).sum > 0)
  }

  test("shard rebalance plan matches integer-threshold brute force") {
    val shards = TextAnalysis.shardManifest(spark, dir)
      .select("shard", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = shards.size.toLong
    val total = shards.values.sum
    val plan = TextAnalysis.shardRebalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(plan.map(_._1).toSet == shards.keySet)
    plan.foreach { case (shard, toks, permille, action) =>
      assert(toks == shards(shard), s"shard $shard tokens")
      assert(permille == BigInt(toks) * n * 1000 / total, s"shard $shard permille")
      val expected =
        if (BigInt(toks) * n * 5 > BigInt(total) * 6) "split"
        else if (BigInt(toks) * n * 5 < BigInt(total) * 4) "merge"
        else "ok"
      assert(action == expected, s"shard $shard action")
    }
    // the fixture's shards are hash-uneven enough that the plan must
    // recommend at least one action, or the table is vacuous
    assert(plan.exists(_._4 != "ok"), "rebalance plan recommends nothing")
  }

  test("deletion impact matches a brute force over the raw event log") {
    val report = EventOps.deletionImpact(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Fixtures.table(spark, dir, "events")
      .selectExpr("user_id", "event_type",
        "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start")
      .collect().map(r => (r.getLong(0), r.getString(1), r.get(2)))
    val purged = ev.filter(_._1 % 7 == 3)
    assert(report("events_total") == ev.length.toLong)
    assert(report("purge_events") == purged.length.toLong)
    assert(report("purge_ppm") == purged.length.toLong * 1000000L / ev.length)
    assert(report("purge_users") == purged.map(_._1).distinct.length.toLong)
    assert(report("purge_types") == purged.map(_._2).distinct.length.toLong)
    assert(report("partitions_total") == ev.map(_._3).distinct.length.toLong)
    assert(report("partitions_touched") == purged.map(_._3).distinct.length.toLong)
    val heaviest =
      if (purged.isEmpty) 0L
      else purged.groupBy(_._1).values.map(_.length).max.toLong
    assert(report("max_user_purge_events") == heaviest)
    // the fixture must exercise the report: a purge that touches nothing
    // (or everything) would make the partition-rewrite signal vacuous
    assert(report("purge_events") > 0, "purge list selects no events")
    assert(report("partitions_touched") > 0)
    assert(report("partitions_touched") < report("partitions_total"),
      "purge touches every partition - rewrite accounting is vacuous")
  }
}
