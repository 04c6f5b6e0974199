package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, SparkSuite}

/** Round-11 session-3 tables: bounded funnel, A/B SRM, tokenizer
  * fertility. Each brute-forced from the raw fixture on the driver.
  */
class ExperimentHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("bounded funnel: windows actually bind relative to the unbounded funnel") {
    val free = EventOps.signupFunnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val bounded = EventOps.signupFunnelBounded(spark, dir).collect()
    assert(bounded.map(_.getLong(0)).toSet == free.keySet, "signup population must not change")
    bounded.foreach { r =>
      val u = r.getLong(0)
      assert(r.getLong(4) <= free(u), s"user $u gained a stage from adding windows")
      // lag columns are consistent with the timestamps and the windows
      if (!r.isNullAt(2)) {
        assert(r.getLong(5) == r.getLong(2) - r.getLong(1))
        assert(r.getLong(5) >= 0 && r.getLong(5) <= 24L * 3600 * 1000000)
      } else assert(r.isNullAt(5))
      if (!r.isNullAt(3)) {
        assert(r.getLong(6) == r.getLong(3) - r.getLong(2))
        assert(r.getLong(6) >= 0 && r.getLong(6) <= 72L * 3600 * 1000000)
      } else assert(r.isNullAt(6))
    }
    // tight windows must strictly bind on this fixture (10-minute click window)
    val tight = EventOps.signupFunnelBounded(spark, dir, clickWindowUs = 600L * 1000000)
      .agg(sum("stage")).collect().head.getLong(0)
    assert(tight < bounded.map(_.getLong(4)).sum, "a 10-minute window should cut stages")
  }

  test("A/B SRM: counts match a brute-force assignment; chi-square is the exact formula") {
    val rows = EventOps.abSrm(spark, dir).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(rows.keySet == Set(0L, 1L))
    // brute force the deterministic assignment through the same md5 mix
    val ev = Fixtures.table(spark, dir, "events")
      .withColumn("variant", pmod(TextAnalysis.mixedHashOf("ab|", col("user_id")), lit(2)))
      .select(col("user_id"), col("variant")).collect()
    val byVar = ev.groupBy(_.getLong(1))
    val u = Map(0L -> byVar(0L).map(_.getLong(0)).distinct.length.toLong,
      1L -> byVar(1L).map(_.getLong(0)).distinct.length.toLong)
    val e = Map(0L -> byVar(0L).length.toLong, 1L -> byVar(1L).length.toLong)
    val d = u(0L) - u(1L); val n = u(0L) + u(1L)
    val chi = (d * d * 1000000L + n / 2) / n
    Seq(0L, 1L).foreach { v =>
      assert(rows(v) == ((u(v), e(v), chi, chi >= 3841459L)), s"variant $v: ${rows(v)}")
    }
    // both variants must actually be populated (a constant hash would pass
    // the formula checks with one empty arm)
    assert(u.values.forall(_ > 0))
  }

  test("power/MDE: pooled variance and MDE match a driver-side brute force") {
    val r = EventOps.powerMde(spark, dir).collect().head
    val ev = Fixtures.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value")).collect()
    val users = ev.map(_.getLong(0)).distinct
    val varOf = Fixtures.table(spark, dir, "events").select("user_id").distinct()
      .withColumn("variant", pmod(TextAnalysis.mixedHashOf("ab|", col("user_id")), lit(2)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val vMicro = ev.filter(_.getString(1) == "purchase")
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(e => math.floor(e.getDouble(2) * 1000000).toLong).sum).toMap
    def stats(v: Long): (Long, BigInt, BigInt) = {
      val xs = users.filter(u => varOf(u) == v).map(u => BigInt(vMicro.getOrElse(u, 0L)))
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (n0, s0, q0) = stats(0L); val (n1, s1, q1) = stats(1L)
    assert(r.getLong(0) == n0 && r.getLong(1) == n1)
    assert(r.getLong(2) == (s0 / n0).toLong && r.getLong(3) == (s1 / n1).toLong)
    // pooled variance is ONE exact integer division (cross-engine double
    // chains differ in the last ulp); MDE is one division + sqrt over it
    val num = (q0 * n0 - s0 * s0) * n1 + (q1 * n1 - s1 * s1) * n0
    val den = BigInt(n0) * n1 * (n0 + n1 - 2)
    val pooled = (num / den).toLong
    assert(r.getLong(4) == pooled)
    assert(r.getDouble(5) == 2.801585219 * math.sqrt(pooled.toDouble * (n0 + n1) / (n0 * n1)))
    assert(pooled > 0, "fixture metric must have variance")
  }

  test("boilerplate prefix: the planted banner tops every source at ~200 permille") {
    val rows = TextAnalysis.boilerplatePrefix(spark, dir).collect()
    assert(rows.nonEmpty)
    val perSource = Fixtures.table(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum(when(col("doc_id") % 5 === 0, 1L).otherwise(0L)).as("planted"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    rows.foreach { r =>
      val (n, planted) = perSource(r.getString(0))
      // organic 5-word prefixes over a ~40-word vocabulary are ~unique, so
      // the planted banner must win the argmax in any source carrying it
      if (planted > 1) {
        assert(r.getString(1) == "breaking news update follow us",
          s"source ${r.getString(0)}: top prefix ${r.getString(1)}")
        assert(r.getLong(3) == planted)
      }
      assert(r.getLong(2) == n)
      assert(r.getLong(4) == (r.getLong(3) * 1000 + n / 2) / n)
    }
    assert(rows.exists(_.getString(1) == "breaking news update follow us"))
  }

  test("experiment lift: rates/means from brute force; lift judged against the MDE") {
    val rows = EventOps.experimentLift(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val ev = Fixtures.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value")).collect()
    val varOf = Fixtures.table(spark, dir, "events").select("user_id").distinct()
      .withColumn("variant", pmod(TextAnalysis.mixedHashOf("ab|", col("user_id")), lit(2)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val vMicro = ev.filter(_.getString(1) == "purchase")
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(e => math.floor(e.getDouble(2) * 1000000).toLong).sum).toMap
    def stats(v: Long): (Long, Long, BigInt) = {
      val us = varOf.keys.filter(u => varOf(u) == v).toSeq
      (us.length.toLong, us.count(vMicro.contains).toLong,
        us.map(u => BigInt(vMicro.getOrElse(u, 0L))).sum)
    }
    val (n0, b0, s0) = stats(0L); val (n1, b1, s1) = stats(1L)
    val lift = (s1 * n0 - s0 * n1).toDouble / (BigInt(n0) * n1).toDouble
    val mde = EventOps.powerMde(spark, dir).collect().head.getDouble(5)
    Seq((0L, n0, b0, s0), (1L, n1, b1, s1)).zip(rows).foreach {
      case ((v, n, b, s), r) =>
        assert(r.getLong(0) == v && r.getLong(1) == n && r.getLong(2) == b)
        assert(r.getLong(3) == (b * 1000000L + n / 2) / n)
        assert(r.getLong(4) == (s / n).toLong)
        assert(r.getDouble(5) == lift)
        assert(r.getDouble(6) == mde)
        assert(r.getBoolean(7) == (math.abs(lift) >= mde))
    }
    // the hash split carries no treatment, so the fixture's honest answer
    // is "not detectable" — the table must actually say so
    assert(!rows.head.getBoolean(7), "a null experiment read as detectable")
  }

  test("funnel cohorts: rollup conserves the bounded funnel's per-user rows") {
    val funnel = EventOps.signupFunnelBounded(spark, dir).collect()
      .map(r => (r.getLong(1) / 604800000000L, r.getLong(4)))
    val rows = EventOps.funnelCohorts(spark, dir).collect()
    assert(rows.map(_.getLong(1)).sum == funnel.length.toLong)
    rows.foreach { r =>
      val wk = r.getLong(0)
      val cohort = funnel.filter(_._1 == wk)
      assert(r.getLong(1) == cohort.length.toLong)
      assert(r.getLong(2) == cohort.count(_._2 >= 2).toLong)
      assert(r.getLong(3) == cohort.count(_._2 == 3).toLong)
      assert(r.getLong(4) == (r.getLong(2) * 1000 + r.getLong(1) / 2) / r.getLong(1))
      assert(r.getLong(5) == (r.getLong(3) * 1000 + r.getLong(1) / 2) / r.getLong(1))
    }
    assert(rows.length > 1, "fixture should span multiple signup weeks")
  }

  test("CUPED: theta and variance reduction match exact BigInt moments") {
    val r = EventOps.cuped(spark, dir).collect().head
    val ev = Fixtures.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts").cast("timestamp")).as("tus")).collect()
    val mid = (ev.map(_.getLong(3)).min + ev.map(_.getLong(3)).max) / 2
    val users = ev.map(_.getLong(0)).distinct
    def tot(pre: Boolean): Map[Long, BigInt] = ev
      .filter(e => e.getString(1) == "purchase" && (if (pre) e.getLong(3) < mid else e.getLong(3) >= mid))
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(e => BigInt(math.floor(e.getDouble(2) * 1000).toLong)).sum).toMap
    val (px, py) = (tot(pre = true), tot(pre = false))
    val xs = users.map(u => px.getOrElse(u, BigInt(0)))
    val ys = users.map(u => py.getOrElse(u, BigInt(0)))
    val n = BigInt(users.length)
    val (sx, sy) = (xs.sum, ys.sum)
    val (sxx, syy) = (xs.map(v => v * v).sum, ys.map(v => v * v).sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == (sx / n).toLong && r.getLong(2) == (sy / n).toLong)
    val covN = n * sxy - sx * sy
    val varPreN = n * sxx - sx * sx
    val varPostN = n * syy - sy * sy
    assert(r.getDouble(3) == covN.toDouble / varPreN.toDouble)
    assert(r.getDouble(4) == covN.toDouble * covN.toDouble
      / (varPreN.toDouble * varPostN.toDouble))
    // the pre-period must actually predict the post-period on this fixture
    assert(r.getDouble(4) > 0, "zero variance reduction means the periods are disconnected")
    assert(r.getDouble(4) <= 1.0)
    // the overflow sentinel must read FALSE far from the DECIMAL(38) bound
    assert(!r.getBoolean(r.fieldIndex("moment_overflow_risk")))
  }

  test("degenerate population: one-user corpus yields NULL MDE/lift, not a crash or ±inf") {
    // A single user lands in exactly one hash arm: the other arm is empty
    // and n0+n1 <= 2, so every guarded statistic must read NULL in Spark
    // (DuckDB's oracle CASE guards match — without them it would error on
    // integer division by zero / return ±inf on double division).
    val tmp = java.nio.file.Files.createTempDirectory("degenerate_ab").toString
    import spark.implicits._
    Seq((1L, "2024-01-01 00:00:00", 7L, "purchase", 5.0, "{}"),
        (2L, "2024-01-02 00:00:00", 7L, "click", 0.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val mde = EventOps.powerMde(spark, tmp).collect().head
    assert(mde.getLong(0) + mde.getLong(1) == 1L, "one user, one arm")
    assert(mde.isNullAt(mde.fieldIndex("pooled_var_micro2")))
    assert(mde.isNullAt(mde.fieldIndex("mde_micro")))
    val lift = EventOps.experimentLift(spark, tmp).collect()
    assert(lift.nonEmpty)
    lift.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("lift_micro")))
      assert(r.isNullAt(r.fieldIndex("detectable")))
    }
  }

  test("fertility: ratios are the exact half-up milli of the summed counts") {
    val rows = TextAnalysis.fertility(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = Fixtures.table(spark, dir, "documents")
      .select("lang", "source", "text").collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
    val bpeRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]".r
    rows.foreach { r =>
      val grp = docs((r.getString(0), r.getString(1)))
      val chars = grp.map(_.getString(2).length.toLong).sum
      val ws = grp.map(_.getString(2).split(" ", -1).length.toLong).sum
      val bpe = grp.map(g => bpeRe.findAllIn(g.getString(2)).length.toLong).sum
      assert(r.getLong(2) == grp.length.toLong && r.getLong(3) == chars &&
        r.getLong(4) == ws && r.getLong(5) == bpe,
        s"counts for ${(r.getString(0), r.getString(1))}")
      assert(r.getLong(6) == (1000 * chars + bpe / 2) / bpe)
      assert(r.getLong(7) == (1000 * bpe + grp.length / 2) / grp.length)
    }
    assert(rows.map(_.getLong(2)).sum == docs.values.map(_.length.toLong).sum)
  }
}
