package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile.ProfileQueries

/** Invariants for the busy-window interval join, PMI collocations, and HHI
  * concentration profile (exact parity is driver-gated vs DuckDB).
  */
class IntervalCollocationSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def sessionsOf(dir: String): Seq[(Long, Long, Long)] = {
    val gapUs = 30L * 60 * 1000000
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    ev.groupBy(_._1).flatMap { case (uid, es) =>
      val ts = es.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var start = ts.head; var prev = ts.head
      for (t <- ts.tail) {
        if (t - prev > gapUs) { out += ((uid, start, prev)); start = t }
        prev = t
      }
      out += ((uid, start, prev)); out
    }.toSeq
  }

  test("busy windows: maximal disjoint hour runs; counts match a brute-force overlap") {
    val hourUs = 3600L * 1000000
    val rows = EventOps.busyWindowSessions(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val bounds = rows.map { r =>
      val s = r.getAs[java.time.LocalDateTime]("window_start")
        .toEpochSecond(java.time.ZoneOffset.UTC) / 3600
      val e = r.getAs[java.time.LocalDateTime]("window_end")
        .toEpochSecond(java.time.ZoneOffset.UTC) / 3600
      assert(e - s == r.getAs[Long]("n_hours") && e > s)
      (s, e)
    }
    // maximality: consecutive windows never touch (a touching pair would
    // have merged into one island)
    bounds.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(s2 > e1)
      case _ =>
    }
    val sess = sessionsOf(SparkSuite.Sf0001)
    rows.zip(bounds).foreach { case (r, (h0, h1x)) =>
      val over = sess.filter { case (_, s, e) => s < h1x * hourUs && e >= h0 * hourUs }
      assert(r.getAs[Long]("n_sessions") == over.size.toLong)
      assert(r.getAs[Long]("n_users") == over.map(_._1).distinct.size.toLong)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_sessions"))
    }
  }

  test("collocations: min support respected, ranking is descending, ratio is exact") {
    val rows = TextAnalysis.collocations(spark, SparkSuite.Sf0001, minCount = 5, k = 20)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("c_xy") >= 5))
    val scores = rows.map(_.getAs[Long]("pmi_ratio_ppm"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "not descending")
    // recompute the top row's ratio from brute-force corpus counts
    val top = rows.head
    val toks = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ").toSeq)
    val unis = toks.flatten.filter(_.nonEmpty)
    val bigs = toks.flatMap(t => t.zip(t.tail)).filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val bigCounts = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nb = bigCounts.collect { case (_, c) if c >= 5 => c }.sum
    val n1 = unis.size.toLong
    val cx = unis.count(_ == top.getAs[String]("w1")).toLong
    val cy = unis.count(_ == top.getAs[String]("w2")).toLong
    val cxy = bigCounts((top.getAs[String]("w1"), top.getAs[String]("w2")))
    val want = (BigInt(cxy) * BigInt(n1) * BigInt(n1) * 1000000) /
      (BigInt(nb) * BigInt(cx) * BigInt(cy))
    assert(BigInt(top.getAs[Long]("pmi_ratio_ppm")) == want)
  }

  test("hhi: bounded by [1e8/n_values, 1e8]; single-value groups hit exactly 1e8") {
    val rows = ProfileQueries.hhiProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, hhi) = (r.getAs[Long]("n_values"), r.getAs[Long]("hhi_e8"))
      assert(hhi <= 100000000L)
      // ">= 1e8/n - 1": the floor division can sit just under the bound
      assert(hhi >= 100000000L / nv - 1, s"hhi=$hhi n=$nv")
      if (nv == 1) assert(hhi == 100000000L)
    }
    val total = rows.map(_.getAs[Long]("total")).sum
    assert(total == spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet").count())
  }

  test("rolling WAU: brute-force window equality; wau >= dau always") {
    val rows = EventOps.rollingActiveUsers(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val dayUser = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(to_date(col("ts").cast("timestamp")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Long]("user_id")))
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      val dau = dayUser.filter(_._1 == d).map(_._2).distinct.length.toLong
      val wau = dayUser.filter { case (dd, _) =>
        !dd.isAfter(d) && !dd.isBefore(d.minusDays(6))
      }.map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("dau") == dau && r.getAs[Long]("wau") == wau, s"day=$d")
      assert(wau >= dau)
    }
  }

  test("source TV distance: bounded; disjoint vocabularies score exactly 1e6") {
    val rows = TextAnalysis.sourceTvDistance(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tv = r.getAs[Long]("tv_ppm")
      assert(tv >= 0 && tv <= 1000000L, s"tv=$tv")
    }
    // planted: two sources with zero shared words -> TV = 1.0 exactly.
    // a third source shares words with both so the pair survives the
    // common-word inner join (disjoint pairs drop by design)
    import spark.implicits._
    val planted = Seq(
      (1L, "aa bb cc aa", "en", "s1", 10L),
      (2L, "dd ee ff dd", "en", "s2", 10L),
      (3L, "aa dd", "en", "s3", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("tv_fix")
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.sourceTvDistance(spark, tmp.toString).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        r.getAs[Long]("tv_ppm")).toMap
    // s1 vs s2 share nothing -> absent from the matrix (inner join);
    // s1 vs s3: common word 'aa'; exact TV by hand:
    // s1: aa=2,bb=1,cc=1 (n=4); s3: aa=1,dd=1 (n=2)
    // sum|ca*nb-cb*na| over common: |2*2-1*4|=0; absent: nb*(4-2)+na*(2-1)=2*2+4*1=8
    // TV = 8/(2*4*2) = 0.5 -> 500000
    assert(!got.contains(("s1", "s2")))
    assert(got(("s1", "s3")) == 500000L, s"got=${got(("s1", "s3"))}")
  }

  test("rolling WAU sketch gate: within tolerance at sf0.001 (deterministic)") {
    val rows = EventOps.rollingWauSketchGate(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_tol")))
  }

  test("debounce: totals reconcile; a zero-holdoff keeps everything") {
    val rows = EventOps.debounceSummary(spark, SparkSuite.Sf0001).collect()
    val total = rows.map(_.getAs[Long]("n_total")).sum
    assert(total ==
      spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("n_kept") >= 1)
    }
    val loose = EventOps.debounceSummary(spark, SparkSuite.Sf0001, holdoffUs = 0L)
      .collect()
    assert(loose.forall(r => r.getAs[Long]("n_dropped") == 0L))
  }
}
