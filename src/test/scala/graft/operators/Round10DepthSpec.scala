package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile.ProfileQueries

/** Round-10 depth operators, each verified against an ORACLE-INDEPENDENT
  * recompute (plain Scala BigInt / java.util.regex over the raw fixture) so
  * the DuckDB gate is the second check, not the only one.
  */
class Round10DepthSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("recall eval rows are the exact intersections of the public legs") {
    val rows = Similarity.recallEval(spark, dir).collect()
    assert(rows.length == 10, s"expected 5 queries x 2 methods, got ${rows.length}")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gt = pairs(Similarity.cosineTopK(spark, dir, 5, 10))
    val legs = Map(
      "ivf" -> pairs(Similarity.ivfTopK(spark, dir, 5, 10)),
      "signlsh" -> pairs(Similarity.SignLsh.topK(spark, dir, 5, 10)))
    rows.foreach { r =>
      val (q, m, hits, perm) = (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val expect = gt.count(p => p._1 == q && legs(m).contains(p))
      assert(hits == expect, s"query $q method $m: hits $hits != $expect")
      assert(perm == hits * 1000 / 10)
    }
    // the harness is only useful if it measures something non-trivial: at
    // least one method must recover at least one true neighbor
    assert(rows.map(_.getLong(2)).sum > 0, "all legs scored zero recall")
  }

  test("autocorrelation matches a BigInt recompute of the dense hourly series") {
    val got = EventOps.autocorrelation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val n = (ev.map(_._2).max - h0 + 1).toInt
    var checked = 0
    ev.map(_._1).distinct.foreach { t =>
      val xs = Array.fill(n)(0L)
      ev.filter(_._1 == t).foreach { case (_, h) => xs((h - h0).toInt) += 1 }
      val s = BigInt(xs.sum)
      val d = xs.map(x => BigInt(n) * x - s)
      val den = d.map(v => v * v).sum
      Seq(1, 2, 3, 6, 12, 24, 48, 168).filter(l => den > 0 && l < n).foreach { lag =>
        val num = (0 until n - lag).map(i => d(i) * d(i + lag)).sum
        val expect = if (num < 0) -((-num) * 1000000 / den) else num * 1000000 / den
        assert(got.get((t, lag.toLong)).contains(expect.toLong),
          s"$t lag=$lag: got ${got.get((t, lag.toLong))}, want $expect")
        checked += 1
      }
    }
    assert(checked == got.size, s"recompute covered $checked of ${got.size} rows")
  }

  test("changepoint matches a BigInt argmax over the dense hourly prefix sums") {
    val got = EventOps.changepoint(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val n = (ev.map(_._2).max - h0 + 1).toInt
    ev.map(_._1).distinct.foreach { t =>
      val xs = Array.fill(n)(0L)
      ev.filter(_._1 == t).foreach { case (_, h) => xs((h - h0).toInt) += 1 }
      val s = BigInt(xs.sum)
      var a = BigInt(0)
      val cands = (1 until n).map { tt =>
        a += xs(tt - 1)
        val dev = a * n - s * tt
        (tt, a, dev * dev / (BigInt(tt) * (n - tt)))
      }
      val (bt, ba, bg) = cands.maxBy { case (tt, _, gg) => (gg, BigInt(-tt)) }
      val expect = (h0 + bt - 1, bt.toLong, n.toLong, bg.toLong,
        (ba * 1000 / bt).toLong, ((s - ba) * 1000 / (n - bt)).toLong)
      assert(got(t) == expect, s"$t: got ${got(t)}, want $expect")
    }
  }

  test("cramers V matches a BigInt recompute of the contingency tables") {
    val got = ProfileQueries.cramersV(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    Seq(("orders", "o_orderstatus", "o_orderpriority"),
      ("lineitem", "l_returnflag", "l_linestatus"),
      ("documents", "lang", "source")).foreach { case (t, a, b) =>
      val cells = spark.read.parquet(s"$dir/$t.parquet").groupBy(a, b).count()
        .collect().map(r => ((r.get(0).toString, r.get(1).toString), r.getLong(2)))
      val nTot = BigInt(cells.map(_._2).sum)
      val rM = cells.groupBy(_._1._1).map { case (k, cs) => k -> BigInt(cs.map(_._2).sum) }
      val cM = cells.groupBy(_._1._2).map { case (k, cs) => k -> BigInt(cs.map(_._2).sum) }
      val chi = cells.map { case ((va, vb), o) =>
        val dev = nTot * o - rM(va) * cM(vb)
        dev * dev * 1000000 / (nTot * rM(va) * cM(vb))
      }.sum
      val v2 = chi * 1000 / (nTot * BigInt(math.min(rM.size, cM.size) - 1))
      assert(got(t) == ((nTot.toLong, rM.size.toLong, cM.size.toLong, chi.toLong, v2.toLong)),
        s"$t($a,$b): got ${got(t)}")
      // V^2 is a normalized association: inside [0, 1] in ppb
      assert(v2 >= 0 && v2 <= BigInt(1000000000), s"$t v2_ppb=$v2 out of range")
    }
  }

  test("nprobe sweep is monotone and its np=4 row equals recallEval's ivf total") {
    val rows = Similarity.nprobeSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L))
    // more probes can only add candidates: recall is non-decreasing
    Seq(1L -> 2L, 2L -> 4L, 4L -> 8L).foreach { case (lo, hi) =>
      assert(rows(lo)._1 <= rows(hi)._1, s"recall regressed $lo→$hi: $rows")
    }
    rows.foreach { case (_, (hits, perm)) =>
      assert(hits >= 0 && hits <= 50 && perm == hits * 1000 / 50)
    }
    val ivfTotal = Similarity.recallEval(spark, dir).collect()
      .filter(_.getString(1) == "ivf").map(_.getLong(2)).sum
    assert(rows(4L)._1 == ivfTotal, "np=4 must equal recallEval's default-ivf hits")
  }

  test("gk lambda matches a BigInt recompute of the contingency tables") {
    val got = ProfileQueries.gkLambda(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    Seq(("orders", "o_orderstatus", "o_orderpriority"),
      ("lineitem", "l_returnflag", "l_linestatus"),
      ("documents", "lang", "source")).foreach { case (t, a, b) =>
      val cells = spark.read.parquet(s"$dir/$t.parquet").groupBy(a, b).count()
        .collect().map(r => ((r.get(0).toString, r.get(1).toString), r.getLong(2)))
      val n = cells.map(_._2).sum
      val byRow = cells.groupBy(_._1._1).view.mapValues(_.map(_._2)).toMap
      val byCol = cells.groupBy(_._1._2).view.mapValues(_.map(_._2)).toMap
      val maxC = byCol.values.map(_.sum).max
      val maxR = byRow.values.map(_.sum).max
      val lamAb = (byRow.values.map(_.max).sum - maxC) * 1000000L / (n - maxC)
      val lamBa = (byCol.values.map(_.max).sum - maxR) * 1000000L / (n - maxR)
      assert(got(t) == ((n, lamAb, lamBa)), s"$t($a,$b): got ${got(t)}, want ($n,$lamAb,$lamBa)")
      assert(lamAb >= 0 && lamAb <= 1000000 && lamBa >= 0 && lamBa <= 1000000)
    }
  }

  test("banding curve matches a Scala recompute of the capped band self-join") {
    val got = Dedup.bandingCurve(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set((8L, 1L), (4L, 2L), (2L, 4L), (1L, 8L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Dedup.corpusWithNearDups(spark, dir)
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val shd = docs.map { case (id, sh) => id -> sh.toSet }.toMap
    val sigs = docs.map { case (id, sh) =>
      id -> (0 until 8).map(i => sh.map(s => md5hex(s"$i|$s")).min)
    }
    got.keys.foreach { case (nb, r) =>
      val buckets = sigs.flatMap { case (id, sig) =>
        (0 until nb.toInt).map { b =>
          (b, md5hex((0 until r.toInt).map(j => sig(b * r.toInt + j)).mkString)) -> id
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
      val pairs = buckets.values.flatMap { ids =>
        val dense = ids.take(Dedup.MaxBucket)
        val densePairs = for {
          i <- dense.indices; j <- i + 1 until dense.size
        } yield (dense(i), dense(j))
        densePairs ++ ids.drop(Dedup.MaxBucket).map(x => (ids.head, x))
      }.toSet
      val jacs = pairs.toSeq.map { case (a, b) =>
        (a, b, (shd(a) & shd(b)).size.toDouble / (shd(a) | shd(b)).size)
      }
      val nc = jacs.size.toLong
      val nt = jacs.count(_._3 >= 0.5).toLong
      val pf = jacs.count(p => p._2 == p._1 + Dedup.IdOffset).toLong
      val prec = if (nc == 0) 0L else nt * 1000 / nc
      assert(got((nb, r)) == ((nc, nt, prec, pf)),
        s"config ${nb}x$r: got ${got((nb, r))}, want ($nc,$nt,$prec,$pf)")
    }
  }

  test("seasonal backtest matches a BigInt recompute over the dense series") {
    val got = EventOps.seasonalBacktest(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val h0 = ev.map(_._2).min
    val n = (ev.map(_._2).max - h0 + 1).toInt
    ev.map(_._1).distinct.foreach { t =>
      val xs = Array.fill(n)(0L)
      ev.filter(_._1 == t).foreach { case (_, h) => xs((h - h0).toInt) += 1 }
      val test = (168 until n)
      val nTest = BigInt(test.size)
      val ae168 = test.map(i => BigInt((xs(i) - xs(i - 168)).abs)).sum
      val ae1 = test.map(i => BigInt((xs(i) - xs(i - 1)).abs)).sum
      val bias = test.map(i => BigInt(xs(i) - xs(i - 168))).sum
      def sdiv(a: BigInt, b: BigInt): Long =
        (if (a < 0) -((-a) * 1000 / b) else a * 1000 / b).toLong
      val skill =
        if (ae1 == 0) 0L
        else if (ae1 >= ae168) ((ae1 - ae168) * 1000 / ae1).toLong
        else -(((ae168 - ae1) * 1000 / ae1)).toLong
      val expect = (nTest.toLong, (ae168 * 1000 / nTest).toLong,
        (ae1 * 1000 / nTest).toLong, sdiv(bias, nTest), skill)
      assert(got(t) == expect, s"$t: got ${got(t)}, want $expect")
    }
  }

  test("HT estimator gate holds: char totals tight, doc counts within design tolerance") {
    val r = TextAnalysis.ppsHtGate(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 100, "sample size")
    assert(row.getBoolean(7), s"chars_ok false: err=${row.getLong(6)} permille")
    assert(row.getBoolean(8), s"docs_ok false: err=${row.getLong(3)} permille")
    // the PPS self-normalizing property: the char-total estimate is
    // floor-tight, not merely within tolerance
    assert(row.getLong(6) <= 1, s"char estimate should be ~exact, err=${row.getLong(6)}")
  }

  test("conversion lag deciles match a Scala recompute of nearest-prior-click lags") {
    val got = EventOps.conversionLag(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("tus"),
        col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val win = 3600L * 1000000
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._2) }
    val lags = ev.filter(_._4 == "purchase").flatMap { case (u, pt, eid, _) =>
      val cands = clicksByUser.getOrElse(u, Array.empty[Long])
        .filter(ct => ct <= pt && ct >= pt - win)
      if (cands.isEmpty) None else Some((eid, pt - cands.max))
    }.sortBy { case (eid, lag) => (lag, eid) }
    val n = lags.length
    val base = n / 10; val extra = n % 10
    var idx = 0
    val expect = (1 to 10).flatMap { dec =>
      val sz = base + (if (dec <= extra) 1 else 0)
      val bucket = lags.slice(idx, idx + sz).map(_._2)
      idx += sz
      if (sz == 0) None
      else Some(dec.toLong -> ((sz.toLong, bucket.min / 1000, bucket.max / 1000,
        bucket.map(BigInt(_)).sum.toLong / (sz * 1000L))))
    }.toMap
    assert(lags.nonEmpty, "fixture must produce at least one converting purchase")
    assert(got == expect, s"got $got\nwant $expect")
  }

  test("dedup impact by source matches a recompute from the keep list") {
    val got = Dedup.dedupImpactBySource(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val kl = Dedup.dedupKeepList(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = kl.groupBy { case (id, _) => srcOf(if (id >= 1000000L) id - 1000000L else id) }
      .map { case (s, rows) =>
        val n = rows.length.toLong; val kept = rows.map(_._2).sum
        s -> ((n, kept, n - kept, (n - kept) * 1000 / n))
      }
    assert(got == expect, s"got $got\nwant $expect")
    // the planted copies guarantee real drops: overall drop rate must be ~half
    val dropped = got.values.map(_._3).sum
    assert(dropped > 0, "dedup must drop the planted near-dup copies")
  }

  test("dedup weights conserve total doc mass and match a keep-list recompute") {
    val kl = Dedup.dedupKeepList(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def src(id: Long) = srcOf(if (id >= 1000000L) id - 1000000L else id)
    val clusterSize = kl.groupBy(_._2).map { case (c, g) => c -> g.length.toLong }
    val expect = kl.groupBy(t => src(t._1)).map { case (s, rows) =>
      val keepers = rows.filter(_._3 == 1L)
      val rep = keepers.map(t => clusterSize(t._2)).sum
      s -> ((rows.length.toLong, keepers.length.toLong, rep,
        rep * 1000 / rows.length))
    }
    val got = Dedup.dedupWeights(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
    // HT mass conservation: survivors represent the whole corpus exactly
    assert(got.values.map(_._3).sum == kl.length.toLong,
      "sum(represented) must equal the corpus size")
  }

  test("bot regularity matches a BigInt recompute of per-user gap moments") {
    val byUser = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "unix_micros(cast(ts as timestamp)) as tus").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (u, rows) => u -> rows.map(_._2).sorted }
    val expect = byUser.flatMap { case (u, ts) =>
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      if (gaps.length < 9) None
      else {
        val n = BigInt(gaps.length); val s1 = gaps.map(BigInt(_)).sum
        val s2 = gaps.map(g => BigInt(g) * g).sum
        val cv2 = (BigInt(1000000) * (n * s2 - s1 * s1)) / (s1 * s1)
        Some(u -> ((n.toLong, (s1 / n).toLong, cv2.toLong, cv2 < 250000)))
      }
    }
    val got = EventOps.botRegularity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expect, s"got ${got.size} rows, want ${expect.size}")
  }

  test("attribution matches a plain-Scala credit recompute and conserves credit") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "user_id", "event_type",
        "unix_micros(cast(ts as timestamp)) as tus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val touches = ev.filter(t => t._3 == "click" || t._3 == "view")
    val winUs = 72L * 3600 * 1000000
    val credits = collection.mutable.Map[String, (Long, Long, Long, Long)]()
      .withDefaultValue((0L, 0L, 0L, 0L))
    var attributed = 0L
    ev.filter(_._3 == "purchase").foreach { case (_, u, _, cts) =>
      val win = touches.filter(t => t._2 == u && t._4 < cts && t._4 >= cts - winUs)
        .sortBy(t => (t._4, t._1))
      if (win.nonEmpty) {
        attributed += 1
        val n = win.length
        win.zipWithIndex.foreach { case ((_, _, ty, _), i) =>
          val (c, f, l, lin) = credits(ty)
          credits(ty) = (c + 1,
            f + (if (i == 0) 1000L else 0L),
            l + (if (i == n - 1) 1000L else 0L),
            lin + 1000L / n + (if (i == n - 1) 1000L % n else 0L))
        }
      }
    }
    val got = EventOps.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == credits.toMap, s"got $got\nwant ${credits.toMap}")
    // every model distributes exactly 1000 per attributed conversion
    Seq(2, 3, 4).foreach { i =>
      val tot = got.values.map(v => i match {
        case 2 => v._2; case 3 => v._3; case _ => v._4 }).sum
      assert(tot == attributed * 1000L, s"model col $i: $tot != ${attributed * 1000}")
    }
  }

  test("audio profile flags exactly the planted clipped recordings") {
    val rows = Multimodal.audioProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, n, clipped, peak) = (r.getLong(0), r.getLong(3), r.getLong(7), r.getLong(6))
      assert(n == 64 + id % 64, s"doc $id: n_samples $n")
      if (id % 10 == 0) {
        assert(clipped == n && peak == 32767L,
          s"doc $id: planted full-scale doc must be fully clipped ($clipped/$n, peak $peak)")
      } else {
        assert(clipped == 0L && peak <= 1024L,
          s"doc $id: clean doc flagged ($clipped clipped, peak $peak)")
      }
    }
  }

  test("image dhash profile matches direct decode and is non-degenerate") {
    val rows = Multimodal.imageDHashProfile(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(rows.nonEmpty)
    // the distributed seam must equal a direct local decode of the same bytes
    rows.take(5).foreach { case (id, h) =>
      assert(h == Multimodal.dHash64(Multimodal.synthPng(id)),
        s"doc $id: seam hash differs from direct decode")
    }
    // gradient phase varies per doc: hashes must not collapse to one value
    assert(rows.values.toSet.size > rows.size / 4,
      s"dhash degenerate: ${rows.values.toSet.size} distinct of ${rows.size}")
  }

  test("image dup groups recover exactly the planted 5-groups") {
    val rows = Multimodal.imageDupGroups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs, "every doc must land in a group")
    rows.foreach { case (_, n, keeper) =>
      assert(keeper % 5 == 0, s"keeper $keeper must be the group leader")
      assert(n == math.min(5L, nDocs - keeper), s"group at $keeper has $n docs")
    }
  }

  test("anonymization ladder matches a plain-Scala recompute at every level") {
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .selectExpr("cast(c_nationkey as bigint)", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val regOf = spark.read.parquet(s"$dir/nation.parquet")
      .selectExpr("cast(n_nationkey as bigint)", "cast(n_regionkey as bigint)").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ladder[K](key: ((Long, String)) => K): (Long, Long, Long, Boolean) = {
      val sizes = cust.groupBy(key).map(_._2.length.toLong)
      (sizes.size.toLong, sizes.min, sizes.filter(_ < 5).sum, sizes.min >= 5)
    }
    val expect = Map(
      0L -> ladder(c => (c._1, c._2)),
      1L -> ladder(c => (regOf(c._1), c._2)),
      2L -> ladder(c => regOf(c._1)),
      3L -> ladder(_ => ()))
    val got = ProfileQueries.anonymizationLadder(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
    // the ladder is monotone: once generalization reaches k, it stays there
    val oks = (0L to 3L).map(l => got(l)._4)
    assert(!oks.zip(oks.tail).exists { case (a, b) => a && !b }, s"non-monotone: $oks")
  }

  test("cdc chunks match a plain-Scala rolling-hash recompute") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def roll(w: String): Long =
      w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    val docs = Dedup.corpusWithNearDups(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunks = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      var c = 0L
      val buf = collection.mutable.ArrayBuffer[(Long, Long, String)]()
      ws.foreach { w =>
        if (roll(w) % 16 == 0) c += 1
        buf += ((id, c, w))
      }
      buf.groupBy(t => (t._1, t._2)).map { case (_, g) =>
        (md5hex(g.map(_._3).mkString(" ")), g.head._1, g.length.toLong)
      }
    }
    val perHash = chunks.groupBy(_._1).map { case (_, g) =>
      (g.length.toLong, g.map(_._2).distinct.length.toLong, g.map(_._3).sum)
    }
    val nc = perHash.map(_._1).sum; val nd = perHash.size.toLong
    val nx = perHash.count(_._2 >= 2).toLong; val tw = perHash.map(_._3).sum
    val expect = (nc, nd, nx, 1000 * (nc - nd) / nc, 1000 * tw / nc)
    val r = Dedup.cdcChunks(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(got == expect, s"got $got\nwant $expect")
    // the planted near-dup copies must share sub-document chunks
    assert(got._3 > 0, "no cross-doc chunks found")
  }

  test("cluster language purity matches a recompute from the cluster labels") {
    val langOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val per = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(1), langOf {
        val id = r.getLong(0); if (id >= 1000000L) id - 1000000L else id
      }))
      .groupBy(_._1).map { case (_, g) => g.map(_._2).distinct.length }
    val expect = (per.size.toLong, per.count(_ >= 2).toLong,
      per.count(_ >= 2).toLong * 1000 / per.size, per.max.toLong)
    val r = Dedup.clusterLangPurity(spark, dir).collect().head
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(got == expect, s"got $got\nwant $expect")
  }

  test("pk discovery flags exactly the unique null-free columns") {
    val flags = ProfileQueries.pkDiscovery(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap
    // known identifiers must be found
    Seq(("orders", "o_orderkey"), ("customer", "c_custkey"),
      ("documents", "doc_id"), ("part", "p_partkey"),
      ("supplier", "s_suppkey"), ("events", "event_id")).foreach { k =>
      assert(flags(k), s"$k should be a discovered PK")
    }
    // repeated / low-cardinality columns must not be
    Seq(("lineitem", "l_orderkey"), ("documents", "lang"),
      ("orders", "o_custkey")).foreach { k =>
      assert(!flags(k), s"$k must NOT be flagged as a PK")
    }
  }

  test("user intensity matches a Scala recompute for every user") {
    val got = EventOps.userIntensity(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), expr("unix_micros(cast(ts as timestamp))").as("tus"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.size == ev.map(_._1).distinct.length)
    ev.groupBy(_._1).foreach { case (u, rows) =>
      val ts = rows.map(_._2).sorted
      val hs = ts.map(_ / 3600000000L)
      val hourCounts = hs.groupBy(identity).view.mapValues(_.size.toLong)
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val expect = (ts.length.toLong, hourCounts.size.toLong, hourCounts.values.max,
        hs.max - hs.min + 1, if (gaps.isEmpty) -1L else gaps.min,
        ts.length * 1000L / hourCounts.size)
      assert(got(u) == expect, s"user $u: got ${got(u)}, want $expect")
    }
  }

  test("readability counts match java.util.regex over the raw text") {
    import java.util.regex.Pattern
    def cnt(p: Pattern, s: String): Long = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    val (pw, ps, py) = (Pattern.compile("[A-Za-z]+"),
      Pattern.compile("[.!?]"), Pattern.compile("[aeiouyAEIOUY]+"))
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TextAnalysis.readability(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val text = texts(r.getLong(0))
      val (w, s, y) = (math.max(cnt(pw, text), 1L), math.max(cnt(ps, text), 1L),
        cnt(py, text))
      assert(r.getLong(1) == w && r.getLong(2) == s && r.getLong(3) == y,
        s"doc ${r.getLong(0)}: counts (${r.getLong(1)},${r.getLong(2)},${r.getLong(3)}) != ($w,$s,$y)")
      assert(r.getLong(4) == 39 * w / s + 1180 * y / w - 1559)
    }
  }

  test("zipf profile matches a plain-Scala frequency spectrum") {
    val freqs = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (_, g) => g.length.toLong }
    val byBucket = freqs.groupBy(f => 64L - java.lang.Long.numberOfLeadingZeros(f))
    val tt = freqs.sum
    val ty = freqs.size.toLong
    val expect = byBucket.map { case (b, fs) =>
      b -> ((fs.size.toLong, fs.sum, fs.min, fs.max,
        fs.sum * 1000 / tt, fs.size * 1000L / ty))
    }
    val got = TextAnalysis.zipfProfile(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
  }

  test("lexical diversity matches a plain-Scala per-source recompute") {
    val bySource = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) =>
        s -> rows.flatMap(_.getString(1).split(" ", -1)).filter(_.nonEmpty)
          .groupBy(identity).map { case (_, g) => g.length.toLong }
      }
    val expect = bySource.map { case (s, freqs) =>
      val n = freqs.sum; val ty = freqs.size.toLong
      val hapax = freqs.count(_ == 1L).toLong
      val coll = freqs.map(f => BigInt(f) * (f - 1)).sum
      s -> ((n, ty, hapax, ty * 1000 / n, hapax * 1000 / ty,
        (BigInt(1000000) * coll / (BigInt(n) * (n - 1))).toLong))
    }
    val got = TextAnalysis.lexicalDiversity(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
  }

  test("dedup quality bias matches a recompute from its two input stages") {
    val kl = Dedup.dedupKeepList(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val qKeep = TextAnalysis.qualityPrune(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val expect = kl.groupBy { case (id, _) => qKeep(if (id >= 1000000L) id - 1000000L else id) }
      .map { case (q, rows) =>
        val n = rows.length.toLong; val kept = rows.map(_._2).sum
        q -> ((n, kept, n - kept, (n - kept) * 1000 / n))
      }
    val got = Dedup.dedupQualityBias(spark, dir).collect()
      .map(r => r.getBoolean(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
    assert(got.values.map(_._3).sum > 0, "planted copies must produce drops")
  }

  test("knn mutual-graph diagnostic matches a sequential-fold recompute") {
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val nrm = vecs.map { case (id, v, _) => id -> math.sqrt(dot(v, v)) }.toMap
    val k = 5
    val knn: Map[Long, Seq[Long]] = vecs.map { case (id, v, _) =>
      id -> vecs.filter(_._1 != id)
        .map { case (j, u, _) => (j, dot(v, u) / (nrm(id) * nrm(j))) }
        .sortBy { case (j, c) => (-c, j) }.take(k).map(_._1).toSeq
    }.toMap
    val edges = knn.toSeq.flatMap { case (a, ns) => ns.map(a -> _) }.toSet
    val inDeg = edges.toSeq.groupBy(_._2).map { case (j, es) => j -> es.size.toLong }
    val expect = vecs.groupBy(_._3).map { case (lab, vs) =>
      val n = vs.length.toLong
      val nMut = vs.map { case (id, _, _) => knn(id).count(j => edges.contains(j -> id)).toLong }.sum
      lab.toLong -> ((n, n * k, nMut, nMut * 1000 / (n * k),
        vs.map(v => inDeg.getOrElse(v._1, 0L)).max,
        vs.count(v => !inDeg.contains(v._1)).toLong))
    }
    val got = Similarity.knnGraphMutual(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect, s"got $got\nwant $expect")
  }

  private def loadVecs(): Array[(Long, Array[Float], Int)] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))

  /** Strict left-to-right fold, the engine's `aggregate` order. */
  private def dotLR(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("sq8 ADC top-k matches an int8 screen + exact rerank in plain Scala") {
    val vecs = loadVecs()
    val nrm = vecs.map { case (id, v, _) => id -> math.sqrt(dotLR(v, v)) }.toMap
    val q8 = vecs.map { case (id, v, _) =>
      id -> v.map(x => math.floor(x.toDouble / nrm(id) * 127 + 0.5).toLong)
    }.toMap
    val (numQueries, k, rerank) = (5, 3, 12)
    val expect = vecs.filter(_._1 < numQueries).sortBy(_._1).flatMap { case (qid, qv, _) =>
      val screened = vecs.filter(_._1 != qid)
        .map { case (cid, _, _) =>
          (cid, q8(qid).zip(q8(cid)).map { case (x, y) => x * y }.sum)
        }
        .sortBy { case (cid, adc) => (-adc, cid) }.take(rerank)
      screened
        .map { case (cid, adc) =>
          val cv = vecs.find(_._1 == cid).get._2
          (cid, adc, dotLR(qv, cv) / (nrm(qid) * nrm(cid)))
        }
        .sortBy { case (cid, _, cos) => (-cos, cid) }.take(k)
        .zipWithIndex
        .map { case ((cid, adc, cos), i) => (qid, cid, (i + 1).toLong, adc, cos) }
    }.toSeq
    val got = Similarity.sq8TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // the screen must be doing real work: ADC order at rerank depth must
    // recover the exact top-k (rerank >= k is the design contract here)
    assert(got.size == numQueries * k)
  }

  test("hard negatives match a plain Scala recompute with triplet flags") {
    val vecs = loadVecs()
    val nrm = vecs.map { case (id, v, _) => id -> math.sqrt(dotLR(v, v)) }.toMap
    val (numQueries, k) = (20, 5)
    val expect = vecs.filter(_._1 < numQueries).sortBy(_._1).flatMap {
      case (qid, qv, qlab) =>
        val scored = vecs.filter(_._1 != qid).map { case (cid, cv, clab) =>
          (cid, clab, dotLR(qv, cv) / (nrm(qid) * nrm(cid)))
        }
        val posCos = scored.filter(_._2 == qlab).map(_._3) match {
          case a if a.isEmpty => None
          case a => Some(a.max)
        }
        scored.filter(_._2 != qlab)
          .sortBy { case (cid, _, cos) => (-cos, cid) }.take(k)
          .zipWithIndex.map { case ((cid, _, cos), i) =>
            (qid, cid, (i + 1).toLong, cos, posCos, posCos.exists(cos > _))
          }
    }.toSeq
    val got = Similarity.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
      .toSeq
    assert(got == expect, s"got ${got.take(8)}...\nwant ${expect.take(8)}...")
    // mining is only meaningful if the space is imperfect somewhere AND the
    // flag is not vacuously true: both flag values must appear
    assert(got.map(_._6).distinct.size == 2,
      s"violation flag is constant (${got.map(_._6).distinct}) - fixture degenerate?")
  }

  test("dimension correlation matrix matches a BigInt recompute") {
    val vecs = loadVecs()
    val d = vecs.head._2.length
    val micro = vecs.map { case (_, v, _) =>
      v.map(x => math.floor(x.toDouble * 1000000).toLong)
    }
    val n = vecs.length.toLong
    val s = Array.tabulate(d)(i => micro.map(r => BigInt(r(i))).sum)
    val q = Array.tabulate(d)(i => micro.map(r => BigInt(r(i)) * r(i)).sum)
    val got = Similarity.dimCorrMatrix(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == d * (d - 1) / 2)
    var checked = 0
    for (i <- 0 until d; j <- i + 1 until d) {
      val sxy = micro.map(r => BigInt(r(i)) * r(j)).sum
      val corr = (n * sxy.toDouble - s(i).toDouble * s(j).toDouble) /
        (math.sqrt(n * q(i).toDouble - s(i).toDouble * s(i).toDouble) *
          math.sqrt(n * q(j).toDouble - s(j).toDouble * s(j).toDouble))
      val (gn, gc) = got((i, j))
      assert(gn == n && gc == corr, s"($i,$j): got ($gn,$gc) want ($n,$corr)")
      checked += 1
    }
    assert(checked == got.size)
  }

  test("ivf incremental maintenance matches a plain Scala assignment") {
    val vecs = loadVecs()
    def l2(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) {
        val t = a(i).toDouble - b(i).toDouble; acc += t * t; i += 1
      }
      acc
    }
    val cents = vecs.filter(v => v._1 >= 100 && v._1 < 116)
      .map(v => (v._1, v._2)).sortBy(_._1)
    val assigned = vecs.map { case (id, v, _) =>
      val (cell, dist) = cents.map { case (c, cv) => (c, l2(v, cv)) }
        .minBy { case (c, dd) => (dd, c) }
      (id, cell, math.floor(dist * 1000000).toLong, id >= 400)
    }
    val expect = assigned.groupBy(_._2).toSeq.sortBy(_._1).map { case (cell, as) =>
      val base = as.filter(!_._4); val nw = as.filter(_._4)
      val nb = base.length.toLong; val nn = nw.length.toLong
      val bm = base.map(_._3).sum / nb
      val nm = if (nn == 0) 0L else nw.map(_._3).sum / nn
      val drift = if (nn == 0 || bm == 0) 0L else nm * 1000 / bm
      (cell, nb, nn, nn * 1000 / nb, bm, nm, drift)
    }
    val got = Similarity.ivfIncremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // the report is only a maintenance signal if the batch actually landed:
    // the fixture's 100 post-base vectors must appear somewhere
    assert(got.map(_._3).sum == vecs.count(_._1 >= 400).toLong)
  }

  test("top principal component matches an independent covariance + iteration") {
    val vecs = loadVecs()
    val d = vecs.head._2.length
    val micro = vecs.map(_._2.map(x => BigInt(math.floor(x.toDouble * 1000000).toLong)))
    val n = BigInt(vecs.length)
    // covariance recomputed straight from the raw floats, not via the
    // engine's marginal/pair frames
    val c = Array.tabulate(d, d) { (i, j) =>
      val sxy = micro.map(r => r(i) * r(j)).sum
      val si = micro.map(_(i)).sum
      val sj = micro.map(_(j)).sum
      n * sxy - si * sj
    }
    var v = Array.fill(d)(BigInt(1000000))
    (0 until 12).foreach { _ =>
      val mv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
      val m = mv.map(_.abs).max
      if (m != 0) v = mv.map(x => x * 1000000 / m)
    }
    val num = (for (i <- 0 until d; j <- 0 until d) yield c(i)(j) * v(i) * v(j)).sum
    val den = v.map(x => x * x).sum
    val trace = (0 until d).map(i => c(i)(i)).sum
    val expl = (num * 1000 / (den * trace)).toLong
    val expect = (0 until d).map(i => (i, v(i)))
      .sortBy { case (i, x) => (-x.abs, BigInt(i)) }.take(10)
      .zipWithIndex.map { case ((dim, load), r) => ((r + 1).toLong, dim, load.toLong, expl) }
    val got = Similarity.topPrincipalComponent(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // contract properties: the scale pin and a meaningful dominant direction
    assert(got.head._3.abs == 1000000L, "max |loading| must be exactly 1e6")
    assert(expl > 0 && expl <= 1000, s"explained permille out of range: $expl")
  }

  test("markov stationary matches an independent chain recompute") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("cur"))
      .withColumn("nxt", org.apache.spark.sql.functions.lead(col("cur"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select("cur", "nxt").collect().map(r => (r.getString(0), r.getString(1)))
    val sources = steps.map(_._1).distinct.sorted
    val kept = steps.filter(s => sources.contains(s._2))
    val counts = kept.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowTot = kept.groupBy(_._1).map { case (c, es) => c -> es.length.toLong }
    val idx = sources.zipWithIndex.toMap
    val p = Array.fill(sources.length, sources.length)(BigInt(0))
    counts.foreach { case ((c, x), n) => p(idx(c))(idx(x)) = BigInt(n) * 1000000 / rowTot(c) }
    var v = Array.fill(sources.length)(BigInt(1000000))
    (0 until 12).foreach { _ =>
      val mv = Array.tabulate(sources.length)(j => sources.indices.map(i => v(i) * p(i)(j)).sum)
      val m = mv.max
      if (m != 0) v = mv.map(x => x * 1000000 / m)
    }
    val tot = v.sum
    val expect = sources.indices
      .map(i => (sources(i), rowTot.getOrElse(sources(i), 0L), (v(i) * 1000 / tot).toLong))
    val got = EventOps.markovStationary(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // a stationary mix: truncation only ever loses mass, never adds
    val mass = got.map(_._3).sum
    assert(mass > 900 && mass <= 1000, s"stationary mass $mass out of range")
  }

  test("diff-in-diff matches a plain-Scala cell recompute") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("tus"),
        expr("CAST(floor(value * 1000) AS BIGINT)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    // arm recompute via the engine's own hash column (the hash itself is
    // spec'd in MixedHashSpec territory; here we pin the cell algebra)
    val arms = spark.read.parquet(s"$dir/events.parquet").select(col("user_id"))
      .distinct()
      .withColumn("t", TextAnalysis.mixedHashOf("ab|", col("user_id")) % 2 === 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cells = ev.filter(_._2 == "purchase").groupBy { case (u, _, t, _) =>
      (arms(u), t >= mid) }
    def n(tr: Boolean, po: Boolean) = cells.getOrElse((tr, po), Array.empty).length.toLong
    def m(tr: Boolean, po: Boolean) = {
      val g = cells((tr, po)); g.map(_._4).sum / g.length }
    val did = (m(true, true) - m(true, false)) - (m(false, true) - m(false, false))
    val r = EventOps.diffInDiff(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n(false, false), n(true, false), n(false, true), n(true, true))))
    assert((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)) ==
      ((m(false, false), m(true, false), m(false, true), m(true, true))))
    assert(r.getLong(8) == did)
    // both arms populated in both periods, else the readout is vacuous
    Seq((false, false), (true, false), (false, true), (true, true))
      .foreach(c => assert(n(c._1, c._2) > 0, s"empty cell $c"))
  }

  test("EWMA backtest matches a BigInt recompute of the dyadic forecast") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val (h0, h1) = (ev.map(_._2).min, ev.map(_._2).max)
    val types = ev.map(_._1).distinct.sorted
    val counts = ev.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expect = types.map { t =>
      val xs = (h0 to h1).map(h => counts.getOrElse((t, h), 0L))
      val nn = xs.indices.map { i =>          // nnum at index i, needs 8 vals
        if (i < 7) None
        else Some((0 to 7).map(j => xs(i - j) * (1L << (7 - j))).sum)
      }
      val scored = xs.indices.flatMap(i =>
        if (i >= 1) nn(i - 1).map(f => xs(i) * 1000L - f * 1000L / 255L) else None)
      val ns = scored.length.toLong
      val es = scored.sum
      val bias = if (es < 0) -((-es) / ns) else es / ns
      (t, ns, scored.map(math.abs).sum / ns, bias, nn.last.get * 1000L / 255L)
    }.toSeq
    val got = EventOps.ewmaBacktest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // the forecaster must actually track the series: MAE under 2x the mean
    // hourly level (in milli), or it is no better than predicting zero
    val level = ev.length.toLong * 1000 / ((h1 - h0 + 1) * types.length)
    got.foreach { case (t, _, mae, _, _) =>
      assert(mae < 2 * level * types.length, s"$t MAE $mae vs level $level") }
  }

  test("RAG chunks match a plain-Scala re-chunking and tile the doc exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val (w, st) = (64, 48)
    val expect = docs.toSeq.sortBy(_._1).flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length
      val nc = if (n <= w) 1 else 1 + (n - w + st - 1) / st
      (0 until nc).map { c =>
        val start = c * st
        val len = math.min(w, n - start)
        (id, c.toLong, n.toLong, start.toLong, len.toLong,
          md5hex(toks.slice(start, start + len).mkString(" ")))
      }
    }
    val got = TextAnalysis.ragChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))).toSeq
    assert(got == expect)
    // tiling: the final chunk always reaches the last token
    got.groupBy(_._1).foreach { case (id, cs) =>
      val last = cs.maxBy(_._2)
      assert(last._4 + last._5 == last._3, s"doc $id not fully tiled")
    }
  }

  test("Poisson bootstrap CI matches a plain-Scala replicate recompute") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def mixed(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      hex.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    }
    def pois(u: Long): Long =
      if (u < 367879) 0 else if (u < 735758) 1 else if (u < 919698) 2
      else if (u < 981011) 3 else if (u < 996340) 4 else if (u < 999405) 5 else 6
    val reps = 40
    val expect = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, ds) =>
      val point = ds.map(_._3).sum * 1000 / ds.length
      val means = (1 to reps).map { r =>
        val ws = ds.map(d => pois(mixed(s"boot|${d._1}|$r") % 1000000L) -> d._3)
        (BigInt(ws.map(p => p._1 * p._2).sum) * 1000 / ws.map(_._1).sum).toLong -> r.toLong
      }.sortBy(identity).map(_._1)
      (src, ds.length.toLong, point, means(1), means(reps - 2), means(reps - 2) - means(1))
    }
    val got = TextAnalysis.bootstrapCi(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got == expect, s"got $got\nwant $expect")
    // the interval must bracket the point estimate on this fixture
    got.foreach { case (src, _, m, lo, hi, _) =>
      assert(lo <= m && m <= hi, s"$src: CI [$lo,$hi] misses point $m") }
  }
}
