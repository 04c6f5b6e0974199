package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile.ProfileQueries

/** Invariants for Theil-Sen, seasonal spikes, join skew, log2 histogram. */
class RobustTrendSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("theil-sen: pair counts are C(hours,2); slope finite") {
    val rows = EventOps.theilSenSlopes(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val hourly = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .distinct().groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = hourly(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
      assert(!r.getAs[Double]("ts_slope_milli").isNaN)
    }
  }

  test("seasonal spikes: all deviations positive, sorted desc, y above expectation") {
    val rows = EventOps.seasonalSpikes(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val devs = rows.map(_.getAs[Long]("dev_permille"))
    assert(devs.forall(_ > 0))
    assert(devs.zip(devs.tail).forall { case (a, b) => a >= b })
    rows.foreach(r =>
      assert(r.getAs[Long]("y") * 1000 > r.getAs[Long]("expected_milli")))
  }

  test("join skew: uniform-ish synthetic key scores ~1000, hub key scores high") {
    val rows = ProfileQueries.joinSkewProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("skew_ratio_milli") >= 1000 - 1) // max >= mean
      assert(r.getAs[Long]("top_share_permille") * r.getAs[Long]("ndv") >= 999)
    }
    import spark.implicits._
    val hub = (Seq.fill(90)(1L) ++ (2L to 11L)).toDF("k")
    val skew = ProfileQueries.joinSkewProfile(spark, SparkSuite.Sf0001)
    // core formula check on a planted hub via the same aggregates
    val c = hub.groupBy("k").count().agg(max("count"), sum("count"), count(lit(1)))
      .collect().head
    assert(c.getLong(0) * c.getLong(2) * 1000 / c.getLong(1) == 9900)
    assert(skew.columns.contains("skew_ratio_milli"))
  }

  test("weekend rank test: U2 matches a brute-force midrank computation") {
    val rows = EventOps.weekendRankTest(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val hourly = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .groupBy("event_type", "h").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val pts = hourly.filter(_._1 == t)
        .map { case (_, h, y) => (y, ((h / 24) + 4) % 7 >= 5) }
      val sorted = pts.map(_._1).sorted
      def midrank2(y: Long): Long = {
        val below = sorted.count(_ < y); val eq = sorted.count(_ == y)
        2L * below + eq + 1
      }
      val nWe = pts.count(_._2).toLong
      val u2 = pts.filter(_._2).map(p => midrank2(p._1)).sum - nWe * (nWe + 1)
      assert(r.getAs[Long]("u2") == u2, s"$t: ${r.getAs[Long]("u2")} vs $u2")
      assert(r.getAs[Long]("n_we") == nWe)
      // U bounded by its range [0, n_wd * n_we] (x2 scaling on both)
      assert(u2 >= 0 && u2 <= 2 * r.getAs[Long]("u2_null"))
    }
  }

  test("session gap sweep: 30-min point equals the sessionizer's total; monotone") {
    val rows = EventOps.sessionGapSweep(spark, SparkSuite.Sf0001).collect()
      .map(r => r.getAs[Long]("gap_minutes") -> r.getAs[Long]("n_sessions")).toMap
    val fromSessionizer = EventOps.sessionize(spark, SparkSuite.Sf0001)
      .agg(sum("n_sessions")).collect().head.getLong(0)
    assert(rows(30L) == fromSessionizer,
      s"identity broken: sweep=${rows(30L)} sessionizer=$fromSessionizer")
    // larger gap merges sessions: counts non-increasing in the threshold
    val ordered = rows.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
  }

  test("wavelet energy: matches a brute-force Haar transform per type") {
    val rows = EventOps.waveletEnergy(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("energy") >= 0))
    val hourly = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .select(col("event_type"),
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .groupBy("event_type", "h").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type"); val blk = r.getAs[Long]("scale_hours")
      val half = blk / 2
      val want = hourly.filter(_._1 == t).groupBy(_._2 / blk).values.map { g =>
        val d = g.map { case (_, h, y) => if ((h / half) % 2 == 0) y else -y }.sum
        d * d
      }.sum
      assert(r.getAs[Long]("energy") == want, s"$t scale $blk")
    }
  }

  test("lateness profile: buckets partition events; tail below the 120s delay bound") {
    val rows = EventOps.latenessProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.map(_.getAs[Long]("cnt")).sum ==
      spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet").count())
    // simulated delay is < 120s, so reordering can never exceed it
    assert(rows.map(_.getAs[Long]("max_late_us")).max < 120000000L)
    rows.foreach { r =>
      val b = r.getAs[Long]("late_bucket")
      val m = r.getAs[Long]("max_late_us") / 1000000 + 1
      // bucket = binary length of (late_s + 1)
      assert(java.lang.Long.toBinaryString(m).length.toLong == b)
    }
  }

  test("vocab growth: checkpoints are powers of two; both series monotone") {
    val rows = TextAnalysis.vocabGrowth(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val docs = rows.map(_.getAs[Long]("docs_seen"))
    assert(docs.forall(d => (d & (d - 1)) == 0))
    val vocab = rows.map(_.getAs[Long]("cum_vocab"))
    val toks = rows.map(_.getAs[Long]("cum_tokens"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a < b })
    // sub-linear growth: vocab can never outpace tokens
    rows.foreach(r => assert(r.getAs[Long]("cum_vocab") <= r.getAs[Long]("cum_tokens")))
  }

  test("cusum: alarms exceed the threshold; a planted sustained shift fires") {
    val rows = EventOps.cusumAlarms(spark, SparkSuite.Sf0001).collect()
    rows.foreach(r =>
      assert(r.getAs[Long]("s_scaled") > r.getAs[Long]("threshold_scaled")))
    // closed form equals the recursion on a hand-computed series:
    // S_t = max(0, S_(t-1) + y_t - 1.5*mean); mean of (2,2,2,8,8) = 4.4
    val ys = Seq(2L, 2L, 2L, 8L, 8L)
    val n = ys.size; val total = ys.sum
    var s = 0L // scaled by 2n: d_i = 2n*y_i - 3*total
    val rec = ys.map { y => s = math.max(0L, s + 2 * n * y - 3 * total); s }
    var cum = 0L; var runmin = 0L
    val closed = ys.map { y =>
      cum += 2 * n * y - 3 * total; runmin = math.min(runmin, cum); cum - runmin
    }
    assert(rec == closed, s"closed form $closed != recursion $rec")
  }

  test("quantile normalize: endpoints hit global min/max; monotone per source") {
    val rows = TextAnalysis.quantileNormalize(spark, SparkSuite.Sf0001).collect()
    val docs = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .select("n_chars").collect().map(_.getLong(0))
    assert(rows.length == docs.length)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.values.foreach { g =>
      val sorted = g.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      // rank matching: lowest doc -> global min, highest -> global max
      assert(sorted.head.getAs[Long]("norm_chars") == docs.min)
      assert(sorted.last.getAs[Long]("norm_chars") == docs.max)
      val norms = sorted.map(_.getAs[Long]("norm_chars"))
      assert(norms.zip(norms.tail).forall { case (a, b) => a <= b }, "not monotone")
    }
  }

  test("cross-correlation: r in [-1,1]; self-correlation at lag 0 is exactly 1") {
    val rows = EventOps.crossCorrelation(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("r")
      assert(v >= -1.0000001 && v <= 1.0000001, s"r=$v out of range")
    }
    rows.filter(r => r.getAs[String]("type_a") == r.getAs[String]("type_b") &&
        r.getAs[Int]("lag") == 0)
      .foreach(r => assert(math.abs(r.getAs[Double]("r") - 1.0) < 1e-12))
  }

  test("catalog strings: every branch row reconciles with its table") {
    val rows = graft.profile.ProfileQueries.catalogStringProfile(spark, SparkSuite.Sf0001)
      .collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"))
      assert(r.getAs[String]("min_val") <= r.getAs[String]("max_val"))
    }
  }

  test("conformance: partitions all purchases; permille from the exact ratio") {
    val r = EventOps.purchaseConformance(spark, SparkSuite.Sf0001).collect().head
    val purchases = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(r.getAs[Long]("n_purchases") == purchases)
    assert(r.getAs[Long]("n_conforming") + r.getAs[Long]("n_violations") == purchases)
    assert(r.getAs[Long]("violation_permille") ==
      r.getAs[Long]("n_violations") * 1000 / purchases)
  }

  test("log2 histogram: buckets partition rows; lo/hi inside [2^(b-1), 2^b)") {
    val rows = ProfileQueries.log2Histogram(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .filter(col("n_chars") >= 1).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("lo") >= (1L << (b - 1)) &&
        r.getAs[Long]("hi") < (1L << b))
    }
  }
}
