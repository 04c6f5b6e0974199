package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Property gates for the trained NB quality classifier — value-exactness is
  * separately gated by the DuckDB oracles (`quality_classifier_train`,
  * `quality_classifier_confusion`). These pin what the hash can't: the
  * digest's rank discipline, full-corpus scoring coverage, the decision
  * boundary, and the calibration direction (head reads more positive than
  * middle, middle more than tail — the classifier must actually have
  * distilled the LM policy it was trained on).
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("digest: 25 ranked words per side, evidence ordered, sides straddle the boundary") {
    val rows = QualityClassifier.classifierTrain(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(5)))
    assert(rows.length == 50)
    Seq("pos", "neg").foreach { side =>
      val s = rows.filter(_._1 == side).sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to 25L), s"$side ranks")
      val ratios = s.map(_._4)
      if (side == "pos") {
        assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b },
          "pos evidence must be rank-descending")
        assert(ratios.head > 1000000L, "strongest positive word must favor pos")
      } else {
        assert(ratios.zip(ratios.tail).forall { case (a, b) => a <= b },
          "neg evidence must be rank-ascending")
        assert(ratios.head < 1000000L, "strongest negative word must favor neg")
      }
    }
  }

  test("drift: retrained counts are subsets, deltas exact, order by |delta|") {
    val rows = QualityClassifier.classifierDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.length == 20)
    rows.foreach { case (w, cp1, cn1, cp2, cn2, r1, r2, d) =>
      // the keep set is a subset of the v1 training set: counts only shrink
      assert(cp2 <= cp1 && cn2 <= cn1, s"$w: pruned counts grew")
      assert(d == r2 - r1, s"$w: delta not exact")
    }
    val absDeltas = rows.map(r => math.abs(r._8))
    assert(absDeltas.zip(absDeltas.tail).forall { case (a, b) => a >= b },
      "rows not ordered by |delta| descending")
    assert(absDeltas.head > 0L, "pruning 30% of training docs must move some evidence")
  }

  test("confusion: full coverage, boundary-consistent means, calibration direction") {
    val rows = QualityClassifier.classifierConfusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nTokensDocs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(filter(split(col("text"), " "), w => w =!= "")) >= 1)
      .count()
    assert(rows.map(_._3).sum == nTokensDocs, "every tokenized doc is scored exactly once")
    rows.foreach { case (b, p, _, mean) =>
      if (p == "pos") assert(mean > 1000000L, s"$b/pos mean $mean")
      else assert(mean <= 1000000L, s"$b/neg mean $mean")
    }
    // calibration: the positive-prediction share must fall monotonically
    // head -> middle -> tail (the trained model reproduces its teacher's
    // ordering on both the training bands and the held-out middle band)
    def posShare(bucket: String): Double = {
      val in = rows.filter(_._1 == bucket)
      in.filter(_._2 == "pos").map(_._3).sum.toDouble / in.map(_._3).sum
    }
    assert(posShare("head") > posShare("middle"),
      s"head ${posShare("head")} vs middle ${posShare("middle")}")
    assert(posShare("middle") > posShare("tail"),
      s"middle ${posShare("middle")} vs tail ${posShare("tail")}")
  }

  test("auc: matches a brute-force pairwise count per language, better than chance") {
    // independent referee: the labeled (lang, score, is_head) frame, then
    // U counted literally over every (pos, neg) pair — wins 1, ties ½
    // (kept in half-units so everything stays integer)
    val labeled = QualityClassifier.perDocScores(spark, dir)
      .join(TextAnalysis.unigramSurprisal(spark, dir)
        .filter(col("bucket").isin("head", "tail"))
        .select("doc_id", "lang", "bucket"), "doc_id")
      .select("lang", "score_micro", "bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2) == "head"))
    val rows = QualityClassifier.classifierAuc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    rows.foreach { case (lang, nPos, nNeg, u2, auc) =>
      val pos = labeled.filter(t => t._1 == lang && t._3).map(_._2)
      val neg = labeled.filter(t => t._1 == lang && !t._3).map(_._2)
      assert(nPos == pos.length.toLong && nNeg == neg.length.toLong, lang)
      val bruteU2 = (for { p <- pos; n <- neg } yield {
        if (p > n) 2L else if (p == n) 1L else 0L
      }).sum
      assert(u2 == bruteU2, s"$lang: grouped-midrank 2U $u2 != brute-force $bruteU2")
      assert(auc == u2 * 1000000L / (2L * nPos * nNeg), s"$lang: auc not the exact floor")
      assert(auc > 500000L,
        s"$lang: in-sample AUC $auc at/below chance — the fit did not separate its own labels")
    }
    // every language with both label classes is present
    val expected = labeled.groupBy(_._1).filter { case (_, ds) =>
      ds.exists(_._3) && ds.exists(!_._3)
    }.keySet
    assert(rows.map(_._1).toSet == expected)
  }

  test("held-out auc: test-slice coverage exact, scores from the train-only fit") {
    val rows = QualityClassifier.classifierAucHeldout(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "the 10% test bucket must contain labeled docs at sf0.001")
    // per-language counts must be exactly the labeled docs of the hash TEST
    // bucket (label policy frozen at the full-corpus terciles)
    val expected = TextAnalysis.unigramSurprisal(spark, dir)
      .filter(col("bucket").isin("head", "tail"))
      .filter(TextAnalysis.mixedHash("split|") % 100 >= 90)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(when(col("bucket") === "head", 1L).otherwise(0L)).as("np"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (lang, nPos, nNeg, u2, auc) =>
      val (n, np) = expected(lang)
      assert(nPos == np && nPos + nNeg == n, s"$lang: test-slice coverage drift")
      assert(u2 >= 0L && u2 <= 2L * nPos * nNeg, s"$lang: U out of range")
      assert(auc == u2 * 1000000L / (2L * nPos * nNeg), s"$lang: auc not the exact floor")
    }
    // exactly the test-bucket languages with both classes appear
    assert(rows.map(_._1).toSet ==
      expected.filter { case (_, (n, np)) => np > 0 && n > np }.keySet)
  }

  test("binned auc: equals brute-force AUC of the bin-coarsened scores") {
    import QualityClassifier.{CalibrationBinMicro, CalibrationMinBin, CalibrationMaxBin}
    def bin(s: Long): Long =
      math.min(math.max(s / CalibrationBinMicro, CalibrationMinBin), CalibrationMaxBin)
    val labeled = QualityClassifier.perDocScores(spark, dir)
      .join(TextAnalysis.unigramSurprisal(spark, dir)
        .filter(col("bucket").isin("head", "tail"))
        .select("doc_id", "lang", "bucket"), "doc_id")
      .select("lang", "score_micro", "bucket").collect()
      .map(r => (r.getString(0), bin(r.getLong(1)), r.getString(2) == "head"))
    val rows = QualityClassifier.classifierAucBinned(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nPos, nNeg, u2, auc) =>
      val pos = labeled.filter(t => t._1 == lang && t._3).map(_._2)
      val neg = labeled.filter(t => t._1 == lang && !t._3).map(_._2)
      assert(nPos == pos.length.toLong && nNeg == neg.length.toLong, lang)
      val bruteU2 = (for { p <- pos; n <- neg } yield {
        if (p > n) 2L else if (p == n) 1L else 0L
      }).sum
      assert(u2 == bruteU2, s"$lang: binned 2U $u2 != brute-force $bruteU2")
      assert(auc == u2 * 1000000L / (2L * nPos * nNeg), s"$lang: auc not the exact floor")
    }
  }

  test("calibration: bins partition the labeled docs, fractions exact, direction holds") {
    val rows = QualityClassifier.classifierCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val aucRows = QualityClassifier.classifierAuc(spark, dir).collect()
    val nLabeled = aucRows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(rows.map(_._2).sum == nLabeled, "bins must partition the labeled docs")
    rows.foreach { case (lo, n, nPos, posMicro, mean) =>
      assert(lo % QualityClassifier.CalibrationBinMicro == 0)
      assert(nPos >= 0 && nPos <= n)
      assert(posMicro == nPos * 1000000L / n, "pos fraction must be the exact floor")
      // the clamped end bins collect the tails, so the mean can sit outside
      // [lo, lo+width) only there
      if (lo > QualityClassifier.CalibrationBinMicro * QualityClassifier.CalibrationMinBin &&
        lo < QualityClassifier.CalibrationBinMicro * QualityClassifier.CalibrationMaxBin)
        assert(mean >= lo && mean < lo + QualityClassifier.CalibrationBinMicro,
          s"bin $lo mean $mean outside its own range")
    }
    val sorted = rows.sortBy(_._1)
    // direction, robust to small-n end bins: the pooled positive rate of
    // the above-decision bins must beat the pooled rate below
    val (hi, lo) = sorted.partition(_._1 >= QualityClassifier.DecisionMicro)
    def rate(xs: Array[(Long, Long, Long, Long, Long)]): Double =
      xs.map(_._3).sum.toDouble / math.max(1L, xs.map(_._2).sum)
    assert(rate(hi) > rate(lo),
      s"calibration direction inverted: ${rate(hi)} vs ${rate(lo)}")
  }
}
