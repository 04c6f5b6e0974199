package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Brute-force recompute of the filter-agreement matrix from the four
  * already-gated keep columns, including Cohen's kappa as the exact
  * rational the query's IEEE quotient must equal.
  */
class FilterAgreementSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("pairwise confusion counts and kappa match a driver-side brute force") {
    // java.lang.Boolean to keep NULL keeps (gopher's word_chars guard) honest
    def flags(df: org.apache.spark.sql.DataFrame, keepCol: String): Map[Long, Option[Boolean]] =
      df.select(col("doc_id"), col(keepCol)).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    val byName = Map(
      "gopher" -> flags(TextAnalysis.gopherRules(spark, dir), "keep"),
      "quality" -> flags(TextAnalysis.qualityScores(spark, dir), "passes_quality"),
      "ccnet" -> TextAnalysis.unigramSurprisal(spark, dir)
        .select(col("doc_id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1) != "tail")).toMap,
      "prune" -> flags(TextAnalysis.qualityPrune(spark, dir), "keep"),
      "nbc" -> QualityClassifier.perDocScores(spark, dir)
        .select(col("doc_id"), (col("score_micro") > QualityClassifier.DecisionMicro).as("nbc")).collect()
        .map(r => r.getLong(0) -> Option(r.getBoolean(1))).toMap)
    val ids = byName("quality").keySet
    assert(byName.values.forall(_.keySet == ids))

    val got = TextAnalysis.filterAgreement(spark, dir).collect()
    assert(got.length == 10)
    got.foreach { r =>
      val a = byName(r.getString(0)); val b = byName(r.getString(1))
      val n = ids.size.toLong
      def cnt(p: (Option[Boolean], Option[Boolean]) => Boolean): Long =
        ids.count(id => p(a(id), b(id))).toLong
      val bk = cnt((x, y) => x.contains(true) && y.contains(true))
      val bd = cnt((x, y) => x.contains(false) && y.contains(false))
      val oa = cnt((x, y) => x.contains(true) && y.contains(false))
      val ob = cnt((x, y) => x.contains(false) && y.contains(true))
      assert(r.getLong(2) == n && r.getLong(3) == bk && r.getLong(4) == bd &&
        r.getLong(5) == oa && r.getLong(6) == ob,
        s"counts mismatch for ${r.getString(0)}/${r.getString(1)}")
      assert(r.getLong(7) == (1000L * (bk + bd) + n / 2) / n)
      val e = (bk + oa) * (bk + ob) + (bd + ob) * (bd + oa)
      if (n * n == e) assert(r.isNullAt(8))
      else assert(r.getDouble(8) == (n * (bk + bd) - e).toDouble / (n * n - e).toDouble)
    }
    // the matrix must actually discriminate: not all pairs identical
    val kappas = got.filterNot(_.isNullAt(8)).map(_.getDouble(8))
    assert(kappas.distinct.length > 1, "all kappas identical — the filters aren't being compared")
  }
}
