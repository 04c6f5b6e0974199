package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Brute-force gates for the round-11 curation tuning tables. The DuckDB
  * oracles pin cross-engine value equality; these specs pin the SEMANTICS
  * against naive recomputations an auditor would trust.
  */
class CurationReportsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("threshold sweep matches a per-threshold brute force over the pair graph") {
    val sweep = Dedup.thresholdSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sweep.keySet == Set(500L, 600L, 700L, 800L, 900L, 1000L))
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    sweep.foreach { case (t, (nPairs, nDocs, maxDeg)) =>
      val surviving = pairs.filter(_._3 * 1000.0 >= t.toDouble)
      assert(nPairs == surviving.length, s"t=$t n_pairs")
      val docs = surviving.flatMap(p => Seq(p._1, p._2))
      assert(nDocs == docs.distinct.length, s"t=$t n_docs_linked")
      val deg = if (docs.isEmpty) 0L else docs.groupBy(identity).values.map(_.length).max.toLong
      assert(maxDeg == deg, s"t=$t max_degree")
    }
    // monotone in t, and the fixture's planted near-dups populate the range
    val ts = Seq(500L, 600L, 700L, 800L, 900L, 1000L)
    ts.sliding(2).foreach { case Seq(a, b) =>
      assert(sweep(a)._1 >= sweep(b)._1, "pair count must fall as t rises")
    }
    assert(sweep(500L)._1 > 0, "planted near-dups missing from the sweep")
  }

  test("keep ablation matches a brute force over the manifest flags") {
    val m = TextAnalysis.trainingManifest(spark, dir)
      .select("keep_dedup", "keep_quality", "keep_bucket")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    val kept = m.count(t => t._1 && t._2 && t._3).toLong
    val abl = TextAnalysis.keepAblation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(abl.keySet == Set("dedup", "quality", "bucket"))
    def check(rule: String, fails: ((Boolean, Boolean, Boolean)) => Boolean,
        othersPass: ((Boolean, Boolean, Boolean)) => Boolean): Unit = {
      val blocked = m.count(fails).toLong
      val sole = m.count(t => fails(t) && othersPass(t)).toLong
      assert(abl(rule) == ((blocked, sole, kept + sole)), s"rule=$rule")
    }
    check("dedup", !_._1, t => t._2 && t._3)
    check("quality", !_._2, t => t._1 && t._3)
    check("bucket", !_._3, t => t._1 && t._2)
    // every rule must actually block something on the fixture, or the
    // ablation is reporting on a vacuous pipeline
    assert(abl.values.forall(_._1 > 0), "a keep rule blocks nothing")
  }
}
