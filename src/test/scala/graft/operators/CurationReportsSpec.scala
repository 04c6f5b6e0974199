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

  test("packing sweep matches a per-length brute force over the token streams") {
    val docs = TextAnalysis.packSequences(spark, dir)
      .select("lang", "tokens", "stream_offset")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val sweep = TextAnalysis.packingSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(sweep.keySet == Set(512L, 1024L, 2048L, 4096L, 8192L))
    val streams = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    sweep.foreach { case (l, (nWin, pad, nStraddle, straddleToks)) =>
      val wins = streams.values.map(t => (t + l - 1) / l).sum
      assert(nWin == wins, s"L=$l n_windows")
      assert(pad == streams.values.map(t => ((t + l - 1) / l) * l - t).sum, s"L=$l tail_pad")
      val straddling = docs.filter { case (_, t, off) => off / l != (off + t - 1) / l }
      assert(nStraddle == straddling.length.toLong, s"L=$l n_docs_straddle")
      assert(straddleToks == straddling.map(_._2).sum, s"L=$l straddle_tokens")
    }
    // the fixture must populate the knob trade-off, or the table is vacuous
    assert(sweep(512L)._3 > sweep(8192L)._3, "straddle count must fall as L rises")
    assert(sweep(512L)._1 > sweep(8192L)._1, "window count must fall as L rises")
  }

  test("audit sample is exactly the k pairs nearest the decision boundary") {
    val pairs = Dedup.ngramJaccardPairs(spark, dir)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = pairs
      .map { case (a, b, j) =>
        val perm = math.floor(j * 1000).toLong
        (math.abs(perm - 500L), a, b, perm)
      }
      .sortBy(t => (t._1, t._2, t._3))
      .take(20)
      .map(t => (t._2, t._3, t._4, t._1)).toSet
    val texts = Dedup.corpusWithNearDups(spark, dir)
      .selectExpr("doc_id", "md5(text) AS h")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val sample = Dedup.auditSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(sample.map(t => (t._1, t._2, t._3, t._4)).toSet == expected)
    sample.foreach { case (a, b, _, _, ma, mb) =>
      assert(ma == texts(a) && mb == texts(b), s"md5 mismatch for pair ($a,$b)")
    }
    assert(sample.length == math.min(20, pairs.length))
    // the sample must actually straddle the cusp band, not sit at J=1
    assert(sample.map(_._4).min < 500L, "no pair anywhere near the boundary")
  }

  test("keep ablation matches a brute force over the manifest flags") {
    val m = TextAnalysis.trainingManifest(spark, dir)
      .select("keep_dedup", "keep_quality", "keep_bucket", "keep_classifier",
        "keep_paragraph")
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    val kept = m.count(t => t._1 && t._2 && t._3 && t._4 && t._5).toLong
    val abl = TextAnalysis.keepAblation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(abl.keySet == Set("dedup", "quality", "bucket", "classifier", "paragraph"))
    type Flags = (Boolean, Boolean, Boolean, Boolean, Boolean)
    def check(rule: String, fails: Flags => Boolean,
        othersPass: Flags => Boolean): Unit = {
      val blocked = m.count(fails).toLong
      val sole = m.count(t => fails(t) && othersPass(t)).toLong
      assert(abl(rule) == ((blocked, sole, kept + sole)), s"rule=$rule")
    }
    check("dedup", !_._1, t => t._2 && t._3 && t._4 && t._5)
    check("quality", !_._2, t => t._1 && t._3 && t._4 && t._5)
    check("bucket", !_._3, t => t._1 && t._2 && t._4 && t._5)
    check("classifier", !_._4, t => t._1 && t._2 && t._3 && t._5)
    check("paragraph", !_._5, t => t._1 && t._2 && t._3 && t._4)
    // every rule must actually block something on the fixture, or the
    // ablation is reporting on a vacuous pipeline
    assert(abl.values.forall(_._1 > 0), "a keep rule blocks nothing")
  }
}
