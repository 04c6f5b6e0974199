package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Property gates for the training-data pipeline operators added in round 6
  * (decontamination, repetition, sequence packing, incremental dedup) —
  * value-exactness is separately gated by their DuckDB oracles.
  */
class TrainPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("decontaminate catches every planted eval paraphrase") {
    val out = TextAnalysis.decontaminate(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < 1000000L, "eval (reference) docs must not appear in the report")
      assert(r.getLong(1) >= 1L)
    }
    // eval set = perturbed copies with id % 97 == 0; their originals are
    // o ≡ (97 - 10⁶ mod 97) ≡ 70 (mod 97) and share all 5-grams past the
    // dropped first word — every such doc with ≥6 words MUST be flagged
    val planted = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 97 === 70 && size(split(col("text"), " ")) >= 6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = out.map(_.getLong(0)).toSet
    assert(planted.subsetOf(flagged),
      s"missed planted contamination: ${(planted -- flagged).take(5)}")
  }

  test("sequence packing tiles each language's token stream exactly") {
    val rows = TextAnalysis.packSequences(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (lang, docs) =>
      val ordered = docs.sortBy(_._2)
      // offsets are the exact prefix sums of token counts, starting at 0
      var expect = 0L
      ordered.foreach { case (_, id, tokens, offset, window) =>
        assert(offset == expect, s"$lang doc $id: offset $offset != prefix sum $expect")
        assert(window == offset / 2048, s"$lang doc $id: window $window")
        expect += tokens
      }
      // windows are non-decreasing and start at 0
      assert(ordered.head._4 == 0L)
      assert(ordered.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
    }
  }

  test("repetition ratio is a valid [0,1] fraction with distinct <= total") {
    val out = TextAnalysis.repetitionRatio(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, d, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n && d >= 1)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(ratio == (n - d).toDouble / n)
    }
  }

  test("incremental dedup drops most incoming docs (each has a planted reference near-dup)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3).count()
    val r = Dedup.dedupIncremental(spark, dir).collect()(0)
    val (incoming, flagged, survivors) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(incoming == docs, s"n_incoming $incoming != $docs banded docs")
    assert(survivors == incoming - flagged)
    // every incoming doc has a perturbed near-dup in the reference corpus;
    // banded MinHash recall on the fixture is >= 90%, so few may survive
    assert(survivors <= (docs * 0.2).toInt,
      s"$survivors of $docs incoming docs survived — LSH collision filter too weak")
  }
}
