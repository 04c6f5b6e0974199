package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Edge-case gates for [[TextAnalysis.gopherRules]] — fixture-value
  * exactness is separately gated by the DuckDB oracle
  * (`docs_gopher_rules`), which never sees degenerate documents, so the
  * degenerate rows are pinned here on a planted corpus. */
class GopherRulesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private lazy val edgeDir: String = {
    val tmp = Files.createTempDirectory("graft_gopher").toString
    import spark.implicits._
    Seq(
      (0L, "", "en", "edge", 0L),                    // empty text
      (1L, "   ", "en", "edge", 3L),                 // whitespace-only: words are all ''
      (2L, "word", "en", "edge", 4L),                // single word, no bigrams
      (3L, Seq.fill(60)("spark").mkString(" "), "en", "edge", 60L * 6 - 1), // max repetition
      (4L, (1 to 60).map(i => s"word$i").mkString(" "), "en", "edge", 0L)   // all distinct
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("degenerate docs don't throw under ANSI and flag as DuckDB would") {
    val rows = TextAnalysis.gopherRules(spark, edgeDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 5)
    // empty + whitespace-only: word_chars = 0 → fracs NULL (DuckDB x/0),
    // keep resolves FALSE through the failing word-count band, not NULL
    Seq(0L, 1L).foreach { id =>
      val r = rows(id)
      assert(r.isNullAt(r.fieldIndex("top_unigram_char_frac")), s"doc $id")
      assert(r.isNullAt(r.fieldIndex("top_bigram_char_frac")), s"doc $id")
      assert(!r.getBoolean(r.fieldIndex("words_ok")), s"doc $id")
      assert(!r.getBoolean(r.fieldIndex("keep")), s"doc $id")
    }
    // single word: no bigrams → bigram frac coalesces to 0, unigram covers
    // all chars (frac 1.0) — fails repetition, fails the word band
    val single = rows(2L)
    assert(single.getDouble(single.fieldIndex("top_unigram_char_frac")) == 1.0)
    assert(single.getDouble(single.fieldIndex("top_bigram_char_frac")) == 0.0)
    assert(!single.getBoolean(single.fieldIndex("keep")))
    // 60x the same word: in-band length/words but maximal repetition —
    // exactly what the Gopher repetition rules exist to drop
    val rep = rows(3L)
    assert(rep.getBoolean(rep.fieldIndex("words_ok")))
    assert(rep.getDouble(rep.fieldIndex("top_unigram_char_frac")) == 1.0)
    assert(!rep.getBoolean(rep.fieldIndex("unigram_ok")))
    assert(!rep.getBoolean(rep.fieldIndex("keep")))
    // 60 distinct words: passes every rule
    val ok = rows(4L)
    assert(ok.getBoolean(ok.fieldIndex("keep")), s"distinct-word doc should keep: $ok")
  }
}
