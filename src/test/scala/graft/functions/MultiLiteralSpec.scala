package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Aho-Corasick correctness: the automaton must agree with naive
  * `String.contains` on EVERY (text, pattern) pair — property-tested over
  * a 3-letter alphabet so overlapping, nested, and shared-prefix/suffix
  * patterns (the cases where fail links actually fire) occur constantly.
  */
class MultiLiteralSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("property: automaton == naive contains on 500 random small-alphabet cases") {
    val rnd = new scala.util.Random(4242)
    def randStr(maxLen: Int, minLen: Int = 0): String = {
      val n = minLen + rnd.nextInt(maxLen - minLen + 1)
      Seq.fill(n)("abc" (rnd.nextInt(3))).mkString
    }
    (1 to 500).foreach { _ =>
      val text = randStr(12)
      val pats = Seq.fill(1 + rnd.nextInt(6))(randStr(5, minLen = 1)).distinct
      val ac = new MultiLiteral.AcAutomaton(pats)
      val got = ac.matchedIds(text).toSet
      val want = pats.zipWithIndex.collect {
        case (p, i) if text.contains(p) => i
      }.toSet
      assert(got == want, s"text='$text' pats=$pats got=$got want=$want")
    }
  }

  test("overlapping and nested patterns all fire: classic he/she/his/hers") {
    val ac = new MultiLiteral.AcAutomaton(Seq("he", "she", "his", "hers"))
    assert(ac.matchedIds("ushers").toSet == Set(0, 1, 3)) // she, he, hers
    assert(ac.matchedIds("history").toSet == Set(2))      // his
    assert(ac.matchedIds("xyz").isEmpty)
    assert(ac.matchedIds("").isEmpty)
  }

  test("ids are distinct and ascending; repeats counted once") {
    val ac = new MultiLiteral.AcAutomaton(Seq("aa", "b"))
    val ids = ac.matchedIds("aaaabbb")
    assert(ids.toSeq == Seq(0, 1))
  }

  test("expression matches a contains()-disjunction query and stays codegen'd") {
    import spark.implicits._
    val pats = Seq("fast fast", "query table", "no such phrase zz")
    val docs = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
    val viaExpr = docs.select(col("doc_id"),
        explode(MultiLiteral.multi_literal_matches(col("text"), pats)).as("pid"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val viaContains = pats.zipWithIndex.map { case (p, i) =>
      docs.filter(col("text").contains(p))
        .select(col("doc_id"), lit(i).as("pid"))
    }.reduce(_ unionAll _).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(viaExpr == viaContains)
    assert(viaExpr.nonEmpty, "degenerate fixture: no phrase hits")
    // null input → null (not empty array)
    val nulls = Seq((1L, null: String), (2L, "fast fast")).toDF("id", "t")
      .select(col("id"), MultiLiteral.multi_literal_matches(col("t"), pats).as("m"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(nulls(1L) && !nulls(2L))
  }
}
