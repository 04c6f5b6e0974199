package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.Dedup

class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("group signature is partitioning-invariant (mergeable sketch property)") {
    def sigs(parts: Int): Map[String, Seq[String]] = {
      val ex = spark.read.parquet(s"$dir/documents.parquet")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("lang"), explode(Dedup.shingles(col("text"))).as("shingle"))
        .repartition(parts)
      ex.groupBy("lang").agg(MinHashAgg.minhash_agg(col("shingle"), 8).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    }
    val one = sigs(1)
    val many = sigs(17)
    assert(one == many)
    assert(one.keySet == Set("de", "en", "es", "fr", "zh"))
    assert(one.values.forall(s => s.length == 8 && s.forall(_.matches("[0-9a-f]{32}"))))
  }

  test("aggregate signature equals the array-expression signature on a single-doc group") {
    val doc = spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") === 7)
    val viaAgg = doc
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("shingle"))
      .groupBy("doc_id").agg(MinHashAgg.minhash_agg(col("shingle"), 8).as("sig"))
      .collect()(0).getSeq[String](1).toSeq
    val viaExpr = doc
      .select(VectorExpressions.minhash_sig(Dedup.shingles(col("text")), 8).as("sig"))
      .collect()(0).getSeq[String](0).toSeq
    assert(viaAgg == viaExpr)
  }

  test("null inputs are ignored; all-null group yields null signature") {
    val df = spark.sql(
      "SELECT * FROM VALUES (1, 'abc'), (1, NULL), (2, CAST(NULL AS STRING)) AS t(g, s)")
    val rows = df.groupBy("g").agg(MinHashAgg.minhash_agg(col("s"), 4).as("sig"))
      .orderBy("g").collect()
    assert(!rows(0).isNullAt(1) && rows(0).getSeq[String](1).length == 4)
    assert(rows(1).isNullAt(1))
  }
}
