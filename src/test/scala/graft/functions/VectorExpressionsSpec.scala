package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.{Similarity, TextAnalysis}

/** The native expressions must be BIT-IDENTICAL to their built-ins-only
  * (HOF) twins — that equivalence is what carries DuckDB-oracle parity over
  * to the codegen'd fast path.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("native vec_dot is bit-identical to the HOF fold on real embeddings") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val pairs = a.join(b, col("idb") === col("ida") + 1)
    val diffs = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("native"),
      Similarity.dotHof(col("va"), col("vb")).as("hof"))
      .filter(col("native") =!= col("hof")) // exact double comparison
      .count()
    assert(diffs == 0L)
  }

  test("native vec_dot self-dot equals HOF norm² on every vector") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val diffs = e.select(
      Similarity.dot(col("embedding"), col("embedding")).as("native"),
      Similarity.dotHof(col("embedding"), col("embedding")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0L)
  }

  test("native rolling_hash equals HOF rolling hash on all document texts") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val diffs = d.select(
      TextAnalysis.rollingHash(col("text")).as("native"),
      TextAnalysis.rollingHashHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0L)
    // and on words (the simhash path)
    val wdiffs = d.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .select(
        TextAnalysis.rollingHash(col("w")).as("native"),
        TextAnalysis.rollingHashHof(col("w")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(wdiffs == 0L)
  }

  test("native minhash signature equals the HOF minima on real shingles") {
    import graft.operators.Dedup
    val docs = Dedup.corpusWithNearDups(spark, dir)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("sh", Dedup.shingles(col("text")))
    val nHashes = 8
    val native = docs.select(col("doc_id"),
      VectorExpressions.minhash_sig(col("sh"), nHashes).as("sig"))
    val hofCols = (0 until nHashes).map(i => Dedup.minhashHof(col("sh"), i).as(s"h$i"))
    val hof = docs.select(col("doc_id") +: hofCols: _*)
    val joined = native.join(hof, "doc_id")
    val mismatches = (0 until nHashes).map(i =>
      joined.filter(element_at(col("sig"), i + 1) =!= col(s"h$i")).count()).sum
    assert(mismatches == 0L)
  }

  test("null handling: null input → null out") {
    val df = spark.sql("SELECT CAST(NULL AS STRING) AS s, CAST(NULL AS ARRAY<FLOAT>) AS v")
    val r = df.select(
      TextAnalysis.rollingHash(col("s")).as("h"),
      Similarity.dot(col("v"), col("v")).as("d")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
