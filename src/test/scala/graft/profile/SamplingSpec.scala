package graft.profile

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("approx percentiles land within 1% of exact on lineitem quantity") {
    val approx = Sampling.approxPercentiles(spark, SparkSuite.Sf001, "lineitem", "l_quantity")
      .collect()(0)
    val exact = ProfileQueries.quantityPercentiles(spark, SparkSuite.Sf001)
      .collect()(0)
    // exact row: (q25, q50, q75, q0, q100); l_quantity spans 1..50
    val span = exact.getDouble(4) - exact.getDouble(3)
    Seq(0, 1, 2).foreach { i =>
      val a = approx.getDouble(i)
      val e = exact.getDouble(i)
      assert(math.abs(a - e) <= 0.01 * span, s"p${i}: approx=$a exact=$e")
    }
  }

  test("reservoir sample: exact size, subset of source, deterministic per seed") {
    val docs = spark.read.parquet(s"${SparkSuite.Sf001}/documents.parquet")
    val s1 = Sampling.reservoirSample(docs, 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.reservoirSample(docs, 100).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 100)
    assert(s1 == s2, "same seed must give the same sample")
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s1.subsetOf(all))
    val s3 = Sampling.reservoirSample(docs, 100, seed = 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 != s3, "different seed should give a different sample")
  }

  test("reservoir sample is unbiased enough: sampled id mean near population mean") {
    val docs = spark.read.parquet(s"${SparkSuite.Sf001}/documents.parquet")
    // population ids are 0..499 → mean 249.5, sd≈144; a 200-sample mean has
    // se ≈ 144/sqrt(200) ≈ 10 — allow 4 se
    val m = Sampling.reservoirSample(docs, 200, seed = 3L)
      .agg(avg("doc_id")).collect()(0).getDouble(0)
    assert(math.abs(m - 249.5) < 40, s"sample mean $m too far from 249.5")
  }
}
