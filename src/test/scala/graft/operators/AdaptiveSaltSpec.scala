package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class AdaptiveSaltSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  /** 100k rows of key 0 + 10k uniform rows over keys 1-99: key 0 holds ~91%
    * of the data — the classic one-hot-key skew. */
  private lazy val skewed = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
    .unionAll(spark.range(10000).select((col("id") % 99 + 1).as("k"), col("id").as("v")))

  private lazy val dim = spark.range(100).select(col("id").as("dk"), concat(lit("name_"), col("id")).as("name"))

  test("chooseSalts detects the hot key and scales the salt count") {
    val n = AdaptiveSalt.chooseSalts(skewed, "k")
    // hot key holds ~91% of rows; fair share is 1/parallelism — expect a
    // salt count well above 1 (exact value depends on parallelism/clamp)
    assert(n > 4, s"expected aggressive salting for 91% skew, got $n")
  }

  test("chooseSalts returns 1 for uniform keys") {
    val uniform = spark.range(100000).select((col("id") % 1000).as("k"), col("id").as("v"))
    assert(AdaptiveSalt.chooseSalts(uniform, "k") == 1)
  }

  test("auto-salted join equals the plain join on skewed data") {
    val (salted, n) = AdaptiveSalt.join(skewed, dim, "k", "dk")
    assert(n > 1)
    val plainAgg = skewed.join(dim, col("k") === col("dk"))
      .groupBy("k", "name").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val saltedAgg = salted
      .groupBy("k", "name").agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(saltedAgg == plainAgg)
  }

  test("auto-salted join equals the plain join when unsalted (uniform path)") {
    val uniform = spark.range(10000).select((col("id") % 100).as("k"), col("id").as("v"))
    val (joined, n) = AdaptiveSalt.join(uniform, dim, "k", "dk")
    assert(n == 1)
    assert(joined.count() == uniform.join(dim, col("k") === col("dk")).count())
  }

  test("same-named join keys work on both the salted and unsalted paths") {
    // the common FK-join spelling: both sides call the key "k"
    val dimK = dim.select(col("dk").as("k"), col("name"))
    val (salted, n) = AdaptiveSalt.join(skewed, dimK, "k", "k")
    assert(n > 1)
    assert(salted.count() == skewed.join(dim, col("k") === col("dk")).count())
    val uniform = spark.range(10000).select((col("id") % 100).as("k"), col("id").as("v"))
    val (plain, n1) = AdaptiveSalt.join(uniform, dimK, "k", "k")
    assert(n1 == 1)
    assert(plain.count() == uniform.join(dim, col("k") === col("dk")).count())
  }
}
