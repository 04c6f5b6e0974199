package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile.ProfileQueries

/** Semantic invariants for the round-9 statistics operators (exact-value
  * parity is driver-gated vs DuckDB; these pin the properties the numbers
  * must satisfy regardless of fixtures).
  */
class RobustStatsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("gini: in (0,1) on fixtures; 0 for constant; (n-1)/n for one-holder") {
    val row = ProfileQueries.giniProfile(spark, SparkSuite.Sf0001).collect().head
    val g = row.getAs[Double]("gini")
    assert(g > 0.0 && g < 1.0, s"gini=$g")
    assert(row.getAs[Long]("n_rows") ==
      spark.read.parquet(s"${SparkSuite.Sf0001}/lineitem.parquet").count())
    import spark.implicits._
    // perfect equality → G = 0
    val gConst = ProfileQueries.giniOf(Seq.fill(10)(42.0).toDF("v"), "v")
      .collect().head.getAs[Double]("gini")
    assert(gConst == 0.0, s"constant gini=$gConst")
    // one holder owns everything → G = (n−1)/n
    val gOne = ProfileQueries.giniOf((Seq.fill(9)(0.0) :+ 90.0).toDF("v"), "v")
      .collect().head.getAs[Double]("gini")
    assert(math.abs(gOne - 0.9) < 1e-12, s"one-holder gini=$gOne")
  }

  test("benford: digits 1-9 only, permille sums to ~1000") {
    val rows = ProfileQueries.benfordProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.map(_.getAs[Int]("digit")).forall(d => d >= 1 && d <= 9))
    val permilleSum = rows.map(_.getAs[Double]("permille")).sum
    assert(math.abs(permilleSum - 1000.0) < 1.0, s"sum=$permilleSum")
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet")
      .filter(col("o_totalprice") > 0).count())
  }

  test("robust anomalies: every flagged event clears the 3.5 robust-z cut") {
    val rows = EventOps.robustAnomalies(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty, "no anomalies flagged at sf0.001")
    // the integer-space cut 20000·ad2 > 51891·mad4 is exactly |z| > 3.5
    assert(rows.forall(r => math.abs(r.getAs[Double]("robust_z")) > 3.5))
  }

  test("pps sample: deterministic and size-biased toward long documents") {
    val s1 = TextAnalysis.ppsSample(spark, SparkSuite.Sf0001).collect()
    val s2 = TextAnalysis.ppsSample(spark, SparkSuite.Sf0001).collect()
    assert(s1.map(_.getAs[Long]("doc_id")).toSeq == s2.map(_.getAs[Long]("doc_id")).toSeq,
      "PPS sample is not reproducible")
    assert(s1.length == 100)
    val sampleMean = s1.map(_.getAs[Long]("n_chars")).sum.toDouble / s1.length
    val corpusMean = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .agg(avg("n_chars")).collect().head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"PPS sample mean $sampleMean not above corpus mean $corpusMean")
  }
}
