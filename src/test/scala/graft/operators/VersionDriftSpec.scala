package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Brute-force gate for the embedding version-drift table: the exact
  * common-denominator shift algebra recomputed with BigInt over collected
  * vectors. */
class VersionDriftSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("per-label centroid shift matches a BigInt brute force") {
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getSeq[Long](2).toArray))
    val byLabel = rows.groupBy(_._2)
    val out = Similarity.versionDrift(spark, dir).collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == byLabel.keySet)
    byLabel.foreach { case (label, vs) =>
      val (v1, v2) = vs.partition(_._1 % 2 == 0)
      val n1 = BigInt(v1.length); val n2 = BigInt(v2.length)
      val d = vs.head._3.length
      val shift = (0 until d).map { i =>
        val s1 = v1.map(v => BigInt(v._3(i))).sum
        val s2 = v2.map(v => BigInt(v._3(i))).sum
        val t = s1 * n2 - s2 * n1
        t * t
      }.sum / (n1 * n2 * n1 * n2)
      assert(out(label) == ((n1.toLong, n2.toLong, shift.toLong)), s"label $label")
    }
    // both cohorts populated and at least one label actually drifted —
    // a zero table would mean the split or the algebra is vacuous
    assert(out.values.forall(v => v._1 > 0 && v._2 > 0))
    assert(out.values.exists(_._3 > 0))
  }
}
