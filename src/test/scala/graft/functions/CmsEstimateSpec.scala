package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.Similarity
import graft.profile.ProfileQueries

/** Count-Min estimate expression + matryoshka overlap invariants. */
class CmsEstimateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("cms estimate: exact on a small planted multiset (wide sketch, few keys)") {
    import spark.implicits._
    val df = (Seq.fill(70)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")).toDF("v")
    val sk = df.agg(
      expr("count_min_sketch(v, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"))
    val est = Seq("a", "b", "c").toDF("v")
      .crossJoin(broadcast(sk))
      .withColumn("est", Cms.estimate(col("sk"), col("v")))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    // eps=0.001 over n=100 -> additive slack < 1, so estimates are exact
    assert(est == Map("a" -> 70L, "b" -> 25L, "c" -> 5L))
  }

  test("cms gate: both guarantee booleans hold for every event type") {
    val rows = ProfileQueries.cmsGate(spark, SparkSuite.Sf0001).collect()
    assert(rows.length >= 2)
    assert(rows.forall(_.getAs[Boolean]("never_underestimates")))
    assert(rows.forall(_.getAs[Boolean]("within_eps")))
  }

  test("matryoshka overlap: bounded by k and self-overlap sanity") {
    val rows = Similarity.matryoshkaOverlap(spark, SparkSuite.Sf0001, numQueries = 5, k = 5)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val o = r.getAs[Long]("n_overlap")
      assert(o >= 0 && o <= r.getAs[Long]("k"))
    }
  }
}
