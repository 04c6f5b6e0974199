package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class WelfordVarianceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(math.abs(b), 1e-300)

  test("typed Welford aggregator matches built-in avg/var_samp on lineitem quantity") {
    import spark.implicits._
    val qty = spark.read.parquet(s"${SparkSuite.Sf001}/lineitem.parquet")
      .select(col("l_quantity")).as[Double]
    val w = qty.select(WelfordVariance.toColumn).collect()(0)
    val ref = spark.read.parquet(s"${SparkSuite.Sf001}/lineitem.parquet")
      .agg(count(lit(1)), avg("l_quantity"), var_samp("l_quantity")).collect()(0)
    assert(w.n == ref.getLong(0))
    assert(relErr(w.mean, ref.getDouble(1)) < 1e-12)
    assert(relErr(w.var_samp, ref.getDouble(2)) < 1e-9)
  }

  test("merge is partitioning-insensitive within FP tolerance") {
    import spark.implicits._
    val base = spark.read.parquet(s"${SparkSuite.Sf001}/lineitem.parquet")
      .select(col("l_extendedprice")).as[Double]
    val one = base.repartition(1).select(WelfordVariance.toColumn).collect()(0)
    val many = base.repartition(32).select(WelfordVariance.toColumn).collect()(0)
    assert(one.n == many.n)
    assert(relErr(one.mean, many.mean) < 1e-12)
    assert(relErr(one.var_samp, many.var_samp) < 1e-9)
  }

  test("edge cases: empty and single-element inputs") {
    import spark.implicits._
    val empty = spark.emptyDataset[Double].select(WelfordVariance.toColumn).collect()(0)
    assert(empty.n == 0L && empty.var_samp.isNaN)
    val single = Seq(42.0).toDS().select(WelfordVariance.toColumn).collect()(0)
    assert(single.n == 1L && single.mean == 42.0 && single.var_samp.isNaN)
  }
}
