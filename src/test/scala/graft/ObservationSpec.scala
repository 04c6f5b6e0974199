package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `df.observe` metrics: per-job row/aggregate counters collected DURING a
  * real action — no second scan, no extra job. This is the reconciliation
  * instrumentation a production pipeline attaches to every stage boundary
  * (rows in/out, null rates) and the batch-side sibling of the streaming
  * quality monitor. */
class ObservationSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("observed metrics ride the job and match a direct aggregation") {
    val obs = Observation("lineitem_metrics")
    val df = spark.read.parquet(s"${SparkSuite.Sf0001}/lineitem.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
        min("l_quantity").as("min_qty"),
        max("l_quantity").as("max_qty"))
      .filter(col("l_quantity") > 0) // metrics observe PRE-filter rows
    val kept = df.count()
    val m = obs.get
    val direct = spark.read.parquet(s"${SparkSuite.Sf0001}/lineitem.parquet")
      .agg(count(lit(1)), min("l_quantity"), max("l_quantity")).collect()(0)
    assert(m("n_rows") == direct.getLong(0))
    assert(m("null_qty") == 0L)
    assert(m("min_qty") == direct.getDouble(1))
    assert(m("max_qty") == direct.getDouble(2))
    assert(kept <= direct.getLong(0))
  }

  test("observation placement separates input rows from surviving rows") {
    val before = Observation("before_filter")
    val after = Observation("after_filter")
    val df = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet")
      .observe(before, count(lit(1)).as("n"))
      .filter(col("o_totalprice") > 100000.0)
      .observe(after, count(lit(1)).as("n"))
    df.count()
    val nIn = before.get("n").asInstanceOf[Long]
    val nOut = after.get("n").asInstanceOf[Long]
    assert(nIn == 1500L)
    assert(nOut < nIn && nOut > 0)
  }
}
