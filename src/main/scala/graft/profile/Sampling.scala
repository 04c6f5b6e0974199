package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures

/** Sketch/sample-based profiling — the 100 TB path next to the exact,
  * oracle-gated forms ([[ProfileQueries.quantityPercentiles]] /
  * [[ProfileQueries.ndv]]). Not oracle-comparable (sketch internals differ
  * per engine); gated by relative-error specs against the exact answers,
  * like the HLL NDV path.
  */
object Sampling {

  /** Approximate percentiles via Spark's GK quantile summaries
    * (`percentile_approx`): one pass, mergeable partial sketches, error
    * bounded by 1/accuracy — the form that replaces the exact sort-based
    * percentile when a column no longer fits a single pass buffer. */
  def approxPercentiles(spark: SparkSession, dir: String, tableName: String,
      column: String, accuracy: Int = 10000): DataFrame =
    Fixtures.table(spark, dir, tableName)
      .agg(
        expr(s"percentile_approx($column, 0.25, $accuracy)").as("q25"),
        expr(s"percentile_approx($column, 0.5, $accuracy)").as("q50"),
        expr(s"percentile_approx($column, 0.75, $accuracy)").as("q75"))

  /** Fixed-size uniform sample without replacement: top-k by a seeded
    * random key. Spark plans `orderBy(rand).limit(k)` as TakeOrdered —
    * per-partition top-k then a k-row driver merge, NO full sort and no
    * full shuffle — which makes this the distributed reservoir sample
    * (identical distribution: every row's rank is an iid uniform draw).
    * Deterministic for a fixed seed AND fixed partitioning (rand(seed)
    * is seeded per partition index). */
  def reservoirSample(df: DataFrame, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__rk", rand(seed))
      .orderBy(col("__rk"))
      .limit(k)
      .drop("__rk")
}
