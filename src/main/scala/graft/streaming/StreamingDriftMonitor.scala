package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DISTRIBUTION-DRIFT monitor — the continuous twin of the batch
  * chi-square mix test (`EventOps.driftChisq`): each tumbling window's
  * event-type histogram is scored against a REFERENCE mix (the shares a
  * healthy pipeline produces), emitting the window's Pearson χ² statistic.
  * An alert is a filter on the sink (`chi2 > critical`), exactly like the
  * rule monitor.
  *
  * Shape: ONE windowed aggregate — one `sum(type == t)` cell per reference
  * type — then the χ² is a fixed-order per-row expression over the cells;
  * no second pass, no cross-row float aggregation. The watermark bounds
  * state; closed windows emit and drop. At scale this is the same
  * partial+final windowed aggregation as every other monitor, with the
  * reference mix a tiny broadcast constant.
  */
object StreamingDriftMonitor {

  /** Per-hour χ² vs `refShares` over a directory-fed event stream.
    * `refShares` values must sum to 1 (the reference distribution). */
  def monitor(spark: SparkSession, eventsDir: String,
      refShares: Map[String, Double], maxFilesPerTrigger: Int = 1): DataFrame = {
    val stream = spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "1 hour")
    driftSelect(stream.groupBy(window(col("ts_utc"), "1 hour")), refShares)
  }

  /** The shared aggregate + χ² projection, also applied to a batch
    * `groupBy(window(...))` in the equivalence spec — one code path, two
    * execution modes.
    *
    * Types ABSENT from the reference mix count into `n_other` and into the
    * total: their expected known-cell counts then assume the full window,
    * so mass shifting toward a novel type deflates every known cell and
    * the statistic ALARMS instead of going blind (a total built from known
    * cells only scores a 98%-spam window as perfectly calm, and an
    * all-spam window as NaN). */
  private[streaming] def driftSelect(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      refShares: Map[String, Double]): DataFrame = {
    require(math.abs(refShares.values.sum - 1.0) < 1e-9, "reference shares must sum to 1")
    val types = refShares.keys.toSeq.sorted
    val cells = types.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")) :+
      sum(when(col("event_type").isin(types.map(lit): _*), 0L).otherwise(1L)).as("n_other")
    val agg = grouped.agg(cells.head, cells.tail: _*)
    val total: Column = types.map(t => col(s"n_$t")).reduce(_ + _) + col("n_other")
    val chi2: Column = types.map { t =>
      val e = lit(refShares(t)) * total
      (col(s"n_$t") - e) * (col(s"n_$t") - e) / e
    }.reduce(_ + _)
    agg.select(
      (col("window.start") +: types.map(t => col(s"n_$t"))) ++
        Seq(col("n_other"), total.as("n_total"), chi2.as("chi2")): _*)
      .withColumnRenamed("start", "win_start")
  }
}
