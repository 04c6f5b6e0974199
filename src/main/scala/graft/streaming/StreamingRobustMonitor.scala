package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming robust-statistics monitor — the continuous twin of the batch
  * median/MAD outlier gate ([[graft.operators.EventOps.robustAnomalies]]):
  * per (window, event_type), a Datasketches KLL quantile sketch in the
  * windowed-aggregation state yields the robust location/spread summary
  * (median, IQR, Tukey-style fences at median ± 2.5·IQR/1.349, the
  * σ-consistent IQR scale) that a mean/stddev monitor gets poisoned out
  * of by one whale value.
  *
  * Exact medians are unbounded state on a stream; the KLL buffer is O(k)
  * per open window/type and MERGEABLE, so micro-batch boundaries and
  * partitioning never change what the operator IS — only the sketch's
  * internal randomized compaction (which is why the spec gates stream AND
  * batch against exact quantiles with the k=400 tolerance, not
  * bit-equality like the HLL monitor — register-max is order-insensitive,
  * KLL compaction is not).
  */
object StreamingRobustMonitor {

  /** Hourly robust summaries per event type over a directory-fed stream;
    * 2-hour watermark bounds open-window state. */
  def monitorStream(spark: SparkSession, eventsDir: String,
      kllK: Int = 400, maxFilesPerTrigger: Int = 1): DataFrame =
    robustSelect(
      spark.readStream
        .schema(EventStreamProfiler.eventsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(eventsDir)
        .withColumn("ts_utc", col("ts").cast("timestamp"))
        .withWatermark("ts_utc", "2 hours"), kllK)

  /** Batch twin — same select over a static read. */
  def monitorBatch(spark: SparkSession, eventsDir: String, kllK: Int = 400): DataFrame =
    robustSelect(
      spark.read.parquet(eventsDir)
        .withColumn("ts_utc", col("ts").cast("timestamp")), kllK)

  private def robustSelect(df: DataFrame, kllK: Int): DataFrame = {
    val med = kll_sketch_get_quantile_double(col("sk"), lit(0.5))
    val q1 = kll_sketch_get_quantile_double(col("sk"), lit(0.25))
    val q3 = kll_sketch_get_quantile_double(col("sk"), lit(0.75))
    df.filter(col("value").isNotNull)
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(kll_sketch_agg_double(col("value"), lit(kllK)).as("sk"),
        count(lit(1)).as("n"))
      .select(
        col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"),
        med.as("med_est"),
        (q3 - q1).as("iqr_est"),
        (med - lit(2.5) * (q3 - q1) / lit(1.349)).as("lo_fence"),
        (med + lit(2.5) * (q3 - q1) / lit(1.349)).as("hi_fence"))
  }
}
