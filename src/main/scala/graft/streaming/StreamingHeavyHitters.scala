package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg.misra_gries_agg

/** Streaming FREQUENT-ITEMS monitor — the continuous twin of the batch
  * Misra-Gries profile (`ProfileQueries.heavyValues`): each tumbling window
  * folds its value stream into a k-counter MG summary, emitting the map and
  * the window's stream size. "What dominated this hour" with O(k) state per
  * window — the mergeable-summary shape means the state store holds one
  * serialized k-entry buffer per open window, never a per-value histogram
  * (at 100 TB a high-cardinality column would make the exact per-window
  * groupBy state unbounded; MG caps it by construction).
  *
  * The watermark bounds open-window state; closed windows emit and drop.
  * Same aggregate, two execution modes: [[hhSelect]] is also applied to a
  * batch `groupBy(window(...))` in the equivalence spec.
  */
object StreamingHeavyHitters {

  /** Per-hour MG summary of `event_type` over a directory-fed stream. */
  def monitor(spark: SparkSession, eventsDir: String,
      k: Int = 8, maxFilesPerTrigger: Int = 1): DataFrame = {
    val stream = spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "1 hour")
    hhSelect(stream.groupBy(window(col("ts_utc"), "1 hour")), k)
  }

  /** Shared aggregate: MG summary + stream size per group. */
  private[streaming] def hhSelect(
      grouped: org.apache.spark.sql.RelationalGroupedDataset, k: Int): DataFrame =
    grouped
      .agg(
        misra_gries_agg(col("event_type"), k).as("summary"),
        count(col("event_type")).as("n_events"))
      .select(col("window.start").as("win_start"), col("summary"), col("n_events"))
}
