package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the Structured Streaming form of
  * `EventOps.purchaseClickAttribution`: purchases joined to the same
  * user's clicks in the trailing 5-minute window, both sides unbounded
  * streams.
  *
  * The watermark + time-range condition pair is what makes this bounded:
  * each side declares how late its events can be, and the join's time
  * condition (`c_ts BETWEEN p_ts - 5min AND p_ts`) lets the state store
  * evict a buffered row once the other side's watermark passes its
  * latest possible match — state is O(events in the window horizon), not
  * O(stream). Without the range condition Spark would have to buffer both
  * streams forever.
  *
  * Same banding logic as the batch operator is NOT needed here: the
  * stream-stream join keys on user_id for the shuffle and applies the
  * time predicate against the per-key state buffer, which is already the
  * linear-scan-free shape.
  */
object StreamStreamJoin {

  /** Purchases ⋈ clicks (same user, click within the 5 minutes at-or-before
    * the purchase), as an append-mode stream over a directory of events
    * parquet files. */
  def attributionStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    joined(spark, eventsDir, maxFilesPerTrigger, "inner")

  /** LEFT-OUTER stream-stream interval join: every purchase, including
    * zero-click ones. An unmatched purchase cannot be emitted when it
    * arrives — a matching click may still be in flight — so Spark holds it
    * in state and emits it null-extended once the CLICK side's watermark
    * passes its latest possible match (`p_ts`, since clicks at-or-before
    * the purchase are the only candidates). That watermark hand-off is the
    * whole difference from the inner form: results for unmatched rows
    * arrive with up to (watermark delay) lateness, and state stays bounded
    * by the same eviction rule — nothing outlives watermark + window.
    * Batch-parity (vs the LEFT range join) and the cross-batch null
    * emission are gated in StreamStreamJoinSpec. */
  def attributionStreamLeftOuter(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    joined(spark, eventsDir, maxFilesPerTrigger, "leftOuter")

  private def joined(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int, joinType: String): DataFrame = {
    def side(eventType: String, prefix: String): DataFrame =
      spark.readStream
        .schema(EventStreamProfiler.eventsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(eventsDir)
        .filter(col("event_type") === eventType)
        .select(
          col("user_id").as(s"${prefix}_user"),
          col("ts").cast("timestamp").as(s"${prefix}_ts"),
          col("event_id").as(s"${prefix}_id"))
        .withWatermark(s"${prefix}_ts", "10 minutes")
    val purchases = side("purchase", "p")
    val clicks = side("click", "c")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 5 MINUTES"),
      joinType)
  }
}
