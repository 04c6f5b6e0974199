package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming freshness/volume profiling over the `events` table — the
  * engine's Structured Streaming surface (the reference is batch-only;
  * SURVEY §2.7 marks this as engine value-add).
  *
  * The same tumbling-window rollup as [[graft.operators.EventOps.hourlyRollup]]
  * expressed as a streaming query: `readStream` → event-time window +
  * watermark → aggregate. In production the source is a stream (kafka/files
  * arriving); here the parquet fixture dir replays as a file stream, and
  * tests drive it synchronously with `processAllAvailable()`.
  */
object EventStreamProfiler {

  /** Fixture `events` schema (ts = parquet TIMESTAMP(MICROS), ntz). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming PROFILE mode: the engine's fused column-stats aggregation
    * (SURVEY §4.2 stat fusion) applied per tumbling event-time window —
    * rolling data-quality monitoring of a stream: per hour, row count plus
    * min/max/null-count of every profiled column. The reference can only
    * profile a static catalog; this is the same semantics over a live
    * source. */
  def hourlyProfileStream(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "2 hours")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        (count(lit(1)) - count(col("event_id"))).as("nulls_event_id"),
        min(col("user_id")).as("min_user_id"),
        max(col("user_id")).as("max_user_id"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (count(lit(1)) - count(col("value"))).as("nulls_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("n_rows"), col("min_event_id"), col("max_event_id"), col("nulls_event_id"),
        col("min_user_id"), col("max_user_id"), col("min_value"), col("max_value"),
        col("nulls_value"))

  /** Batch twin of [[hourlyProfileStream]] for equivalence testing. */
  def hourlyProfileBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"),
        (count(lit(1)) - count(col("event_id"))).as("nulls_event_id"),
        min(col("user_id")).as("min_user_id"),
        max(col("user_id")).as("max_user_id"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (count(lit(1)) - count(col("value"))).as("nulls_value"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("n_rows"), col("min_event_id"), col("max_event_id"), col("nulls_event_id"),
        col("min_user_id"), col("max_user_id"), col("min_value"), col("max_value"),
        col("nulls_value"))

  /** Streaming per-window DISTINCT-USERS monitor (the "DAU per hour"
    * sketch): each tumbling window folds `user_id` into a Datasketches HLL
    * — KB of state per open window where exact countDistinct would buffer
    * every user id seen. Register-max accumulation is order-insensitive,
    * so the streaming estimate is IDENTICAL to the batch twin's (spec'd as
    * equality, not tolerance): the sketch depends on the window's value
    * SET, not arrival order or micro-batch boundaries. */
  def hourlyDistinctUsersStream(spark: SparkSession, eventsDir: String,
      lgK: Int = 12, maxFilesPerTrigger: Int = 1): DataFrame =
    distinctUsersSelect(
      spark.readStream
        .schema(eventsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(eventsDir)
        .withColumn("ts_utc", col("ts").cast("timestamp"))
        .withWatermark("ts_utc", "2 hours"), lgK)

  /** Batch twin of [[hourlyDistinctUsersStream]]. */
  def hourlyDistinctUsersBatch(spark: SparkSession, eventsDir: String,
      lgK: Int = 12): DataFrame =
    distinctUsersSelect(
      spark.read.parquet(eventsDir)
        .withColumn("ts_utc", col("ts").cast("timestamp")), lgK)

  private def distinctUsersSelect(df: DataFrame, lgK: Int): DataFrame =
    df.groupBy(window(col("ts_utc"), "1 hour"))
      .agg(
        hll_sketch_agg(col("user_id"), lit(lgK)).as("sk"),
        // count(*) like every other n_events in this file — a null user_id
        // is still an event (the sketch itself skips nulls)
        count(lit(1)).as("n_events"))
      .select(col("window.start").cast("timestamp_ntz").as("hour_start"),
        hll_sketch_estimate(col("sk")).as("ndv_users_est"), col("n_events"))

  /** Streaming hourly rollup: counts + value sums per (hour, event_type),
    * 2-hour watermark for late data. Append-mode compatible (the aggregate
    * closes once the watermark passes the window end).
    *
    * `eventsDir` must be a DIRECTORY of parquet files (the file stream
    * source watches directories; a single-file fixture gets staged into a
    * temp dir by callers/tests). */
  def hourlyRollupStream(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "2 hours")
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .select(
        col("window.start").cast("timestamp_ntz").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming NATIVE session windows: the same `session_window` aggregation
    * as [[graft.operators.EventOps.sessionWindows]] over a stream — Spark's
    * built-in dynamic-gap session merge with watermark-bounded state (the
    * state store holds only sessions whose end is within the watermark
    * horizon; closed sessions are emitted and evicted). Complements
    * [[StreamingSessionizer]], which implements the same semantics manually
    * with flatMapGroupsWithState. */
  def sessionWindowStream(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts_utc"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("w.end").as("sess_end"), col("n_events"))
}
