package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Stateful streaming exact-deduplication: keep the first document ever seen
  * for each content hash, across micro-batches.
  *
  * Spark's built-in `dropDuplicates` on a stream keeps arbitrary-first per
  * key; this operator implements the keep-LOWEST-id policy of the batch
  * `Dedup.exactDedupKeepFirst` (first batch wins across batches, min doc_id
  * within a batch), so streaming and batch produce the same survivor set on
  * the same data — the equivalence the spec asserts.
  *
  * Scale notes: state per distinct content hash is one (hash, id) pair —
  * 32 B + key — so 10¹⁰ distinct documents is ~1 TB of state sharded across
  * executors by the groupByKey hash shuffle; pair with
  * `GroupStateTimeout.EventTimeTimeout` + a watermark to bound state when
  * the dedup horizon is finite (e.g. "dedup within 7 days").
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text_hash: String)
  case class SeenState(keepId: Long)
  case class Kept(text_hash: String, doc_id: Long)

  /** Documents fixture schema (TESTDATA.md) — file streams need it declared. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** First sight of a hash: keep the batch's lowest doc_id and emit it;
    * every later sight (same batch via min, later batches via state) is
    * suppressed. */
  def updateState(hash: String, docs: Iterator[Doc],
      state: GroupState[SeenState]): Iterator[Kept] = {
    if (state.exists) Iterator.empty
    else {
      val keep = docs.map(_.doc_id).min
      state.update(SeenState(keep))
      Iterator.single(Kept(hash, keep))
    }
  }

  /** Streaming keep-first dedup over a directory of documents parquet files. */
  def dedupStream(spark: SparkSession, docsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[Kept] = {
    import spark.implicits._
    spark.readStream
      .schema(documentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(docsDir)
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .as[Doc]
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(updateState)
  }

  // ------------------------------------------- bounded-horizon variant

  case class TimedDoc(doc_id: Long, text_hash: String, event_time: java.sql.Timestamp)

  /** Keep-first WITHIN A FINITE HORIZON: a hash's state lives until the
    * watermark passes `last sight + horizon`, then is evicted
    * (EventTimeTimeout), so state size is bounded by the distinct hashes
    * seen within one horizon instead of ever — the form a perpetual
    * 100 TB-scale ingest job must run. Consequence (by design): a duplicate
    * arriving beyond the horizon RE-ADMITS the document; each sighting
    * extends its hash's lease. */
  def updateStateBounded(horizonMs: Long)(hash: String, docs: Iterator[TimedDoc],
      state: GroupState[SeenState]): Iterator[Kept] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val ds = docs.toSeq
      val out =
        if (state.exists) Iterator.empty
        else {
          val keep = ds.map(_.doc_id).min
          state.update(SeenState(keep))
          Iterator.single(Kept(hash, keep))
        }
      val maxT = ds.map(_.event_time.getTime).max
      // a timeout in the past would throw; late data can only extend to
      // just past the current watermark
      state.setTimeoutTimestamp(math.max(maxT + horizonMs, state.getCurrentWatermarkMs() + 1))
      out
    }
  }

  /** Bounded-state wiring: watermark on event time + EventTimeTimeout
    * eviction. `delayThreshold` is the lateness allowance (watermark lag);
    * `horizonMs` the dedup window. */
  def dedupStreamBounded(docs: Dataset[TimedDoc], delayThreshold: String,
      horizonMs: Long): Dataset[Kept] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("event_time", delayThreshold)
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateStateBounded(horizonMs))
  }
}
