package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types._

/** Stateful streaming debounce — the ingest-time twin of
  * [[graft.operators.EventOps.debounceSummary]]'s batch rule: an event is
  * kept iff ≥ holdoff has elapsed since the previous event of the same
  * (user, type), judged against the previous RAW event (kept or not), so a
  * sustained burst stays suppressed for its whole duration.
  *
  * State per key is ONE timestamp (8 B + key) — the minimal stateful
  * operator — sharded by the groupByKey shuffle; a watermark +
  * EventTimeTimeout drops keys idle past the holdoff horizon when state
  * must be bounded (the fixture spec runs without timeout, matching the
  * batch twin exactly). Within a micro-batch the group iterator sorts by
  * (tus, event_id), the batch twin's window order, so stream == batch
  * verdicts whenever files arrive in event-time order per key — the spec
  * stages a strict time split and asserts bit-equality.
  */
object StreamingDebounce {

  case class Ev(event_id: Long, user_id: Long, event_type: String, tus: Long)
  case class LastSeen(tus: Long)
  case class Verdict(event_id: Long, user_id: Long, event_type: String,
      tus: Long, kept: Boolean)

  /** Pre-projected event schema for the file-stream source. */
  val evSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("tus", LongType)))

  def updateState(holdoffUs: Long)(key: (Long, String), evs: Iterator[Ev],
      state: GroupState[LastSeen]): Iterator[Verdict] = {
    var prev: Option[Long] = if (state.exists) Some(state.get.tus) else None
    val out = evs.toSeq.sortBy(e => (e.tus, e.event_id)).map { e =>
      val kept = prev.forall(p => e.tus - p >= holdoffUs)
      prev = Some(e.tus)
      Verdict(e.event_id, e.user_id, e.event_type, e.tus, kept)
    }
    prev.foreach(p => state.update(LastSeen(p)))
    out.iterator
  }

  /** Streaming per-event debounce verdicts over a directory of
    * pre-projected event parquet files. */
  def debounceStream(spark: SparkSession, evDir: String,
      holdoffUs: Long = 60L * 1000000,
      maxFilesPerTrigger: Int = 1): Dataset[Verdict] = {
    import spark.implicits._
    spark.readStream
      .schema(evSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(evDir)
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LastSeen, Verdict](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        updateState(holdoffUs))
  }
}
