package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming transition tracking — the continuous twin of the
  * batch Markov matrix ([[graft.operators.EventOps.transitionMatrix]]).
  *
  * A windowed aggregate cannot express this: a transition (current → next)
  * SPANS events, including across micro-batch boundaries, so the state is
  * each user's LAST seen event (type + event time) and every arriving
  * event emits exactly one transition against it. One tiny state row per
  * user (bounded by the user population, not the stream length), the same
  * `flatMapGroupsWithState` surface as [[StreamingSessionizer]].
  *
  * Determinism contract (spec-gated): per-batch events fold in
  * (event-time, event_id) order and the fixture replay splits batches on
  * an event-time cut, so the streamed transition multiset equals the batch
  * lead()-window's exactly — bit-for-bit, not approximately.
  */
object StreamingTransitions {

  case class Ev(user_id: Long, tus: Long, event_id: Long, event_type: String)
  case class LastEv(tus: Long, event_id: Long, event_type: String)
  case class Trans(user_id: Long, cur: String, nxt: String)

  def updateState(userId: Long, events: Iterator[Ev],
      state: GroupState[LastEv]): Iterator[Trans] = {
    val sorted = events.toSeq.sortBy(e => (e.tus, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = Seq.newBuilder[Trans]
    var last = state.getOption
    sorted.foreach { e =>
      last.foreach(l => out += Trans(userId, l.event_type, e.event_type))
      last = Some(LastEv(e.tus, e.event_id, e.event_type))
    }
    state.update(last.get)
    out.result().iterator
  }

  /** Per-event transitions over a directory-fed stream (Update mode; the
    * spec aggregates the emitted multiset to counts). */
  def transitionStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[Trans] = {
    import spark.implicits._
    spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_id"), col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateState)
  }
}
