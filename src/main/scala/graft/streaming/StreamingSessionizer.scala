package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the `flatMapGroupsWithState` surface.
  *
  * Same 30-minute-gap semantics as the batch `EventOps.sessionize`, but with
  * explicit per-user state that survives across micro-batches: the state
  * carries the open session (start, last-seen, count) plus closed-session
  * aggregates, and each batch's events fold into it in event-time order.
  * This is the shape a production stream takes when tumbling windows can't
  * express the semantics (sessions have data-driven, unaligned boundaries).
  *
  * Caveat kept honest: with an unordered source, per-batch sorting handles
  * intra-batch disorder, and cross-batch late events would need an
  * event-time timeout + watermark policy; the fixture replay delivers
  * batches in file order, which the test exploits deterministically.
  */
object StreamingSessionizer {

  case class Ev(user_id: Long, tus: Long)

  /** Per-user running state: open-session bounds + closed-session stats. */
  case class SessState(openStart: Long, openLast: Long, openCount: Long,
      closedSessions: Long, closedEvents: Long, longest: Long)

  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long, longest_session: Long)

  val GapUs: Long = 30L * 60 * 1000000

  private def fold(state: SessState, tus: Long): SessState =
    if (state.openCount == 0L)
      state.copy(openStart = tus, openLast = tus, openCount = 1L)
    else if (tus - state.openLast > GapUs)
      SessState(tus, tus, 1L,
        state.closedSessions + 1, state.closedEvents + state.openCount,
        math.max(state.longest, state.openCount))
    else state.copy(openLast = tus, openCount = state.openCount + 1)

  private def summarize(userId: Long, s: SessState): UserSessions = {
    val sessions = s.closedSessions + (if (s.openCount > 0) 1 else 0)
    val events = s.closedEvents + s.openCount
    UserSessions(userId, sessions, events, math.max(s.longest, s.openCount))
  }

  /** The state-update function: fold this batch's events (sorted by event
    * time) into the user's state, emit the current summary. Emitting every
    * update keeps the memory-sink test simple; a production job would emit
    * only on session close / timeout. */
  def updateState(userId: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    val sorted = events.toSeq.sortBy(_.tus)
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(SessState(0L, 0L, 0L, 0L, 0L, 0L))
    sorted.foreach(e => s = fold(s, e.tus))
    state.update(s)
    Iterator.single(summarize(userId, s))
  }

  /** Streaming sessionization over a directory of events parquet files. */
  def sessionStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[UserSessions] = {
    import spark.implicits._
    spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateState)
  }
}
