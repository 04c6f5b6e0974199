package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming MULTI-TOUCH ATTRIBUTION — the streaming twin of
  * `EventOps.attribution`, with the same three credit models (first-touch,
  * last-touch, linear with remainder-to-last) in exact integer permille.
  *
  * Per-user state is the LOOK-BACK TOUCH BUFFER: click/view touches
  * accumulate; each purchase scans the buffer for touches inside the 72 h
  * window and assigns all three credits at once; every fold then prunes
  * the buffer to the look-back horizon behind the latest event seen, so
  * state is bounded by (events within 72 h) per user — the window IS the
  * state bound, no unbounded growth. Credit counters are monotone, so the
  * update-mode memory sink's max-per-user is the final answer.
  *
  * Ordering contract (same as the sessionizer twin): per-batch sorting
  * handles intra-batch disorder; cross-batch late touches older than an
  * already-processed purchase are attributed only to LATER conversions —
  * exactly the semantics of a production attribution stream, where credit
  * for a conversion is assigned when the conversion is observed. A
  * watermark + event-time timeout would evict idle users' buffers in
  * production; the fixture replay keeps the spec deterministic without it.
  */
object StreamingAttribution {

  case class Ev(user_id: Long, event_id: Long, event_type: String, tus: Long)

  case class Touch(tus: Long, eventId: Long, isClick: Boolean)

  /** Buffer + monotone credit counters (milli-units) per touch type. */
  case class AttState(touches: List[Touch],
      clickN: Long, clickFirst: Long, clickLast: Long, clickLin: Long,
      viewN: Long, viewFirst: Long, viewLast: Long, viewLin: Long)

  case class UserAttribution(user_id: Long,
      click_touches: Long, click_first_milli: Long, click_last_milli: Long,
      click_linear_milli: Long,
      view_touches: Long, view_first_milli: Long, view_last_milli: Long,
      view_linear_milli: Long)

  val WindowUs: Long = 72L * 3600 * 1000000

  private val Empty = AttState(Nil, 0, 0, 0, 0, 0, 0, 0, 0)

  private def credit(s: AttState, cts: Long): AttState = {
    val win = s.touches.filter(t => t.tus < cts && t.tus >= cts - WindowUs)
      .sortBy(t => (t.tus, t.eventId))
    if (win.isEmpty) s
    else {
      val n = win.length
      var st = s
      win.zipWithIndex.foreach { case (t, i) =>
        val first = if (i == 0) 1000L else 0L
        val last = if (i == n - 1) 1000L else 0L
        val lin = 1000L / n + (if (i == n - 1) 1000L % n else 0L)
        st =
          if (t.isClick) st.copy(clickN = st.clickN + 1,
            clickFirst = st.clickFirst + first, clickLast = st.clickLast + last,
            clickLin = st.clickLin + lin)
          else st.copy(viewN = st.viewN + 1,
            viewFirst = st.viewFirst + first, viewLast = st.viewLast + last,
            viewLin = st.viewLin + lin)
      }
      st
    }
  }

  def updateState(userId: Long, events: Iterator[Ev],
      state: GroupState[AttState]): Iterator[UserAttribution] = {
    val sorted = events.toSeq.sortBy(e => (e.tus, e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(Empty)
    sorted.foreach { e =>
      e.event_type match {
        case "purchase" => s = credit(s, e.tus)
        case "click" => s = s.copy(touches = Touch(e.tus, e.event_id, isClick = true) :: s.touches)
        case "view" => s = s.copy(touches = Touch(e.tus, e.event_id, isClick = false) :: s.touches)
        case _ => ()
      }
    }
    // horizon prune: nothing older than (latest seen − window) can ever
    // fall inside a later conversion's look-back under in-order arrival
    val horizon = sorted.last.tus - WindowUs
    s = s.copy(touches = s.touches.filter(_.tus >= horizon))
    state.update(s)
    Iterator.single(UserAttribution(userId,
      s.clickN, s.clickFirst, s.clickLast, s.clickLin,
      s.viewN, s.viewFirst, s.viewLast, s.viewLin))
  }

  def attributionStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[UserAttribution] = {
    import spark.implicits._
    spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateState)
  }
}
