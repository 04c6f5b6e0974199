package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupState
import org.apache.spark.sql.types._

/** Streaming CUSUM drift monitor — the continuous twin of
  * [[graft.operators.EventOps.cusumAlarms]], against a FIXED per-type
  * reference rate (the batch form derives its reference from the whole
  * series, which a stream cannot see; production CUSUM runs against the
  * rate the capacity plan assumed). Per (event_type) key the state is
  * (current hour, count in hour, S) — O(1) per type. Events fold in
  * event-time order within a batch; each hour ROLLOVER applies one CUSUM
  * step `S := max(0, S + (y − ref − slack))` over the closed hour and
  * emits it, so a partial hour is never scored and a hour split across
  * micro-batches scores exactly once. Scaled integers throughout
  * (slack = ref/2, everything ×2 — the batch twin's recipe).
  */
object StreamingCusum {

  case class Ev(event_type: String, tus: Long)
  case class CusumState(hour: Long, inHour: Long, s2: Long)
  case class Step(event_type: String, hour: Long, y: Long, s2: Long, alarm: Boolean)

  val evSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("tus", LongType)))

  private val HourUs = 3600000000L

  /** One CUSUM step per CLOSED hour: 2·S update with d = 2y − 3·ref
    * (ref + ref/2 slack, scaled by 2).
    *
    * LATE-ARRIVAL CONTRACT (ADVICE r9): the per-key state's `hour` is a
    * HIGH-WATER mark — an event whose hour is BELOW it arrived after that
    * hour was closed and scored, and is DROPPED here (Append mode has
    * already emitted the hour's Step; re-opening it would emit a duplicate
    * and corrupt the S recursion). Within a micro-batch events fold in
    * event-time order, so "exactly one score per hour" holds for any
    * intra-batch ordering; ACROSS batches it requires per-key hours to
    * arrive non-decreasing — violations are dropped, never re-scored.
    * Upstream, bound disorder with a watermark-sized buffer if late hours
    * carry signal. */
  def updateState(refPerHour: Long, thresholdMeans: Int)(
      key: String, evs: Iterator[Ev],
      state: GroupState[CusumState]): Iterator[Step] = {
    var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[Step]
    def close(): Unit = if (st.hour != Long.MinValue) {
      val s2 = math.max(0L, st.s2 + 2 * st.inHour - 3 * refPerHour)
      out += Step(key, st.hour, st.inHour, s2,
        s2 > 2 * refPerHour * thresholdMeans)
      st = CusumState(st.hour, 0L, s2)
    }
    evs.toSeq.sortBy(_.tus).foreach { e =>
      val h = e.tus / HourUs
      if (h > st.hour) {
        close()
        st = CusumState(h, 1L, st.s2)
      } else if (h == st.hour) st = st.copy(inHour = st.inHour + 1)
      // h < st.hour: late event for an already-closed hour — drop (see
      // contract above); a closed hour must never re-score
    }
    // the open hour stays in state; it scores when a later hour arrives
    state.update(st)
    out.iterator
  }

  def cusumStream(spark: SparkSession, evDir: String, refPerHour: Long,
      thresholdMeans: Int = 1, maxFilesPerTrigger: Int = 1): Dataset[Step] = {
    import spark.implicits._
    spark.readStream
      .schema(evSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(evDir)
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, Step](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(
        updateState(refPerHour, thresholdMeans))
  }

  /** Batch twin over the same fixed reference: the textbook recursion per
    * type over observed hourly counts, for the stream==batch spec. */
  def batchTwin(hourly: Seq[(String, Long, Long)], refPerHour: Long,
      thresholdMeans: Int): Seq[Step] =
    hourly.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      var s2 = 0L
      rows.sortBy(_._2).map { case (_, h, y) =>
        s2 = math.max(0L, s2 + 2 * y - 3 * refPerHour)
        Step(t, h, y, s2, s2 > 2 * refPerHour * thresholdMeans)
      }
    }
}
