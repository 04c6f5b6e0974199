package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming FUNNEL — the streaming twin of
  * `EventOps.signupFunnel`: signup → first click at-or-after signup →
  * first purchase at-or-after that click, per user, with the reached
  * stage. Each stage's predicate depends on the previous stage's result,
  * so the streaming form is a per-user three-slot state machine rather
  * than a windowed aggregate.
  *
  * State is exactly three optional timestamps per user (24 bytes + tags)
  * — the minimal funnel memory, O(users) total; production evicts idle
  * users with an event-time timeout once the funnel window closes (the
  * fixture replay keeps the spec deterministic without one).
  *
  * Each slot latches ONCE: under the in-order arrival contract shared by
  * every twin here (per-batch sorting handles intra-batch disorder),
  * the first signup seen is the min signup, the first eligible click is
  * the min eligible click, and so on — so the latched values equal the
  * batch conditional-mins, and outputs only ever move FORWARD through
  * stages. Equal-timestamp events settle in funnel order
  * (signup < click < purchase), matching the batch `>=` semantics where
  * a click at the signup instant qualifies. The update-mode memory
  * sink's max-stage row per user is therefore the final answer.
  */
object StreamingFunnel {

  case class Ev(user_id: Long, event_id: Long, event_type: String, tus: Long)

  case class FunnelState(signup: Option[Long], click: Option[Long],
      purchase: Option[Long])

  case class UserFunnel(user_id: Long, signup_tus: Long,
      click_tus: Option[Long], purchase_tus: Option[Long], stage: Long)

  private val StageOrder = Map("signup" -> 0, "click" -> 1, "purchase" -> 2)

  def updateState(userId: Long, events: Iterator[Ev],
      state: GroupState[FunnelState]): Iterator[UserFunnel] = {
    val sorted = events.toSeq.filter(e => StageOrder.contains(e.event_type))
      .sortBy(e => (e.tus, StageOrder(e.event_type), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    var s = state.getOption.getOrElse(FunnelState(None, None, None))
    sorted.foreach { e =>
      e.event_type match {
        case "signup" =>
          if (s.signup.isEmpty) s = s.copy(signup = Some(e.tus))
        case "click" =>
          if (s.click.isEmpty && s.signup.exists(e.tus >= _))
            s = s.copy(click = Some(e.tus))
        case "purchase" =>
          if (s.purchase.isEmpty && s.click.exists(e.tus >= _))
            s = s.copy(purchase = Some(e.tus))
        case _ => ()
      }
    }
    state.update(s)
    s.signup match {
      case None => Iterator.empty // the funnel is keyed on signups
      case Some(signup) =>
        val stage = 1L + (if (s.click.isDefined) 1L else 0L) +
          (if (s.purchase.isDefined) 1L else 0L)
        Iterator.single(UserFunnel(userId, signup, s.click, s.purchase, stage))
    }
  }

  def funnelStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[UserFunnel] = {
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
