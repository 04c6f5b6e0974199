package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SRM ASSIGNMENT TAP — the ingest-time leg of
  * `EventOps.abSrm`: every event is stamped with its user's experiment
  * variant through the SAME md5 mix the batch table uses (one
  * definition, `TextAnalysis.mixedHashOf` — the lock that keeps the
  * streaming and batch views of the experiment population identical),
  * and a per-user first-seen dedup emits each (user, variant) exactly
  * once, so the sink's per-variant row count IS the distinct-user count
  * the chi-square SRM test needs — continuously, while the experiment
  * runs, instead of at analysis time when the traffic is already spent.
  *
  * State is one empty slot per seen user (the minimal dedup primitive —
  * the `StreamingDedup` posture); production evicts with an event-time
  * timeout at experiment end. Emission is append-only and monotone, so
  * any downstream rollup (memory sink, Kafka compaction, a dashboard
  * count) reproduces the batch `n_users` per variant exactly — the spec
  * closes the loop against the oracle-gated batch table, column for
  * column, including the chi-square value recomputed from the streamed
  * counts.
  */
object StreamingSrmGuard {

  case class Assigned(user_id: Long, variant: Long)

  def updateState(userId: Long, events: Iterator[Assigned],
      state: GroupState[Boolean]): Iterator[Assigned] = {
    if (state.exists || events.isEmpty) Iterator.empty
    else {
      state.update(true)
      Iterator.single(events.next())
    }
  }

  def srmStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Int = 1): Dataset[Assigned] = {
    import spark.implicits._
    spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .select(col("user_id"),
        pmod(graft.operators.TextAnalysis.mixedHashOf("ab|", col("user_id")), lit(2))
          .cast("bigint").as("variant"))
      .as[Assigned]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateState)
  }
}
