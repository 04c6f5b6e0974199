package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The stateful transition tracker: the streamed transition multiset equals
  * the batch lead()-window's EXACTLY — transitions span micro-batch
  * boundaries, so this is the test that the cross-batch state actually
  * works (a stateless per-batch fold would drop one transition per user
  * per boundary).
  */
class StreamingTransitionsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streamed transition counts == batch transition matrix bit-for-bit") {
    val staged = StreamFixtures.stageEventsTwoBatches(spark, SparkSuite.Sf0001, "events_trans_stream")
    val q = StreamingTransitions.transitionStream(spark, staged)
      .writeStream.outputMode("update").format("memory")
      .queryName("stream_trans").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_trans")
        .groupBy("cur", "nxt").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // batch twin of EventOps.transitionMatrix over the staged directory
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val batch = spark.read.parquet(staged)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("cur"))
        .withColumn("nxt", lead(col("cur"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed == batch,
        s"diff: missing=${(batch.toSet -- streamed.toSet).take(3)} " +
          s"extra=${(streamed.toSet -- batch.toSet).take(3)}")
      assert(batch.values.sum > 0, "degenerate fixture: no transitions")
    } finally q.stop()
  }

  test("cross-batch transitions are present (stateless per-batch fold would drop them)") {
    val staged = StreamFixtures.stageEventsTwoBatches(spark, SparkSuite.Sf0001, "events_trans_stream2")
    // users with events in BOTH batches have a boundary transition each;
    // total streamed transitions must be n_events - n_users (each user's
    // first event has no predecessor), which only holds if boundaries emit
    val events = spark.read.parquet(staged)
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    val q = StreamingTransitions.transitionStream(spark, staged)
      .writeStream.outputMode("update").format("memory")
      .queryName("stream_trans2").start()
    try {
      q.processAllAvailable()
      val n = spark.table("stream_trans2").count()
      assert(n == nEvents - nUsers, s"got $n transitions, want ${nEvents - nUsers}")
    } finally q.stop()
  }
}
