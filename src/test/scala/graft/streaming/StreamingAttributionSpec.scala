package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.EventOps

class StreamingAttributionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streaming attribution across micro-batches matches the batch rollup") {
    val dir = SparkSuite.Sf0001
    val staged = StreamFixtures.stageEventsTwoBatches(spark, dir, "events_attr_stream")
    val q = StreamingAttribution.attributionStream(spark, staged)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_attribution")
      .start()
    try {
      q.processAllAvailable()
      // monotone counters: max per user = final state; sum = corpus rollup
      val fin = spark.table("stream_attribution")
        .groupBy("user_id")
        .agg(max("click_touches").as("cn"), max("click_first_milli").as("cf"),
          max("click_last_milli").as("cl"), max("click_linear_milli").as("cli"),
          max("view_touches").as("vn"), max("view_first_milli").as("vf"),
          max("view_last_milli").as("vl"), max("view_linear_milli").as("vli"))
        .agg(sum("cn"), sum("cf"), sum("cl"), sum("cli"),
          sum("vn"), sum("vf"), sum("vl"), sum("vli"))
        .collect().head
      val streamed = Map(
        "click" -> ((fin.getLong(0), fin.getLong(1), fin.getLong(2), fin.getLong(3))),
        "view" -> ((fin.getLong(4), fin.getLong(5), fin.getLong(6), fin.getLong(7))))
      val batch = EventOps.attribution(spark, dir).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(streamed == batch, s"streamed $streamed\nbatch $batch")
      assert(batch.values.map(_._1).sum > 0, "fixture must attribute something")
    } finally q.stop()
  }
}
