package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.EventOps

class StreamingSrmGuardSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("streamed first-seen assignments reproduce the batch SRM table exactly") {
    val dir = SparkSuite.Sf0001
    val staged = StreamFixtures.stageEventsTwoBatches(spark, dir, "events_srm_stream")
    val q = StreamingSrmGuard.srmStream(spark, staged)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName("stream_srm")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("stream_srm").collect()
      // exactly-once: no user may be emitted twice across micro-batches
      val users = rows.map(_.getLong(0))
      assert(users.length == users.distinct.length, "a user was emitted twice")
      val streamed = rows.groupBy(_.getLong(1)).view.mapValues(_.length.toLong).toMap
      val batch = EventOps.abSrm(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (v, n) =>
        assert(n == batch(v)._1, s"variant $v: streamed $n users vs batch ${batch(v)._1}")
      }
      // the chi-square recomputed from streamed counts matches the batch gate
      val (u0, u1) = (streamed(0L), streamed(1L))
      val chi = ((u0 - u1) * (u0 - u1) * 1000000L + (u0 + u1) / 2) / (u0 + u1)
      val batchChi = EventOps.abSrm(spark, dir).collect().head.getLong(3)
      assert(chi == batchChi)
    } finally q.stop()
  }
}
