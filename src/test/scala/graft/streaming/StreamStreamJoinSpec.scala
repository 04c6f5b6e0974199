package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Two event-time-ordered batches so buffered click state must survive a
    * micro-batch boundary to match later purchases. */
  private def stageTwoBatches(dir: String): String = {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val median = events.selectExpr("percentile_approx(ts, 0.5)").collect()(0).getLong(0)
    val staged = Files.createTempDirectory("events_ssj")
    def writeOne(cond: org.apache.spark.sql.Column, name: String): java.nio.file.Path = {
      val tmp = Files.createTempDirectory(s"ssj_$name")
      events.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      staged.resolve(s"$name.parquet")
    }
    val f0 = writeOne(col("ts") < median, "batch0")
    val f1 = writeOne(col("ts") >= median, "batch1")
    f0.toFile.setLastModified(System.currentTimeMillis() - 120000)
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    staged.toString
  }

  test("stream-stream interval join matches the batch inner range join") {
    val dir = SparkSuite.Sf001 // sf0.001 has only 1 matching pair; 0.01 is denser
    val staged = stageTwoBatches(dir)
    val q = StreamStreamJoin.attributionStream(spark, staged)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_attribution")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_attribution")
        .select("p_id", "c_user", "c_ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime)).toSet

      val windowUs = 5L * 60 * 1000000
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), expr("ts div 1000").as("tus"), col("event_id"), col("event_type"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tus").as("p_tus"), col("event_id").as("p_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("tus").as("c_tus"))
      val batch = p.join(c,
          col("user_id") === col("c_user") &&
            col("c_tus") <= col("p_tus") &&
            col("c_tus") >= col("p_tus") - windowUs)
        .select(col("p_id"), col("c_user"), (col("c_tus") / 1000).cast("long").as("c_ms"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      assert(streamed.nonEmpty, "expected at least one streamed join result")
      assert(streamed == batch,
        s"streamed=${streamed.size} pairs, batch=${batch.size} pairs")
    } finally q.stop()
  }
}
