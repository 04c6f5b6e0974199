package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.quality.{ExprRule, InRange, InSet, NotNull}

class StreamingQualityMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val rules = Seq(
    NotNull("event_id"),
    InSet("event_type", Seq("click", "error", "purchase", "signup", "view")),
    InRange("value", 0, 100), // intentionally violated: fixture max ~1000
    ExprRule("value_non_negative", "value >= 0"))

  private def stageTwoBatches(dir: String): String =
    StreamFixtures.stageEventsTwoBatches(spark, dir, "events_quality_stream")

  test("streaming windowed rule violations sum to the batch totals") {
    val dir = SparkSuite.Sf0001
    val staged = stageTwoBatches(dir)
    val q = StreamingQualityMonitor.monitor(spark, staged, rules)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("stream_quality")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_quality")
      // per-rule totals across all windows == batch rule evaluation
      val events = spark.read.parquet(s"$dir/events.parquet")
      rules.foreach { r =>
        val streamTotal = streamed.agg(sum(col(s"`${r.name}`"))).collect()(0).getLong(0)
        val batchTotal = events
          .agg(sum(when(!expr(r.rowPredicate.get), 1L).otherwise(0L))).collect()(0).getLong(0)
        assert(streamTotal == batchTotal, s"${r.name}: stream=$streamTotal batch=$batchTotal")
      }
      // the planted violation actually fires
      val rangeViolations = streamed
        .agg(sum(col("`in_range(value,0.0,100.0)`"))).collect()(0).getLong(0)
      assert(rangeViolations > 0, "expected the value<=100 rule to detect violations")
    } finally q.stop()
  }
}
