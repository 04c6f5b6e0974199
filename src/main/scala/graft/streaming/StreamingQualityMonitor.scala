package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.Rule

/** Streaming data-quality monitoring — the north-star surface ("data
  * quality monitoring as Spark jobs running validation queries") in its
  * continuous form: the SAME declarative [[graft.quality.Rule]] objects
  * the batch [[graft.quality.QualityRunner]] evaluates, compiled into a
  * watermarked windowed aggregation over an event stream.
  *
  * Every row-level rule becomes one `sum(violation)` term in a single
  * windowed aggregate — one pass over each micro-batch regardless of rule
  * count, the same fusion as the batch engine — so per-window violation
  * counts stream out continuously and an alert is a filter on the sink.
  * The watermark bounds state: closed windows are emitted and dropped.
  */
object StreamingQualityMonitor {

  /** Hourly violation counts per rule over a directory-fed event stream.
    * Only row-level rules apply (Unique/ForeignKey need cross-batch state
    * — that is [[StreamingDedup]]'s territory and batch reconciliation's). */
  def monitor(spark: SparkSession, eventsDir: String, rules: Seq[Rule],
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val rowRules = rules.filter(_.rowPredicate.isDefined)
    require(rowRules.nonEmpty, "streaming monitor needs at least one row-level rule")
    val aggs = rowRules.map(r =>
      sum(when(!expr(r.rowPredicate.get), 1L).otherwise(0L)).as(r.name))
    spark.readStream
      .schema(EventStreamProfiler.eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(eventsDir)
      .withColumn("ts_utc", col("ts").cast("timestamp"))
      .withWatermark("ts_utc", "1 hour")
      .groupBy(window(col("ts_utc"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
      // rule names contain dots/parens — backquote so they aren't parsed
      // as nested-field access
      .select(col("window.start").as("win_start") +: rowRules.map(r => col(s"`${r.name}`")): _*)
  }
}
