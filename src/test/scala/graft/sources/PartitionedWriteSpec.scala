package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class PartitionedWriteSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case s: FileSourceScanExec => Seq(s)
      case _ => Seq.empty
    }
    self ++ p.children.flatMap(fileScans)
  }

  test("partitioned write prunes directories for partition-column filters") {
    val out = Files.createTempDirectory("events_by_type").toString
    val events = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
    TableSources.writePartitioned(events, out, Seq("event_type"))

    // layout: one directory per event_type value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("event_type=")), dirs.mkString(","))
    assert(dirs.length >= 4)

    val filtered = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val n = filtered.count()
    assert(n > 0 && n == events.filter(col("event_type") === "purchase").count())

    // the scan must carry the filter as a PartitionFilter and read only the
    // matching directory's files
    val scans = fileScans(filtered.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got data filters: ${scan.dataFilters}")
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles,
      "pruning should select a strict subset of files")
  }

  test("round-trip preserves rows and schema (minus partition column position)") {
    val out = Files.createTempDirectory("events_rt").toString
    val events = spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet")
    TableSources.writePartitioned(events, out, Seq("event_type"))
    val back = spark.read.parquet(out)
    assert(back.count() == events.count())
    assert(back.columns.toSet == events.columns.toSet)
    // values intact: per-type counts identical
    val a = events.groupBy("event_type").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = back.groupBy("event_type").count().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
