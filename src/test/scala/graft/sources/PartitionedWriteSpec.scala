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

  test("range-clustered write produces disjoint per-file key ranges") {
    val out = Files.createTempDirectory("orders_clustered").toString
    val orders = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet")
    TableSources.writeRangeClustered(orders, out, "o_custkey", numFiles = 4)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length >= 3, s"expected multiple clustered files, got ${files.length}")
    // per-file [min,max] of the cluster key must be pairwise disjoint —
    // that is the property parquet min/max skipping exploits
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("o_custkey"), max("o_custkey")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }
    // row preservation + the selective filter reaches parquet as a pushed filter
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    val filtered = back.filter(col("o_custkey") === 42L)
    val scans = fileScans(filtered.queryExecution.executedPlan)
    assert(scans.exists(_.dataFilters.nonEmpty), "expected pushed data filter on cluster key")
  }

  test("z-ordered write narrows per-file ranges on BOTH dimensions") {
    val out = Files.createTempDirectory("orders_zordered").toString
    val orders = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet")
    TableSources.writeZOrdered(orders, out, "o_custkey", "o_totalprice", numFiles = 8)

    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 6, s"expected ~8 z-ordered files, got ${files.length}")
    val glob = orders.agg(
      (max("o_custkey") - min("o_custkey")).cast("double"),
      max("o_totalprice") - min("o_totalprice")).collect()(0)
    val (globX, globY) = (glob.getDouble(0), glob.getDouble(1))
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        (max("o_custkey") - min("o_custkey")).cast("double"),
        max("o_totalprice") - min("o_totalprice")).collect()(0)
      (r.getDouble(0) / globX, r.getDouble(1) / globY)
    }
    // each file covers a RECTANGLE of (x, y) space: the average per-file
    // span must be well below the global span on BOTH columns — a 1-D
    // range cluster would show ~1.0 on the non-clustered column
    val avgX = spans.map(_._1).sum / spans.length
    val avgY = spans.map(_._2).sum / spans.length
    assert(avgX < 0.75, s"x spans not narrowed: avg fraction $avgX")
    assert(avgY < 0.75, s"y spans not narrowed: avg fraction $avgY")
    assert(spark.read.parquet(out).count() == orders.count())
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

  test("dynamic partition overwrite backfills ONE partition, leaves the rest") {
    val docs = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
    val out = Files.createTempDirectory("dyn_overwrite").resolve("t").toString
    docs.write.partitionBy("lang").parquet(out)
    val before = spark.read.parquet(out)
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // backfill: rewrite ONLY lang=en with half its docs (an idempotent
    // partition reload must not clobber the untouched languages)
    val en = docs.filter(col("lang") === "en")
    val half = en.filter(col("doc_id") % 2 === 0)
    half.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("lang").parquet(out)
    val after = spark.read.parquet(out)
      .groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(after("en") == half.count(), "en partition not replaced")
    (before.keySet - "en").foreach(l =>
      assert(after(l) == before(l), s"untouched partition $l changed"))
    // rerunning the same backfill is a no-op (idempotent reload)
    half.write.option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").partitionBy("lang").parquet(out)
    val again = spark.read.parquet(out).groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(again == after)
  }
}
