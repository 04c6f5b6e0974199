package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** ORC round-trip — the one [[TableSources.Format]] that had no spec: every
  * fixture table writes to ORC and reads back row-identical and
  * schema-identical, and ORC scans get the same predicate pushdown the
  * parquet path relies on.
  */
class OrcRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("every fixture table round-trips through ORC bit-identically") {
    val base = Files.createTempDirectory("orc_rt").toString
    for (t <- graft.Fixtures.allTables) {
      val orig = spark.read.parquet(s"${SparkSuite.Sf0001}/$t.parquet")
      TableSources.write(orig, s"$base/$t", TableSources.Orc)
      val back = TableSources.read(spark, s"$base/$t", TableSources.Orc)
      assert(back.schema == orig.schema, s"$t: schema drift ${back.schema} vs ${orig.schema}")
      assert(back.count() == orig.count(), s"$t: row count drift")
      assert(orig.exceptAll(back).isEmpty && back.exceptAll(orig).isEmpty,
        s"$t: content drift through ORC")
    }
  }

  test("ORC scans push predicates like parquet scans do") {
    val base = Files.createTempDirectory("orc_push").toString
    TableSources.write(
      spark.read.parquet(s"${SparkSuite.Sf0001}/lineitem.parquet"),
      s"$base/lineitem", TableSources.Orc)
    val df = TableSources.read(spark, s"$base/lineitem", TableSources.Orc)
      .filter(col("l_quantity") > 45.0).select("l_orderkey")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no file scan in ORC plan"))
    assert(scan.dataFilters.nonEmpty, "filter did not reach the ORC scan")
    assert(scan.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"),
      s"ORC scan reads ${scan.requiredSchema.fieldNames.mkString(",")}")
  }
}
