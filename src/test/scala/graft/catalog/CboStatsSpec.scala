package graft.catalog

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Catalog statistics + cost-based planning: ANALYZE TABLE populates
  * row/size/column statistics, and the optimizer consumes them. At 100 TB
  * this is how join ordering and broadcast decisions stop depending on
  * file-size heuristics — ANALYZE runs as a cheap scheduled job and every
  * subsequent query plans against real cardinalities.
  */
class CboStatsSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("ANALYZE TABLE populates row count, size, and column stats the planner sees") {
    val orders = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet")
    val expectedRows = orders.count()
    spark.sql("DROP TABLE IF EXISTS stats_orders")
    orders.write.mode("overwrite").saveAsTable("stats_orders")
    spark.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR COLUMNS o_orderkey, o_custkey")

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("stats_orders").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expectedRows)),
        s"rowCount=${stats.rowCount}, expected $expectedRows")
      assert(stats.sizeInBytes > 0)
      assert(stats.attributeStats.nonEmpty, "expected column-level statistics")
      val ndvKey = stats.attributeStats.collectFirst {
        case (attr, s) if attr.name == "o_orderkey" => s.distinctCount
      }.flatten
      // o_orderkey is unique: NDV estimate should be ~rowCount (the ANALYZE
      // HLL runs at default precision — observed ~7% error at this size)
      assert(ndvKey.exists(n => (n - BigInt(expectedRows)).abs <= BigInt((expectedRows * 0.10).toLong + 1)),
        s"o_orderkey NDV=$ndvKey, expected ≈$expectedRows")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.sql("DROP TABLE IF EXISTS stats_orders")
    }
  }
}
