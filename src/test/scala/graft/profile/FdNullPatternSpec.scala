package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Invariants for FD discovery and the missingness profile. */
class FdNullPatternSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("fd discovery: the primary key determines every other column") {
    val rows = ProfileQueries.fdDiscovery(spark, SparkSuite.Sf0001).collect()
    assert(rows.length == 30) // 6 columns, all directed pairs
    val fromKey = rows.filter(_.getAs[String]("det") == "o_orderkey")
    assert(fromKey.length == 5 && fromKey.forall(_.getAs[Boolean]("holds")))
    // o_orderkey is unique: n_groups from the key == row count
    val n = spark.read.parquet(s"${SparkSuite.Sf0001}/orders.parquet").count()
    assert(fromKey.forall(_.getAs[Long]("n_groups") == n))
    // status (3-ish values) cannot determine the key on any non-trivial table
    val bad = rows.find(r => r.getAs[String]("det") == "o_orderstatus" &&
      r.getAs[String]("dep") == "o_orderkey").get
    assert(!bad.getAs[Boolean]("holds"))
  }

  test("null patterns: 4-bit masks partitioning all rows") {
    val rows = ProfileQueries.nullPatterns(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("null_pattern").matches("[01]{4}")))
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == spark.read.parquet(s"${SparkSuite.Sf0001}/events.parquet").count())
    // user_id is never null -> every pattern starts with 0
    assert(rows.forall(_.getAs[String]("null_pattern").startsWith("0")))
  }
}
