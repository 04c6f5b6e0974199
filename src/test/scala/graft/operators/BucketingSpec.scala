package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Bucketing = co-located joins: writing both sides bucketed on the join
  * key lets the sort-merge join read matching buckets directly — ZERO
  * exchanges in the joined plan. This is the pre-partitioning strategy for
  * repeatedly-joined 100 TB fact tables, demonstrated here end-to-end:
  * write bucketed, join, assert the physical plan is exchange-free, and
  * assert the result matches the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("bucketed tables join without any shuffle exchange") {
    val dir = SparkSuite.Sf0001
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    // force the sort-merge path (broadcast would trivially avoid shuffles);
    // the conf must stay set through planning AND execution (both lazy)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle: the only exchange allowed is the
      // one for the final groupBy aggregation
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges <= 1, s"expected at most the aggregation exchange, got $exchanges:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected a bucketed sort-merge join:\n$plan")

      // and the result is identical to the plain (shuffling) join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
