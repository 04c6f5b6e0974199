package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures.table

/** Hive-style partitioned layout — the OTHER physical-data-layout lever
  * next to bucketing ([[RelationalExt.bucketedJoin]]): a 100 TB event lake
  * is partitioned by date, and queries prune to the partitions they touch
  * instead of scanning the lake. Two driver-gated demonstrations:
  *
  *  - [[partitionPruned]]: STATIC pruning — a literal date-range predicate
  *    reaches the scan as a PartitionFilter (7 of 30 directories read; the
  *    other 23 are never listed into tasks). Plan-gated in PlanQualitySpec.
  *  - [[dppJoin]]: DYNAMIC partition pruning — the predicate lives on a
  *    dimension table (weekend days of a calendar dim), and Spark prunes
  *    the fact scan at RUNTIME from the broadcast join side
  *    (`dynamicpruningexpression` in the scan's PartitionFilters). This is
  *    the star-schema shape where the fact filter is not statically
  *    knowable — THE optimization that makes dim-filtered fact queries
  *    feasible at lake scale.
  *
  * The partitioned copy is written ONCE per (session, dir) under a
  * session-unique /tmp path and registered in the session catalog (same
  * amortized-ingest pattern as the bucketed tables: partitioning is paid at
  * ingest, every subsequent query prunes). The fixture's events span
  * exactly 30 days of 2024-01, so partition counts are stable across SFs.
  */
object PartitionedTables {

  /** The date-partitioned events table for `dir`, written on first use. */
  private def partitionedEvents(spark: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val name = s"graft_events_byday_$tag"
    if (!spark.catalog.tableExists(name)) {
      table(spark, dir, "events")
        .withColumn("event_date", col("ts").cast("timestamp").cast("date"))
        .write.partitionBy("event_date")
        .option("path",
          s"/tmp/graft_part/${spark.sparkContext.applicationId}/$name")
        .mode("overwrite").format("parquet").saveAsTable(name)
    }
    spark.table(name)
  }

  /** Static partition pruning: one literal week of the month — the scan
    * must read 7 of the 30 date directories and no more. */
  def partitionPruned(spark: SparkSession, dir: String): DataFrame =
    partitionedEvents(spark, dir)
      .filter(col("event_date").between("2024-01-05", "2024-01-11"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(28,10)")).cast("double").as("sum_value"))
      .orderBy("event_type")

  val partitionPrunedOracle: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-11'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Dynamic partition pruning: the day filter (weekends) lives on a
    * calendar dimension; the fact scan is pruned at runtime from the
    * broadcast dim side. 8 of 30 partitions read, decided by the join. */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = spark.range(31)
      .select(date_add(lit("2024-01-01").cast("date"), col("id").cast("int"))
        .as("event_date"))
      .withColumn("dow", expr("weekday(event_date)")) // 0 = Monday
      .filter(col("dow") >= 5)
      .select("event_date")
    partitionedEvents(spark, dir)
      .join(dim, "event_date")
      .groupBy("event_date", "event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_date", "event_type")
  }

  val dppJoinOracle: String =
    """WITH dim AS (
      |  SELECT CAST(unnest(generate_series(DATE '2024-01-01',
      |    DATE '2024-01-31', INTERVAL 1 DAY)) AS DATE) AS event_date
      |)
      |SELECT d.event_date, e.event_type, count(*) AS n_events,
      |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      |FROM events e
      |JOIN dim d ON CAST(e.ts AS DATE) = d.event_date
      |WHERE isodow(d.event_date) >= 6
      |GROUP BY d.event_date, e.event_type
      |ORDER BY d.event_date, e.event_type""".stripMargin
}
