package graft

import org.apache.spark.sql.SparkSession

/** One place for every session conf the engine depends on.
  *
  * - `nanosAsLong`: kept so TIMESTAMP(NANOS) parquet inputs read (as bigint
  *   nanos) instead of failing; the `events` fixture itself is
  *   TIMESTAMP(MICROS) ntz since the round-8 testdata regen, where this flag
  *   is inert. A genuine nanos `events.ts` is re-shaped to the same
  *   micros-NTZ dtype at the [[graft.Fixtures.table]] read boundary (ADVICE
  *   r8) — operators never see the raw long.
  * - UTC session TZ + English month names: reference formats all temporal
  *   output with UTC getters (`/root/reference/src/listTables.tsx:158-167`).
  * - 32 shuffle partitions: sized for local[32]; on a real cluster this is
  *   overridden per-deploy (AQE coalesces the tail either way).
  */
object GraftSession {

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // derive sorted output from sortBy-bucketed scans (one file per bucket):
    // the SMJ over co-located buckets then needs neither Exchange nor Sort.
    // Off by default since 3.0 only because it lists files at planning time
    // — the deliberate tradeoff of a sorted-bucket warehouse layout.
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.ui.enabled", "false")

  def local(threads: Int = 32): SparkSession = {
    val spark = configure(
      SparkSession.builder().master(s"local[$threads]").appName("graft")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
