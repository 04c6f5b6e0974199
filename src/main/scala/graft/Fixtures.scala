package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table metadata shared by the Spark query builders and the DuckDB
  * oracle-SQL generators, so both sides stay in lockstep (see TESTDATA.md /
  * FIXTURES.md — schemas are driver-generated and stable).
  */
object Fixtures {

  /** Inferred-schema memo: `spark.read.parquet` runs a footer-inference
    * Spark job on EVERY call, so each query construction was paying one
    * tiny driver job per table touched (and plan-only consumers could
    * never be job-free). Fixtures are immutable per round, so the schema
    * is read once per (session, path) and replayed via `.schema(...)`,
    * which skips inference entirely. Keyed on the session identity because
    * session confs (e.g. nanosAsLong) change what a footer infers to. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = System.identityHashCode(spark) + "|" + path
    val schema = schemaCache.computeIfAbsent(key, _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    // Under `spark.sql.legacy.parquet.nanosAsLong` a TIMESTAMP(NANOS)
    // `events.ts` arrives as LongType (nanos since epoch). Every event
    // operator assumes the TIMESTAMP(MICROS)-NTZ shape of the current
    // fixtures, and `cast(bigint as timestamp)` would silently misread
    // nanos as SECONDS (ADVICE r8) — so re-shape once, at the read
    // boundary: nanos → micros → the same NTZ wall-clock dtype the
    // MICROS fixture produces (identity under the UTC session). The
    // profiler layer reads parquet directly and keeps its documented
    // nanos-as-bigint profile semantics.
    if (name == "events" && df.schema.fieldNames.contains("ts") &&
        df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000"))
        .cast("timestamp_ntz"))
    else df
  }

  /** Spread a CPU-bound derivation across cores when the input parquet
    * reads as fewer splits than the session's parallelism — the local
    * single-row-group fixtures read as ONE scan task, serializing every
    * downstream explode/partial-aggregate on one core (guide §2.5: input
    * skew from an unsplittable file → repartition after the read). No-op
    * (no shuffle node) when the scan already yields core-count splits, so
    * at production split counts nothing changes. Round-robin repartition
    * is deterministic (sort-before-repartition), so results are
    * partitioning-independent for any deterministic derivation. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // `df.rdd.getNumPartitions` forces a physical-plan translation on the
    // driver per call (and a file listing at real scale) — VERDICT r16
    // "what's wrong" #4. Every spread() call site is a scan-rooted
    // projection over an immutable fixture dir, so the split-count verdict
    // is constant per (session, semantic plan): memoize it. Key is the
    // analyzed plan's semanticHash — a collision could only flip a
    // repartition decision (performance, never results).
    val key = System.identityHashCode(df.sparkSession) + "|" +
      df.queryExecution.analyzed.semanticHash()
    val few = spreadCache.computeIfAbsent(key, _ => df.rdd.getNumPartitions < p)
    if (few) df.repartition(p) else df
  }

  private val spreadCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  val allTables: Seq[String] = Seq(
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier")

  /** Numeric (range-profiled) columns per table — SURVEY §2.1 S3. */
  val numericCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "orders"   -> Seq("o_orderkey", "o_custkey", "o_totalprice"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_acctbal"),
    "supplier" -> Seq("s_suppkey", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_size", "p_retailprice"),
    "nation"   -> Seq("n_nationkey", "n_regionkey"),
    "region"   -> Seq("r_regionkey"),
    "documents" -> Seq("doc_id", "n_chars"),
    "embeddings" -> Seq("vec_id", "label"),
    "events"   -> Seq("event_id", "user_id", "value"))

  /** Temporal (month-year-range) columns per table. */
  val temporalCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_shipdate"),
    "orders"   -> Seq("o_orderdate"))
}
