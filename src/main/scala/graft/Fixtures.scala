package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table metadata shared by the Spark query builders and the DuckDB
  * oracle-SQL generators, so both sides stay in lockstep (see TESTDATA.md /
  * FIXTURES.md — schemas are driver-generated and stable).
  */
object Fixtures {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

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
