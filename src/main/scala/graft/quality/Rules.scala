package graft.quality

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures

/** Declarative data-quality validation rules — the engine form of the
  * reference's profiling mission and the north star's "data quality
  * monitoring as Spark jobs running validation queries" (BASELINE.json).
  *
  * Evaluation strategy, sized for 100 TB:
  *  - every ROW-LEVEL rule on a table (not-null, range, set, expression)
  *    compiles to one `sum(violation)` term in a SINGLE fused aggregation —
  *    one scan per table regardless of rule count, exactly like the
  *    profiler's stat fusion;
  *  - UNIQUE rules are one hash group-by on the key (counted, not
  *    collected);
  *  - FOREIGN-KEY rules are one left-anti join per edge, broadcast when the
  *    parent is small.
  *
  * Every rule has a deterministic violation count, so the whole suite is
  * DuckDB-oracle-checkable ([[QualitySuite.oracleSql]] generates the twin
  * from the same rule objects).
  */
sealed trait Rule {
  def name: String
  /** SQL boolean predicate (portable Spark/DuckDB) a row must satisfy;
    * None for non-row-level rules. */
  def rowPredicate: Option[String]
}

/** Column must be non-null. */
case class NotNull(column: String) extends Rule {
  val name = s"not_null($column)"
  val rowPredicate = Some(s"$column IS NOT NULL")
}

/** Numeric column within [lo, hi] (nulls don't violate — pair with NotNull). */
case class InRange(column: String, lo: Double, hi: Double) extends Rule {
  val name = s"in_range($column,$lo,$hi)"
  val rowPredicate = Some(s"$column IS NULL OR ($column >= $lo AND $column <= $hi)")
}

/** String column drawn from an allowed set. */
case class InSet(column: String, values: Seq[String]) extends Rule {
  val name = s"in_set($column)"
  val rowPredicate = Some(
    s"$column IS NULL OR $column IN (${values.map(v => s"'$v'").mkString(", ")})")
}

/** Arbitrary row-level SQL predicate (portable syntax only). */
case class ExprRule(name: String, predicate: String) extends Rule {
  val rowPredicate = Some(predicate)
}

/** Key column(s) must be unique; violations = rows beyond the first in each
  * duplicate group. */
case class Unique(columns: Seq[String]) extends Rule {
  val name = s"unique(${columns.mkString(",")})"
  val rowPredicate = None
}

/** TABLE-LEVEL rule: a boolean SQL predicate over aggregates (portable
  * Spark/DuckDB — e.g. `max(ts) >= DATE '...'` for freshness,
  * `count(c) = count(*)` for completeness, `count(DISTINCT c) BETWEEN lo
  * AND hi` for cardinality). Violations = 0 or 1. Fuses into the same
  * single-scan aggregate as the row-level rules (Deequ-style analyzers,
  * one pass). */
case class AggRule(name: String, aggPredicate: String) extends Rule {
  val rowPredicate = None
}

object AggRule {
  /** Freshness: the newest value of `column` is at or after `minDate`
    * (compared at DATE granularity — portable across ntz/ltz literal
    * semantics). */
  def freshness(column: String, minDate: String): AggRule =
    AggRule(s"freshness($column,$minDate)",
      s"CAST(max($column) AS DATE) >= DATE '$minDate'")

  /** Completeness: at least `permille`/1000 of rows have a non-null
    * `column` (integer math — no float thresholds). */
  def completeness(column: String, permille: Int): AggRule =
    AggRule(s"completeness($column,$permille)",
      s"count($column) * 1000 >= count(*) * $permille")

  /** Cardinality: exact distinct count of `column` within [lo, hi].
    * COST NOTE: a distinct aggregate makes Spark Expand the fused scan
    * (×2 row multiplication on this table) — intended for LOW-cardinality
    * enum-like columns; bound a high-cardinality column with the sketch
    * profile's HLL instead. */
  def ndvBetween(column: String, lo: Long, hi: Long): AggRule =
    AggRule(s"ndv_between($column,$lo,$hi)",
      s"count(DISTINCT $column) BETWEEN $lo AND $hi")
}

/** Referential integrity: every non-null child value exists in the parent. */
case class ForeignKey(column: String, parentTable: String, parentColumn: String) extends Rule {
  val name = s"fk($column->$parentTable.$parentColumn)"
  val rowPredicate = None
}

object QualityRunner {

  /** Evaluate a rule suite. Returns (table_name, rule, violations, passed),
    * ordered. Cost model, per table: ONE scan evaluates every row-level
    * rule AND every foreign-key rule together — each FK becomes a left
    * join against the parent's broadcast-distinct key set (at most one
    * match per row, so no multiplication) and a `sum(when(orphan))` term in
    * the same fused aggregate. Only Unique rules need their own hash
    * group-by on the key. */
  def run(spark: SparkSession, dir: String, suite: Seq[(String, Seq[Rule])]): DataFrame = {
    val results: Seq[DataFrame] = suite.flatMap { case (tableName, rules) =>
      val df = Fixtures.table(spark, dir, tableName)
      val rowRules = rules.filter(_.rowPredicate.isDefined)
      val fkRules = rules.collect { case f: ForeignKey => f }
      val aggRules = rules.collect { case a: AggRule => a }
      val fusedResult: Option[DataFrame] =
        if (rowRules.isEmpty && fkRules.isEmpty && aggRules.isEmpty) None
        else {
          // LOAD-BEARING `.distinct()` (ADVICE r9): every row-level AND
          // AggRule aggregate below is evaluated over `withParents`, so the
          // FK left joins MUST be row-preserving — distinct parent keys
          // guarantee ≤1 match per child row. Joining the raw parent would
          // silently inflate count(*) (completeness, ndv thresholds) the
          // first time a suite names a non-unique parent column.
          val withParents = fkRules.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
            val parent = Fixtures.table(spark, dir, f.parentTable)
              .select(col(f.parentColumn).as(s"__parent_$i")).distinct()
            acc.join(broadcast(parent), col(f.column) === col(s"__parent_$i"), "left")
          }
          val aggs = rowRules.map(r =>
            sum(when(!expr(r.rowPredicate.get), 1L).otherwise(0L)).as(r.name)) ++
            fkRules.zipWithIndex.map { case (f, i) =>
              sum(when(col(f.column).isNotNull && col(s"__parent_$i").isNull, 1L)
                .otherwise(0L)).as(f.name)
            } ++
            // table-level rules ride the SAME fused aggregate: the CASE
            // wraps aggregate expressions, so it is still one scan
            aggRules.map(a =>
              expr(s"CAST(CASE WHEN ${a.aggPredicate} THEN 0 ELSE 1 END AS BIGINT)").as(a.name))
          val row = withParents.agg(aggs.head, aggs.tail: _*)
          // unpivot the one-row agg into (rule, violations)
          val fused = rowRules ++ fkRules ++ aggRules
          val stacked = fused.map(r =>
            s"'${r.name.replace("'", "''")}', `${r.name}`").mkString(", ")
          Some(row.selectExpr(
            s"stack(${fused.size}, $stacked) AS (rule, violations)")
            .select(lit(tableName).as("table_name"), col("rule"), col("violations")))
        }
      val uniques: Seq[DataFrame] = rules.collect {
        case u @ Unique(cols) =>
          val dupExtras = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
            .filter(col("c") > 1)
            .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
          dupExtras.select(lit(tableName).as("table_name"), lit(u.name).as("rule"), col("violations"))
      }
      fusedResult.toSeq ++ uniques
    }
    results.reduce(_ unionAll _)
      .withColumn("passed", col("violations") === 0L)
      .orderBy("table_name", "rule")
  }

  /** DuckDB oracle for the same suite — generated from the same rule
    * objects so Spark and oracle can't drift. */
  def oracleSql(suite: Seq[(String, Seq[Rule])]): String = {
    def quoted(name: String) = name.replace("'", "''")
    val selects = suite.flatMap { case (tableName, rules) =>
      rules.map {
        case r if r.rowPredicate.isDefined =>
          s"""SELECT '$tableName' AS table_name, '${quoted(r.name)}' AS rule,
             |  count(*) FILTER (WHERE NOT (${r.rowPredicate.get})) AS violations
             |FROM $tableName""".stripMargin
        case u @ Unique(cols) =>
          s"""SELECT '$tableName' AS table_name, '${quoted(u.name)}' AS rule,
             |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS violations
             |FROM (SELECT count(*) AS c FROM $tableName GROUP BY ${cols.mkString(", ")}) g
             |WHERE c > 1""".stripMargin
        case f @ ForeignKey(c, pTable, pCol) =>
          s"""SELECT '$tableName' AS table_name, '${quoted(f.name)}' AS rule,
             |  count(*) AS violations
             |FROM $tableName t
             |WHERE t.$c IS NOT NULL
             |  AND NOT EXISTS (SELECT 1 FROM $pTable p WHERE p.$pCol = t.$c)""".stripMargin
        case a: AggRule =>
          s"""SELECT '$tableName' AS table_name, '${quoted(a.name)}' AS rule,
             |  CAST(CASE WHEN ${a.aggPredicate} THEN 0 ELSE 1 END AS BIGINT) AS violations
             |FROM $tableName""".stripMargin
        case other => sys.error(s"unhandled rule $other")
      }
    }
    s"""SELECT table_name, rule, violations, violations = 0 AS passed FROM (
       |${selects.mkString("\nUNION ALL\n")}
       |) ORDER BY table_name, rule""".stripMargin
  }
}

/** The fixture validation suite: the checks a data-quality monitor would
  * run on this schema. `in_range(l_tax, 0, 0.05)` is intentionally violated
  * (fixture max is 0.08) so the pipeline demonstrably DETECTS, not just
  * passes. */
object QualitySuite {

  val suite: Seq[(String, Seq[Rule])] = Seq(
    "lineitem" -> Seq(
      NotNull("l_orderkey"),
      InRange("l_quantity", 1, 50),
      InRange("l_discount", 0, 0.1),
      InRange("l_tax", 0, 0.05), // intentionally failing: fixture max is 0.08
      ExprRule("price_positive", "l_extendedprice > 0"),
      ForeignKey("l_orderkey", "orders", "o_orderkey"),
      ForeignKey("l_partkey", "part", "p_partkey"),
      ForeignKey("l_suppkey", "supplier", "s_suppkey")),
    "orders" -> Seq(
      Unique(Seq("o_orderkey")),
      InSet("o_orderstatus", Seq("F", "O", "P")),
      ExprRule("totalprice_positive", "o_totalprice > 0"),
      ForeignKey("o_custkey", "customer", "c_custkey"),
      AggRule.freshness("o_orderdate", "2001-06-01"), // passes: max is 2001-08-01
      // intentionally failing freshness: the monitor must DETECT staleness
      AggRule.freshness("o_orderdate", "2002-01-01")),
    "customer" -> Seq(
      NotNull("c_custkey"),
      Unique(Seq("c_custkey")),
      ForeignKey("c_nationkey", "nation", "n_nationkey")),
    "nation" -> Seq(
      Unique(Seq("n_nationkey")),
      ForeignKey("n_regionkey", "region", "r_regionkey")),
    "events" -> Seq(
      NotNull("event_id"),
      Unique(Seq("event_id")),
      InSet("event_type", Seq("click", "error", "purchase", "signup", "view")),
      ExprRule("value_non_negative", "value >= 0"),
      AggRule.completeness("value", 1000)),
    "documents" -> Seq(
      Unique(Seq("doc_id")),
      ExprRule("n_chars_matches_text", "n_chars = length(text)"),
      InSet("lang", Seq("de", "en", "es", "fr", "zh")),
      AggRule.ndvBetween("lang", 5, 5)),
    "embeddings" -> Seq(
      Unique(Seq("vec_id")),
      InRange("label", 0, 9)))

  def run(spark: SparkSession, dir: String): DataFrame =
    QualityRunner.run(spark, dir, suite)

  def oracle: String = QualityRunner.oracleSql(suite)
}
