package graft.profile

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{CatalogEntry, TableEnumerator}

/** Profile of one column: optional MIN/MAX (numeric/temporal) and optional
  * tri-state TRUE/FALSE counts (boolean). Mirrors the reference `ColumnInfo`
  * (`/root/reference/src/listTables.tsx:13-20`) but keeps values typed instead
  * of `::text`-stringified.
  */
case class ColumnProfile(
    name: String,
    dataType: DataType,
    clazz: ColumnClass,
    min: Option[Any],
    max: Option[Any],
    trueCount: Option[Long],
    falseCount: Option[Long])

/** Row-count result: estimated (metadata-only), exact (full count), or a
  * per-table failure (rendered `"error"`, listTables.tsx:367-369,485-487). */
sealed trait RowCountResult
case class EstimatedRows(n: Long) extends RowCountResult
case class ExactRows(n: Long) extends RowCountResult
case object CountError extends RowCountResult

/** Mirrors the reference `TableView` (listTables.tsx:22-29). */
case class TableProfile(
    schema: String,
    table: String,
    columnCount: Int,
    rows: RowCountResult,
    columns: Seq[ColumnProfile])

/** The profiling engine.
  *
  * Where the reference issues one SQL round-trip (= one full table scan) PER
  * profiled column (`/root/reference/src/listTables.tsx:236-251,310-325` — the
  * N+1 anti-pattern called out in SURVEY §4.1), this engine computes every
  * column's MIN/MAX and every boolean histogram in ONE fused `agg()` — a
  * single column-pruned scan per table, partial-aggregated map-side, with one
  * tiny shuffle to the final aggregate. At 100 TB that's the difference
  * between k scans and 1.
  */
object Profiler {

  /** Columns (by table name) that are bigint nanos-since-epoch and should be
    * profiled as temporal (FIXTURES.md gotcha #1). */
  val DefaultNanosColumns: Map[String, Set[String]] = Map("events" -> Set("ts"))

  private def q(name: String): Column = col(s"`$name`")

  /** Build the fused aggregation list for a schema: MIN/MAX per
    * numeric/temporal column, tri-state TRUE/FALSE counts per boolean column,
    * plus `COUNT(*)`. Returns (aggs, perColumnClass).
    */
  def fusedAggs(schema: StructType, nanosCols: Set[String]): (Seq[Column], Seq[(StructField, ColumnClass)]) = {
    val classed = schema.fields.toSeq.map { f =>
      f -> ColumnClassifier.classify(f.dataType, nanosCols.contains(f.name),
        ColumnClassifier.isTimeOfDay(f))
    }
    val aggs = classed.flatMap {
      case (f, ColumnClass.Numeric | ColumnClass.Temporal | ColumnClass.TemporalNanos |
               ColumnClass.TemporalTime) =>
        Seq(min(q(f.name)).as(s"min__${f.name}"), max(q(f.name)).as(s"max__${f.name}"))
      case (f, ColumnClass.Bool) =>
        // `col IS TRUE` / `col IS FALSE` tri-state semantics (listTables.tsx:314-315):
        // NULLs fall in neither bucket.
        Seq(
          sum(when(q(f.name) <=> lit(true), 1L).otherwise(0L)).as(s"true__${f.name}"),
          sum(when(q(f.name) <=> lit(false), 1L).otherwise(0L)).as(s"false__${f.name}"))
      case _ => Seq.empty
    }
    (aggs :+ count(lit(1)).as("rows__"), classed)
  }

  /** Profile one DataFrame in a single pass. */
  def profileDataFrame(
      df: DataFrame,
      schemaName: String,
      tableName: String,
      exact: Boolean,
      estimatedRows: => Long,
      nanosCols: Set[String] = Set.empty): TableProfile = {
    val (aggs, classed) = fusedAggs(df.schema, nanosCols)
    val row: Row = df.agg(aggs.head, aggs.tail: _*).collect()(0)

    def opt(fieldName: String): Option[Any] = {
      val idx = row.fieldIndex(fieldName)
      if (row.isNullAt(idx)) None else Some(row.get(idx))
    }

    val cols = classed.map {
      case (f, cls @ (ColumnClass.Numeric | ColumnClass.Temporal | ColumnClass.TemporalNanos |
                      ColumnClass.TemporalTime)) =>
        ColumnProfile(f.name, f.dataType, cls, opt(s"min__${f.name}"), opt(s"max__${f.name}"), None, None)
      case (f, ColumnClass.Bool) =>
        ColumnProfile(f.name, f.dataType, ColumnClass.Bool, None, None,
          opt(s"true__${f.name}").map(_.asInstanceOf[Long]),
          opt(s"false__${f.name}").map(_.asInstanceOf[Long]))
      case (f, cls) => ColumnProfile(f.name, f.dataType, cls, None, None, None, None)
    }

    val rows =
      if (exact) ExactRows(row.getLong(row.fieldIndex("rows__")))
      else EstimatedRows(math.max(0L, estimatedRows)) // GREATEST(…, 0) clamp (listTables.tsx:339)
    TableProfile(schemaName, tableName, df.schema.length, rows, cols)
  }

  /** Profile every table under a data root.
    *
    * Tables are profiled concurrently from driver threads (the Spark scheduler
    * interleaves the per-table jobs across executor slots) — unlike the
    * reference's strictly sequential per-column loop. Per-table errors are
    * isolated, mirroring listTables.tsx:248-250,485-487: a broken table yields
    * `CountError`/empty stats instead of killing the run.
    */
  def profileRoot(
      spark: SparkSession,
      root: String,
      exact: Boolean,
      nanosColumns: Map[String, Set[String]] = DefaultNanosColumns,
      parallelism: Int = 8): Seq[TableProfile] = {
    val entries = TableEnumerator.list(spark, root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val futures = entries.map { e =>
        Future(profileEntry(spark, e, exact, nanosColumns.getOrElse(e.name, Set.empty)))
      }
      futures.map(f => Await.result(f, Duration.Inf))
    } finally pool.shutdown()
  }

  private def profileEntry(
      spark: SparkSession,
      e: CatalogEntry,
      exact: Boolean,
      nanosCols: Set[String]): TableProfile =
    Try {
      val df = spark.read.parquet(e.path)
      profileDataFrame(df, e.schema, e.name, exact,
        estimatedRows = TableEnumerator.footerRowCount(spark, e.path), nanosCols)
    } match {
      case Success(p) => p
      case Failure(_) =>
        // Error isolation: still emit the table with an error-marked count.
        TableProfile(e.schema, e.name, 0, CountError, Seq.empty)
    }

  /** FOOTER-MODE profile of one table: MIN/MAX of pushdown-eligible columns
    * (numerics/dates — [[FooterAgg.pushable]]) and the row count come from
    * parquet footer statistics via DSv2 aggregate pushdown, and the
    * NON-pushable range types (timestamp/timestamp_ntz) are answered by
    * reading footer statistics directly ([[FooterAgg.footerMinMax]]) — so
    * every range column is served with ZERO rows scanned. A residual fused
    * scan remains only for boolean tri-state counts (no footer form) or a
    * file with unusable stats. Same TableProfile out, so the renderer and
    * goldens are unaffected. This is the engine's literal analog of the
    * reference's "single, fast catalog query" estimated mode
    * (`/root/reference/README.md:8`) — except the footer numbers are exact,
    * not planner estimates. */
  def profileEntryFooter(
      spark: SparkSession,
      e: CatalogEntry,
      nanosCols: Set[String]): TableProfile =
    Try {
      val df = spark.read.parquet(e.path)
      val classed = df.schema.fields.toSeq.map { f =>
        f -> ColumnClassifier.classify(f.dataType, nanosCols.contains(f.name))
      }
      def profiled(cls: ColumnClass): Boolean = cls match {
        case ColumnClass.Numeric | ColumnClass.Temporal | ColumnClass.TemporalNanos => true
        case _ => false
      }
      val footerCols = classed.collect {
        case (f, cls) if profiled(cls) && FooterAgg.pushable(f.dataType) => f.name
      }
      val footerRow: Row = FooterAgg.stats(spark, e.path, footerCols).collect()(0)
      def footerOpt(fieldName: String): Option[Any] = {
        val idx = footerRow.fieldIndex(fieldName)
        if (footerRow.isNullAt(idx)) None else Some(footerRow.get(idx))
      }
      // non-pushable profiled columns (timestamp/timestamp_ntz): try the
      // DIRECT footer statistics first — with them served, the only class
      // still needing rows is Bool (tri-state counts have no footer form)
      val nonPushable = classed.collect {
        case (f, cls) if profiled(cls) && !FooterAgg.pushable(f.dataType) => f.name
      }
      val directFooter: Map[String, Option[(Any, Any)]] =
        FooterAgg.footerMinMax(spark, e.path, nonPushable)
      // residual scan only for profiled columns NEITHER footer path serves
      val residual = classed.filter {
        case (f, cls) => (profiled(cls) && !FooterAgg.pushable(f.dataType) &&
          !directFooter.contains(f.name)) || cls == ColumnClass.Bool
      }
      val residualRow: Option[Row] =
        if (residual.isEmpty) None
        else {
          val aggs = residual.flatMap {
            case (f, ColumnClass.Bool) => Seq(
              sum(when(q(f.name) <=> lit(true), 1L).otherwise(0L)).as(s"true__${f.name}"),
              sum(when(q(f.name) <=> lit(false), 1L).otherwise(0L)).as(s"false__${f.name}"))
            case (f, _) =>
              Seq(min(q(f.name)).as(s"min__${f.name}"), max(q(f.name)).as(s"max__${f.name}"))
          }
          Some(df.agg(aggs.head, aggs.tail: _*).collect()(0))
        }
      def resOpt(fieldName: String): Option[Any] = residualRow.flatMap { r =>
        val idx = r.fieldIndex(fieldName)
        if (r.isNullAt(idx)) None else Some(r.get(idx))
      }
      val cols = classed.map {
        case (f, cls) if profiled(cls) && FooterAgg.pushable(f.dataType) =>
          ColumnProfile(f.name, f.dataType, cls,
            footerOpt(s"min_${f.name}"), footerOpt(s"max_${f.name}"), None, None)
        case (f, cls) if profiled(cls) =>
          directFooter.get(f.name) match {
            case Some(served) => ColumnProfile(f.name, f.dataType, cls,
              served.map(_._1), served.map(_._2), None, None)
            case None => ColumnProfile(f.name, f.dataType, cls,
              resOpt(s"min__${f.name}"), resOpt(s"max__${f.name}"), None, None)
          }
        case (f, ColumnClass.Bool) =>
          ColumnProfile(f.name, f.dataType, ColumnClass.Bool, None, None,
            resOpt(s"true__${f.name}").map(_.asInstanceOf[Long]),
            resOpt(s"false__${f.name}").map(_.asInstanceOf[Long]))
        case (f, cls) => ColumnProfile(f.name, f.dataType, cls, None, None, None, None)
      }
      val nRows = footerRow.getLong(footerRow.fieldIndex("n_rows"))
      TableProfile(e.schema, e.name, df.schema.length, EstimatedRows(math.max(0L, nRows)), cols)
    } match {
      case Success(p) => p
      case Failure(_) => TableProfile(e.schema, e.name, 0, CountError, Seq.empty)
    }

  /** Footer-mode profile of every table under a data root (opt-in via
    * `ProfileMain --footer-stats`). */
  def profileRootFooter(
      spark: SparkSession,
      root: String,
      nanosColumns: Map[String, Set[String]] = DefaultNanosColumns): Seq[TableProfile] =
    TableEnumerator.list(spark, root).map(e =>
      profileEntryFooter(spark, e, nanosColumns.getOrElse(e.name, Set.empty)))
}
