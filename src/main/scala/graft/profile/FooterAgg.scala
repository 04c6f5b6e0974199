package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metadata-only column statistics via DataSource-v2 parquet AGGREGATE
  * PUSHDOWN: MIN/MAX/COUNT are answered from parquet footer statistics —
  * zero row groups decompressed, zero rows scanned. This is the engine's
  * true "estimated mode" fast path (the reference's analog reads
  * `pg_class.reltuples`, `/root/reference/src/listTables.tsx:336-345`):
  * at 100 TB a footer-only profile touches kilobytes per file instead of
  * the data itself.
  *
  * Requires the v2 reader (`spark.sql.sources.useV1SourceList=""`) and
  * `spark.sql.parquet.aggregatePushdown=true`, applied in a CLONED session
  * so the engine's default v1 path (and every other query) is untouched.
  * Spark only pushes MIN/MAX for types whose footer stats are reliable
  * (numeric/date — notably NOT strings, whose stats may be truncated);
  * callers pass eligible columns. Falls back transparently (Spark keeps
  * the plan correct either way — pushdown is an optimization, the spec
  * asserts it actually engaged). */
object FooterAgg {

  /** Types whose MIN/MAX Spark's parquet pushdown will answer from footers
    * (probed empirically: numerics and dates push; timestamp/ timestamp_ntz
    * and strings do NOT — ntz for precision-mapping reasons, strings
    * because footer stats may be truncated). */
  def pushable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.NumericType => true
    case org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  def stats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val v2 = spark.newSession()
    v2.conf.set("spark.sql.sources.useV1SourceList", "")
    v2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val df = v2.read.parquet(path)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+ count("*").as("n_rows")
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** MIN/MAX straight from parquet footer STATISTICS for columns whose
    * types Spark's DSv2 aggregate pushdown declines — closing the footer
    * mode's last row-scan (timestamp/timestamp_ntz ranges previously paid
    * a residual scan per table). Only footers are opened
    * (`ParquetFileReader` metadata); row-group stats merge across files —
    * the same mergeable-partials shape as [[stats]], driver-side below
    * [[graft.catalog.TableEnumerator.DistributeThreshold]] files and
    * distributed over executors above it.
    *
    * Returns ONLY the columns the footer can serve exactly: a present key
    * maps to `Some((min, max))`, or `None` when every value is null. An
    * ABSENT key means "not servable from footers" and the caller must fall
    * back to a scan — notably strings (parquet may TRUNCATE binary stats,
    * so they are never trusted as exact ranges, the same reason Spark's
    * pushdown declines them) and any file lacking statistics. */
  def footerMinMax(spark: SparkSession, tablePath: String,
      cols: Seq[String]): Map[String, Option[(Any, Any)]] = {
    import graft.catalog.TableEnumerator
    if (cols.isEmpty) return Map.empty
    val conf = spark.sparkContext.hadoopConfiguration
    val files = TableEnumerator.dataFiles(conf, new org.apache.hadoop.fs.Path(tablePath))
    if (files.isEmpty) return Map.empty
    val perFile: Seq[Map[String, FooterStat]] =
      if (files.size <= TableEnumerator.DistributeThreshold)
        files.map(f => fileMinMax(conf, f, cols))
      else {
        // ship the session's Hadoop conf (credentials, fs schemes) to the
        // executors — a default Configuration() resolves local paths only
        val props = TableEnumerator.confProps(conf)
        spark.sparkContext
          .parallelize(files.map(_.toString), math.max(1, files.size / 16))
          .mapPartitions { it =>
            val c = TableEnumerator.confFromProps(props)
            it.map(p => fileMinMax(c, new org.apache.hadoop.fs.Path(p), cols))
          }
          .collect().toSeq
      }
    cols.flatMap { c =>
      val stats = perFile.map(_(c))
      if (stats.contains(Unusable)) None
      else {
        val ranges = stats.collect { case HasRange(mn, mx) => (mn, mx) }
        // schema evolution can hand the same column DIFFERENT stat classes
        // per file (INT32 → Integer in one footer, INT64 → Long in another):
        // the cross-file compareTo then throws ClassCastException. Degrade
        // to footer-unusable for THIS column only — the residual scan picks
        // it up — instead of letting the throw void the whole table's
        // profile including the row count already served (ADVICE r6).
        try {
          val merged: Option[(Any, Any)] =
            if (ranges.isEmpty) None // all files all-null: served, empty range
            else Some((
              ranges.map(_._1).minBy(identity)(comparableOrdering),
              ranges.map(_._2).maxBy(identity)(comparableOrdering)))
          Some(c -> merged)
        } catch { case _: ClassCastException => None }
      }
    }.toMap
  }

  private val comparableOrdering: Ordering[Any] =
    (a: Any, b: Any) => a.asInstanceOf[Comparable[Any]].compareTo(b)

  /** Per-file footer verdict for one column. */
  private sealed trait FooterStat extends Serializable
  private case object Unusable extends FooterStat
  private case object AllNull extends FooterStat
  private case class HasRange(min: Any, max: Any) extends FooterStat

  private def fileMinMax(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path, cols: Seq[String]): Map[String, FooterStat] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      cols.map { c =>
        val verdict: FooterStat =
          if (!schema.containsField(c)) Unusable
          else {
            val field = schema.getType(Seq(c): _*)
            if (!field.isPrimitive) Unusable
            else {
              val prim = field.asPrimitiveType()
              val chunkStats = footer.getBlocks.asScala.toSeq.map { block =>
                block.getColumns.asScala
                  .find(_.getPath.toDotString == c)
                  .map(_.getStatistics).orNull
              }
              if (chunkStats.exists(s => s == null || s.isEmpty)) Unusable
              else {
                val nonNull = chunkStats.filter(_.hasNonNullValue)
                if (nonNull.isEmpty) AllNull
                else {
                  val mins = nonNull.map(s => convertStat(prim, s.genericGetMin))
                  val maxs = nonNull.map(s => convertStat(prim, s.genericGetMax))
                  if (mins.contains(None)) Unusable
                  else HasRange(
                    mins.flatten.min(comparableOrdering),
                    maxs.flatten.max(comparableOrdering))
                }
              }
            }
          }
        c -> verdict
      }.toMap
    } finally reader.close()
  }

  /** Footer value → the Java value a Spark scan would put in a Row for the
    * same column, so footer-served profiles render byte-identically to
    * scan-served ones. None = type not handled exactly (caller scans). */
  private def convertStat(prim: org.apache.parquet.schema.PrimitiveType,
      v: Any): Option[Any] = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import java.time.{Instant, LocalDateTime, ZoneOffset}
    prim.getLogicalTypeAnnotation match {
      case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        // a corrupt/sentinel footer value (e.g. Long.MaxValue millis from a
        // broken writer) must yield None → Unusable → residual scan, not an
        // ArithmeticException that degrades the whole table to CountError
        try {
          val micros = ts.getUnit match {
            case TimeUnit.MILLIS => Math.multiplyExact(v.asInstanceOf[Long], 1000L)
            case TimeUnit.MICROS => v.asInstanceOf[Long]
            case TimeUnit.NANOS  => return Some(v.asInstanceOf[Long]) // nanosAsLong: read AS bigint
          }
          val instant = Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
          if (ts.isAdjustedToUTC) Some(java.sql.Timestamp.from(instant))
          else Some(LocalDateTime.ofInstant(instant, ZoneOffset.UTC))
        } catch { case _: ArithmeticException | _: java.time.DateTimeException => None }
      case null => v match {
        // plain numerics (no annotation): already the scan-visible value
        case _: java.lang.Long | _: java.lang.Integer |
             _: java.lang.Double | _: java.lang.Float => Some(v)
        case _ => None
      }
      case _ => None // decimal/date/string/etc: pushable via stats() or untrusted
    }
  }
}
