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
}
