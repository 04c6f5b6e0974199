package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table IO — the engine's source/sink surface beyond the
  * parquet fixtures (SURVEY §2.1: the reference speaks only the Postgres
  * wire protocol; Spark's DataSource framework gives the engine
  * parquet/csv/json/orc for free, plus JDBC as the literal Postgres
  * equivalent when connectivity exists).
  *
  * Conventions chosen for lossless round-trips at scale:
  *  - csv/json always written with explicit schemas re-applied on read
  *    (inference is a full extra pass over the data — never rely on it);
  *  - csv carries a header and ISO-8601 timestamps;
  *  - all formats partition/split the same way downstream (the reader
  *    yields the same DataFrame contract regardless of format).
  */
object TableSources {

  sealed trait Format { def name: String }
  case object Parquet extends Format { val name = "parquet" }
  case object Csv extends Format { val name = "csv" }
  case object Json extends Format { val name = "json" }
  case object Orc extends Format { val name = "orc" }

  def read(spark: SparkSession, path: String, format: Format, schema: Option[StructType] = None): DataFrame = {
    val r0 = spark.read.format(format.name)
    val r1 = schema.fold(r0)(r0.schema)
    format match {
      case Csv => r1.option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").load(path)
      case _   => r1.load(path)
    }
  }

  def write(df: DataFrame, path: String, format: Format): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(format.name)
    format match {
      case Csv => w.option("header", "true").option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").save(path)
      case _   => w.save(path)
    }
  }

  /** Hive-style partitioned write: directory-per-value layout
    * (`path/col=value/part-*.parquet`). At 100 TB this is THE pruning
    * lever — a reader filtering on the partition column touches only the
    * matching directories (PartitionFilters in the scan, zero data files
    * read for pruned values), and the partition column is encoded in the
    * path, not stored in the files. Choose low-cardinality, always-filtered
    * columns (date, event_type, lang); never high-cardinality keys (one
    * directory per value is a small-files explosion). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      format: Format = Parquet): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .format(format.name)
      .save(path)

  /** Range-clustered write: global range partitioning + in-partition sort
    * on the cluster key before writing. Complements [[writePartitioned]]
    * for HIGH-cardinality keys where directory-per-value would explode:
    * each output file covers a disjoint key range, so parquet min/max
    * statistics let selective scans skip whole files/row-groups (the same
    * effect data-lake "z-order by one column" delivers). The
    * `repartitionByRange` sampling pass is one extra scan — amortized
    * across every future selective read. */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Z-ORDER clustered sink: multi-dimensional data skipping. A 1-D range
    * cluster ([[writeRangeClustered]]) makes ONE column's per-file min/max
    * ranges narrow; filters on any other column still read every file.
    * Z-ordering interleaves the bits of two quantile-normalized keys into a
    * single space-filling-curve value and range-clusters on THAT — each
    * file then covers a small rectangle of (x, y) space, so min/max
    * skipping works for filters on EITHER column (the technique behind
    * Delta/Iceberg `OPTIMIZE ZORDER BY`).
    *
    * Quantile normalization (robust to skew) comes from mergeable
    * approx-quantile sketches, NOT a global rank window — an ungrouped
    * `ntile` would serialize the whole table through one task, the exact
    * anti-pattern the equi-depth histogram had to shed. The 255 boundary
    * values are broadcast as an array literal and each row buckets itself
    * with a count-boundaries-below fold: shuffle-free normalization, then
    * one range partition on the z-value. 8 bits per dimension = 65k curve
    * cells, plenty beyond any practical file count. */
  def writeZOrdered(df: DataFrame, path: String, colX: String, colY: String,
      numFiles: Int): Unit = {
    import org.apache.spark.sql.functions._
    val bits = 8
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    def bucketOf(c: String): org.apache.spark.sql.Column = {
      val bounds = df.stat.approxQuantile(c, probs, 0.001)
      aggregate(
        array(bounds.map(lit(_)): _*), lit(0L),
        (acc, b) => acc + when(df.col(c).cast("double") > b, 1L).otherwise(0L))
    }
    val nx = bucketOf(colX)
    val ny = bucketOf(colY)
    val interleaved = (0 until bits).map { i =>
      (shiftleft(shiftright(nx, i) % 2, 2 * i) +
        shiftleft(shiftright(ny, i) % 2, 2 * i + 1)): org.apache.spark.sql.Column
    }.reduce(_ + _)
    df.withColumn("__z", interleaved)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** JDBC source — the literal equivalent of the reference's Postgres
    * connection (`/root/reference/src/listTables.tsx:184-201`). The option
    * surface mirrors the reference's env config; the path is exercised by
    * an embedded-Derby round-trip spec (no network database exists in the
    * container, but the JDBC relation/dialect machinery is identical). */
  def readJdbc(spark: SparkSession, url: String, dbtable: String,
      user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
      .load()

  /** JDBC sink, completing the round-trip surface. At scale, bound the
    * write parallelism (`numPartitions` option / `df.coalesce`) — every
    * task opens its own connection and most databases fall over long
    * before 1000 concurrent writers. */
  def writeJdbc(df: DataFrame, url: String, dbtable: String,
      user: String, password: String): Unit =
    df.write.mode(SaveMode.Overwrite).format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
      .save()
}
