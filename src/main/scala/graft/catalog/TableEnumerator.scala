package graft.catalog

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** One table in the data-root catalog. */
case class CatalogEntry(schema: String, name: String, path: String)

/** Catalog enumeration over a directory of parquet tables — the engine's
  * analog of the reference's `pg_class`/`information_schema` scans
  * (`/root/reference/src/listTables.tsx:329-348,256-267`). Ordering matches
  * the reference's `ORDER BY table_schema, table_name` (`:345`).
  */
object TableEnumerator {

  /** List `<root>/<name>.parquet` entries (files or directories). */
  def list(spark: SparkSession, root: String, schema: String = "public"): Seq[CatalogEntry] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath)
      .filter(st => st.getPath.getName.endsWith(".parquet") && !st.getPath.getName.startsWith("_"))
      .map(st => CatalogEntry(schema, st.getPath.getName.stripSuffix(".parquet"), st.getPath.toString))
      .sortBy(e => (e.schema, e.name))
      .toSeq
  }

  /** Estimated row count from parquet footer metadata only — no data pages
    * are read. This is the engine's analog of `pg_class.reltuples`
    * (`/root/reference/src/listTables.tsx:336-345`), except parquet footers
    * are exact, so "estimated" mode is both fast AND right.
    *
    * Footers are read on the driver for small file counts and distributed
    * over executors above [[DistributeThreshold]] — at 100 TB a table can
    * have 10⁵–10⁶ files and a driver-side loop would be the bottleneck.
    */
  def footerRowCount(spark: SparkSession, tablePath: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val files = dataFiles(conf, new Path(tablePath))
    if (files.size <= DistributeThreshold) files.map(f => footerCount(conf, f)).sum
    else {
      // executors must see the SESSION's Hadoop conf (credentials, fs
      // schemes) — a default Configuration() works on local paths only
      val props = confProps(conf)
      spark.sparkContext
        .parallelize(files.map(_.toString), math.max(1, files.size / 16))
        .mapPartitions { it =>
          val c = confFromProps(props)
          it.map(p => footerCount(c, new Path(p)))
        }
        .sum()
        .toLong
    }
  }

  /** Hadoop Configuration ⇄ serializable props, for shipping the session's
    * filesystem settings into executor-side footer reads. */
  private[graft] def confProps(conf: Configuration): Seq[(String, String)] = {
    val it = conf.iterator()
    val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
    b.result()
  }

  private[graft] def confFromProps(props: Seq[(String, String)]): Configuration = {
    val c = new Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private[graft] val DistributeThreshold = 64

  private[graft] def dataFiles(conf: Configuration, p: Path): Seq[Path] = {
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p)
    else
      fs.listStatus(p)
        .iterator
        .filter(s => !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .flatMap(s => if (s.isDirectory) dataFiles(conf, s.getPath) else Seq(s.getPath))
        .toSeq
  }

  private def footerCount(conf: Configuration, file: Path): Long = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getRecordCount
    finally reader.close()
  }
}
