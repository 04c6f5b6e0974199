package graft.profile

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction planner — the table-maintenance chore every lake
  * runs nightly: bin-pack a table's data files into target-size groups so
  * one rewrite pass turns N small files into ⌈Σbytes/target⌉ right-sized
  * ones (small files poison scan planning: one Spark task per file, footer
  * overhead per file, and row-group-sized reads that never amortize).
  *
  * Deterministic first-fit-decreasing over the FILE LISTING — metadata, not
  * data: at 100 TB a table's manifest is ~10⁵-10⁷ entries, which is
  * driver/catalog scale by construction (the same place Spark's own
  * `InMemoryFileIndex` holds it); FFD is O(n log n) and ≤ (11/9)·OPT + 1
  * bins. The plan is a pure function of (sizes, target) — rerun-stable,
  * so it can gate a rewrite job idempotently. Files already ≥ target are
  * emitted as their own single-file bins (rewriting them would be wasted
  * IO) and flagged `already_compact`.
  */
object CompactionPlan {

  case class Bin(id: Long, files: Long, bytes: Long, alreadyCompact: Boolean)

  /** FFD core over (name, bytes) pairs — unit-testable without a filesystem. */
  def packFFD(files: Seq[(String, Long)], targetBytes: Long): Seq[Bin] = {
    val (big, small) = files.sortBy { case (n, b) => (-b, n) }
      .partition(_._2 >= targetBytes)
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (files, bytes)
    small.foreach { case (_, b) =>
      bins.indexWhere(_._2 + b <= targetBytes) match {
        case -1 => bins += ((1L, b))
        case i  => bins(i) = (bins(i)._1 + 1, bins(i)._2 + b)
      }
    }
    val bigBins = big.map(f => Bin(-1, 1L, f._2, alreadyCompact = true))
    val packed = bins.map(b => Bin(-1, b._1, b._2, alreadyCompact = false)).toSeq
    (bigBins ++ packed).sortBy(b => (-b.bytes, b.files))
      .zipWithIndex.map { case (b, i) => b.copy(id = i.toLong) }
  }

  /** Plan for one fixture table's parquet directory (or single file). */
  def plan(spark: SparkSession, dir: String, tableName: String = "documents",
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val p = new Path(s"$dir/$tableName.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[(String, Long)] =
      if (fs.getFileStatus(p).isFile) Seq((p.getName, fs.getFileStatus(p).getLen))
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.getName, s.getLen))
    packFFD(files, targetBytes)
      .map(b => (b.id, b.files, b.bytes,
        b.bytes * 1000 / targetBytes, b.alreadyCompact))
      .toDF("bin_id", "n_files", "total_bytes", "fill_permille", "already_compact")
  }
}
