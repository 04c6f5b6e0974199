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

  /** Property gate for [[plan]] (VERDICT r9 #4): the bin-packing invariants
    * as literal-TRUE booleans under the DuckDB oracle, so the sequential
    * FFD family's guarantee sits in the DRIVER ledger, not only in
    * `CompactionPlanSpec`. Checked over the emitted plan + the raw listing:
    *  - `bytes_conserved` — Σ bin bytes == Σ file bytes (nothing dropped);
    *  - `files_conserved` — Σ bin file counts == file count;
    *  - `no_overfull_bin` — every packed (non-already-compact) bin fits the
    *    target, and every already-compact bin is a single ≥-target file;
    *  - `ffd_bound_ok` — packed-bin count ≤ (11·OPT)/9 + 1 with
    *    OPT = ⌈small-bytes/target⌉ (the published FFD guarantee);
    *  - `ids_dense` — bin_id is exactly 0..n-1. */
  def planGate(spark: SparkSession, dir: String, tableName: String = "documents",
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = new Path(s"$dir/$tableName.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listing: Seq[Long] =
      if (fs.getFileStatus(p).isFile) Seq(fs.getFileStatus(p).getLen)
      else fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getLen)
    val smallTotal = listing.filter(_ < targetBytes).sum
    val opt = (smallTotal + targetBytes - 1) / targetBytes
    plan(spark, dir, tableName, targetBytes).agg(
      (sum(col("total_bytes")) === lit(listing.sum)).as("bytes_conserved"),
      (sum(col("n_files")) === lit(listing.size.toLong)).as("files_conserved"),
      coalesce(min(when(col("already_compact"),
          col("n_files") === 1L && col("total_bytes") >= targetBytes)
        .otherwise(col("total_bytes") <= targetBytes)), lit(true)).as("no_overfull_bin"),
      (count(when(!col("already_compact"), 1)) <= lit(11L * opt / 9L + 1L)).as("ffd_bound_ok"),
      (count(lit(1)) === count_distinct(col("bin_id")) &&
        min(col("bin_id")) === 0L && max(col("bin_id")) === count(lit(1)) - 1L)
        .as("ids_dense"))
  }

  val planGateOracle: String =
    """SELECT TRUE AS bytes_conserved, TRUE AS files_conserved,
      |       TRUE AS no_overfull_bin, TRUE AS ffd_bound_ok,
      |       TRUE AS ids_dense""".stripMargin
}
