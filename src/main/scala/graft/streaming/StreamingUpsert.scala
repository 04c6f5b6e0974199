package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert sink: maintains a keyed parquet SNAPSHOT from a stream
  * via `foreachBatch` — the serving-table pattern (CDC apply, "latest state
  * per key") on a plain file sink, no table format required.
  *
  * Per micro-batch: collapse the batch to its latest row per key (ties
  * impossible when `orderCol` is unique per key within a batch), full-outer
  * merge into the current snapshot with batch rows winning, write to a
  * temp directory, then swap via two renames (current → `__old`, `__next` →
  * current) and delete `__old` last. Guarantees, precisely (ADVICE r5 —
  * the earlier delete-then-move form overstated them):
  *  - readers NEVER see half-written data: the new snapshot is fully
  *    materialized at `__next` before the current dir is touched;
  *  - a crash anywhere leaves a recoverable state: the old snapshot
  *    survives at the current path or at `__old`, and the next batch
  *    restores `__old` if the current path is missing;
  *  - a concurrent reader CAN still glimpse a missing directory during the
  *    two-rename window (directory renames cannot be made jointly atomic
  *    on a plain filesystem) — a table format (Delta/Iceberg) would close
  *    that gap with a metadata commit; the merge plan would be identical.
  * State lives in the snapshot, not the state store — restarts replay from
  * the checkpoint and re-merge idempotently (per-key last-writer-wins makes
  * re-application of a batch a no-op). */
object StreamingUpsert {

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }

  def start(stream: DataFrame, key: String, orderCol: String,
      snapDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val snap = Paths.get(snapDir)
        val trash = Paths.get(snapDir + "__old")
        // crash recovery: a previous run that died between its two renames
        // left the live snapshot at __old — restore it before merging
        if (!Files.exists(snap) && Files.exists(trash)) Files.move(trash, snap)
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged =
          if (Files.exists(snap)) {
            val cur = spark.read.parquet(snapDir)
            val u = latest.columns.foldLeft(latest)((d, c) => d.withColumnRenamed(c, s"u_$c"))
            cur.join(u, col(key) === col(s"u_$key"), "full_outer")
              .select(cur.columns.map(c => coalesce(col(s"u_$c"), col(c)).as(c)): _*)
          } else latest
        val tmp = snapDir + "__next"
        merged.write.mode("overwrite").parquet(tmp) // materializes BEFORE the old snapshot is touched
        deleteRecursively(trash) // stranded trash from an interrupted swap
        if (Files.exists(snap)) Files.move(snap, trash)
        Files.move(Paths.get(tmp), snap)
        deleteRecursively(trash)
        ()
      }
      .start()
}
