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
  * temp directory, then atomically swap. The swap (write-new → delete-old →
  * rename) keeps readers from ever seeing a half-written snapshot; a table
  * format (Delta/Iceberg) would replace the swap with a metadata commit but
  * the merge plan is identical. State lives in the snapshot, not the state
  * store — restarts replay from the checkpoint and re-merge idempotently
  * (per-key last-writer-wins makes re-application of a batch a no-op). */
object StreamingUpsert {

  def start(stream: DataFrame, key: String, orderCol: String,
      snapDir: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged =
          if (Files.exists(Paths.get(snapDir))) {
            val cur = spark.read.parquet(snapDir)
            val u = latest.columns.foldLeft(latest)((d, c) => d.withColumnRenamed(c, s"u_$c"))
            cur.join(u, col(key) === col(s"u_$key"), "full_outer")
              .select(cur.columns.map(c => coalesce(col(s"u_$c"), col(c)).as(c)): _*)
          } else latest
        val tmp = snapDir + "__next"
        merged.write.mode("overwrite").parquet(tmp) // materializes BEFORE the old snapshot is touched
        val old = Paths.get(snapDir)
        if (Files.exists(old)) {
          Files.walk(old).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
        }
        Files.move(Paths.get(tmp), old)
        ()
      }
      .start()
}
