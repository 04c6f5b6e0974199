package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time ADMISSION SCREEN — the stream-STATIC join form of the batch
  * incremental-dedup exact stage ([[graft.operators.Dedup.bloomPrefilter]] /
  * `dedup_incremental`): documents arrive as micro-batches and only those
  * whose content hash is NOT already in the static reference corpus are
  * admitted downstream.
  *
  * This is the join topology Structured Streaming executes STATELESS — the
  * static side plans like any batch relation (broadcast here: 16 B md5 per
  * reference doc), the stream side probes per micro-batch, and no watermark
  * or join state is kept (unlike stream-stream joins, where both sides
  * buffer against lateness). The left-anti form needs no state because the
  * static side never changes mid-query; Spark re-plans the static relation
  * per micro-batch.
  *
  * At 100 TB the reference hash table outgrows broadcast range — the same
  * declaration becomes a shuffled stream-static join keyed on the 16 B
  * hash, still stateless; or put [[graft.operators.Dedup.bloomPrefilter]]'s
  * broadcast Bloom filter IN FRONT as a cheap pre-screen and anti-join only
  * the survivors.
  */
object StreamingAdmission {

  /** Admitted (novel-content) documents: stream ⟕̸ static reference on
    * md5(text) — left anti. `broadcastRef = false` drops the broadcast
    * hint — the declaration the 100 TB deployment runs, where the
    * reference hash table outgrows broadcast range and the planner picks
    * a SHUFFLED stream-static join (both forms stateless; spec'd under
    * `autoBroadcastJoinThreshold=-1` in `StreamingAdmissionSpec`). */
  def admitted(spark: SparkSession, stagingDir: String, referenceDir: String,
      maxFilesPerTrigger: Int = 1, broadcastRef: Boolean = true): DataFrame = {
    val ref = spark.read.parquet(s"$referenceDir/documents.parquet")
      .select(md5(col("text")).as("text_hash")).distinct()
    spark.readStream
      .schema(StreamingDedup.documentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagingDir)
      .withColumn("text_hash", md5(col("text")))
      .join(if (broadcastRef) broadcast(ref) else ref, Seq("text_hash"), "left_anti")
      .select(col("doc_id"), col("text_hash"), col("source"))
  }
}
