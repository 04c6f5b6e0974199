package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming QUALITY GATE — the micro-batch twin of the gated
  * `quality_classifier_confusion` row's scoring core: documents ARRIVE as a
  * stream and each is scored row-locally against the FROZEN trained NB
  * model ([[graft.operators.QualityClassifier.modelRow]] — word→ratio map +
  * unseen fallback, one broadcastable row, the StreamingIvfMaintenance
  * frozen-centroid pattern). The sink holds the running per-source
  * admission table: docs seen, docs the trained model admits (`score >
  * 10⁶`), and the running score mass — the ingest-side gate a curation
  * pipeline actually runs between model refreshes.
  *
  * Shape: scoring is a STATELESS per-row projection — `aggregate` over the
  * token array with `element_at` on the broadcast map column, exact integer
  * micro-units, numerically IDENTICAL to the batch join-shape score
  * (Σ tf·ratio div Σ tf; spec-refereed row-for-row) — so the only stateful
  * operator is one groupBy(source) with map-side partials; state is bounded
  * by |source| (complete mode). The batch side scores through a vocab-keyed
  * shuffle join (the 100 TB shape for a full-corpus rescore); the stream
  * side trades that for a vocab-bounded broadcast, the right shape when
  * rows arrive one micro-batch at a time.
  */
object StreamingQualityGate {

  /** Running per-source admission totals over a directory-fed document
    * stream, scored under the frozen `model` (one row: map + fallback). */
  def qualityGate(spark: SparkSession, docsDir: String, model: DataFrame,
      maxFilesPerTrigger: Int = 1): DataFrame =
    gateSelect(
      spark.readStream
        .schema(StreamingDedup.documentsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(docsDir), model)

  /** Per-doc row-local scoring under the frozen model — the shared
    * projection (one code path, stream and batch) the referee spec compares
    * against [[graft.operators.QualityClassifier.perDocScores]]. */
  private[streaming] def scoreProjection(df: DataFrame, model: DataFrame): DataFrame =
    df.crossJoin(broadcast(model))
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .filter(size(col("ws")) >= 1)
      .withColumn("score_micro", expr(
        """CAST(aggregate(ws, CAST(0 AS DECIMAL(38,0)),
          | (acc, w) -> acc + coalesce(element_at(model, w), unseen_micro),
          | acc -> acc) div size(ws) AS BIGINT)""".stripMargin.replace("\n", "")))
      .select(col("doc_id"), col("source"), col("score_micro"))

  /** The shared projection + aggregate — one code path, stream and batch. */
  private[streaming] def gateSelect(df: DataFrame, model: DataFrame): DataFrame =
    scoreProjection(df, model)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score_micro") > graft.operators.QualityClassifier.DecisionMicro, 1L).otherwise(0L)).as("n_pred_pos"),
        sum(col("score_micro")).as("sum_score_micro"))
}
