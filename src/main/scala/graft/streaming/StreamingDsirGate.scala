package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DataSelection

/** Streaming DSIR ADMISSION GATE — the micro-batch twin of the gated
  * `docs_dsir_select` policy, deployed the way a firehose actually deploys
  * it: the fitted bucket model FROZEN as one broadcast row
  * ([[DataSelection.modelRow]] — 512 map entries at ANY corpus size, the
  * hashed-feature guarantee) plus the per-source weight thresholds the
  * batch selection calibrated ([[DataSelection.selectionThresholds]] — the
  * rank-based top-decile cut converted to its threshold form). Arriving raw
  * documents are featurized and weighted ROW-LOCALLY (unigrams + adjacent
  * bigrams, same md5-prefix hash, exact integer micro-units — numerically
  * IDENTICAL to the batch join-shape weight, spec-refereed doc-for-doc),
  * then admitted iff weight ≥ the source's calibrated threshold; a source
  * with no calibration admits nothing (curation never auto-admits an
  * unknown stratum).
  *
  * Shape: weighting is a STATELESS per-row projection (`aggregate` over the
  * feature array with `element_at` on the broadcast map), the threshold
  * lookup is a stream-static broadcast equi-join on `source`, and the only
  * stateful operator is one groupBy(source) with map-side partials — state
  * bounded by |source| (complete mode). This is also the honest 100 TB
  * batch shape: at cluster scale the SELECTION side of dsir_select runs
  * exactly this scan-with-frozen-thresholds, the rank windows exist to
  * CALIBRATE, not to deploy.
  */
object StreamingDsirGate {

  /** Running per-source admission totals over a directory-fed document
    * stream, under the frozen bucket model + calibrated thresholds. */
  def dsirGate(spark: SparkSession, docsDir: String, model: DataFrame,
      thresholds: DataFrame, maxFilesPerTrigger: Int = 1): DataFrame =
    gateSelect(
      spark.readStream
        .schema(StreamingDedup.documentsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(docsDir), model, thresholds)

  /** Row-local featurize + weight under the frozen model — the shared
    * projection the referee spec compares against the batch
    * `docs_dsir_importance` weights doc-for-doc. Mirrors the batch
    * featurization exactly: unigrams from the non-empty whitespace split,
    * bigrams from ADJACENT raw positions with both sides non-empty. */
  private[streaming] def weightProjection(df: DataFrame, model: DataFrame): DataFrame =
    df.filter(!col("source").isin(DataSelection.TargetSources: _*))
      .crossJoin(broadcast(model))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("feats", expr(
        """concat(
          | filter(ws, w -> w <> ''),
          | filter(transform(slice(ws, 1, greatest(size(ws) - 1, 0)),
          |   (w, i) -> IF(w <> '' AND element_at(ws, i + 2) <> '',
          |     concat(w, ' ', element_at(ws, i + 2)), NULL)),
          |  x -> x IS NOT NULL))""".stripMargin.replace("\n", "")))
      .filter(size(col("feats")) >= 1)
      .withColumn("weight_micro", expr(
        s"""CAST(aggregate(feats, CAST(0 AS DECIMAL(38,0)),
           | (acc, f) -> acc + coalesce(element_at(model,
           |     CAST(conv(substring(md5(f), 1, 6), 16, 10) AS BIGINT) % ${DataSelection.NumBuckets}),
           |   default_micro),
           | acc -> acc) div size(feats) AS BIGINT)""".stripMargin.replace("\n", "")))
      .select(col("doc_id"), col("source"),
        size(col("feats")).cast("bigint").as("n_feats"), col("weight_micro"))

  /** The shared projection + threshold join + aggregate — one code path,
    * stream and batch. */
  private[streaming] def gateSelect(df: DataFrame, model: DataFrame,
      thresholds: DataFrame): DataFrame =
    weightProjection(df, model)
      .join(broadcast(thresholds), Seq("source"), "left")
      .withColumn("admit",
        col("threshold_micro").isNotNull &&
          col("weight_micro") >= col("threshold_micro"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("admit"), 1L).otherwise(0L)).as("n_admitted"),
        sum(col("weight_micro")).as("sum_weight_micro"))
}
