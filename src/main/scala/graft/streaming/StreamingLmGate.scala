package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CCNet-TERCILE GATE — the micro-batch twin of the
  * `docs_ccnet_deployed` CLASSIFY path, deployed the way a firehose deploys
  * a quality bucketer: the unigram LM frozen as one broadcast map row
  * ([[graft.operators.TextAnalysis.lmModelRow]] — struct(lang, word) →
  * rarity_micro, vocab-bounded by Zipf) plus the per-language tercile score
  * boundaries the batch rank policy calibrated
  * ([[graft.operators.TextAnalysis.lmBoundaries]]). Arriving documents are
  * scored ROW-LOCALLY (one `aggregate` fold over the token array, exact
  * integer micro-units — numerically IDENTICAL to the batch tf-weighted
  * mean, spec-refereed doc-for-doc) and bucketed by the broadcast
  * boundaries: scan + broadcast join + CASE, no window, no shuffle of the
  * stream beyond one |lang|×3-state aggregate. This IS the plan the batch
  * deployed gate certifies — the streaming twin runs the certified form.
  *
  * Unseen words (impossible when scoring the training corpus, routine on a
  * live stream) take the hapax-equivalent fallback: rarity =
  * 10⁶·lang_tokens (frequency-1 treatment, documented on [[graft.operators.TextAnalysis.lmBoundaries]]);
  * a document in a language the model never saw carries NULL boundaries and
  * classifies tail — curation never auto-promotes an unknown stratum.
  */
object StreamingLmGate {

  /** Running per-(lang, bucket) totals over a directory-fed document
    * stream, under the frozen LM + calibrated boundaries. */
  def lmGate(spark: SparkSession, docsDir: String, model: DataFrame,
      boundaries: DataFrame, maxFilesPerTrigger: Int = 1): DataFrame =
    gateSelect(
      spark.readStream
        .schema(StreamingDedup.documentsSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(docsDir), model, boundaries)

  /** Row-local LM score under the frozen model — the shared projection the
    * referee spec compares against the batch `docs_ccnet_buckets`
    * score_micro doc-for-doc. The token-array fold equals the batch
    * tf-weighted mean exactly: Σ_positions rarity(w) = Σ_words tf·rarity. */
  private[streaming] def scoreProjection(df: DataFrame, model: DataFrame,
      boundaries: DataFrame): DataFrame =
    df.join(broadcast(boundaries), Seq("lang"), "left")
      .crossJoin(broadcast(model))
      .withColumn("ws", expr("filter(split(text, ' '), w -> w <> '')"))
      .filter(size(col("ws")) >= 1)
      .withColumn("score_micro", expr(
        """CAST(aggregate(ws, CAST(0 AS DECIMAL(38,0)),
          | (acc, w) -> acc + coalesce(
          |   element_at(model, named_struct('lang', lang, 'word', w)),
          |   (CAST(1000000 AS DECIMAL(38,0)) * lang_tokens) div 1),
          | acc -> acc) div size(ws) AS BIGINT)""".stripMargin.replace("\n", "")))
      .withColumn("bucket",
        when(col("score_micro") <= col("head_thr_micro"), "head")
          .when(col("score_micro") <= col("mid_thr_micro"), "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"),
        size(col("ws")).cast("bigint").as("n_tokens"),
        col("score_micro"), col("bucket"))

  /** The shared projection + bucket aggregate — one code path, stream and
    * batch. State is |languages|×3 rows (complete mode). */
  private[streaming] def gateSelect(df: DataFrame, model: DataFrame,
      boundaries: DataFrame): DataFrame =
    scoreProjection(df, model, boundaries)
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum("score_micro").as("sum_score_micro"))
}
