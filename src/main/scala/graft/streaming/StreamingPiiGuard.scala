package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-time PII GUARD — the streaming twin of
  * [[graft.operators.TextAnalysis.piiRates]]'s detection layer, run as a
  * gate on arriving documents: a doc carrying an email or phone run is
  * diverted for redaction BEFORE it reaches a training shard, where
  * removing it later costs a takedown ([[graft.operators.Dedup.takedownManifest]]).
  * Emits (doc_id, source, n_emails, n_phones) for every flagged arrival —
  * the divert queue plus exactly the rows the batch rates table counts.
  *
  * Statelessness is the design constraint (the [[StreamingDecontaminate]]
  * precedent): both patterns are row-local regex counts — zero state
  * operators, no watermark, nothing to evict. The patterns are the batch
  * op's OWN constants (`TextAnalysis.EmailRe/PhoneRe`, character-class-only
  * so Java regex and RE2 agree) — one definition, so the guard and the
  * oracle-gated rates table can never drift; the stream==batch spec locks
  * the composition (streamed flags re-aggregated per source equal the
  * gated table's columns).
  *
  * At 100 TB the guard is a codegen'd projection per arriving file batch —
  * embarrassingly parallel, cost is the ingest scan it rides on.
  */
object StreamingPiiGuard {

  /** Flagged (PII-carrying) documents with per-kind match counts. Emails
    * count first and are masked before the phone pass, so an email's digit
    * runs can't double-count as phones — the batch op's exact order. */
  def flagged(spark: SparkSession, stagingDir: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    import graft.operators.TextAnalysis.{EmailRe, PhoneRe}
    spark.readStream
      .schema(StreamingDedup.documentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagingDir)
      .select(col("doc_id"), col("source"),
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
          .cast("bigint").as("n_emails"),
        size(regexp_extract_all(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          lit(PhoneRe), lit(0))).cast("bigint").as("n_phones"))
      .filter(col("n_emails") > 0L || col("n_phones") > 0L)
  }
}
