package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Streaming token accounting (round 13): stream == batch == the counting
  * core of the GATED text_tokenize_bpe table. */
class StreamingTokenRateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("streamed totals equal the gated batch tokenizeBpe counting core") {
    val staged = StreamFixtures.stageSplit(
      spark.read.parquet(s"$dir/documents.parquet"),
      col("doc_id") % 2 === 0, "docs_tokenrate_stream")
    val q = StreamingTokenRate.tokenTotals(spark, staged)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_token_rate").start()
    try {
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("stream_token_rate")
        .select("lang", "source", "n_docs", "chars", "bpe_tokens",
          "alpha_words", "regex_tokens"))
      val batch = rowsOf(graft.operators.TextAnalysis.tokenizeBpe(spark, dir)
        .select("lang", "source", "n_docs", "chars", "bpe_tokens",
          "alpha_words", "regex_tokens"))
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
      assert(streamed.nonEmpty && streamed.values.exists(_._3 > 0),
        "some slice should carry BPE tokens")
    } finally q.stop()
  }

  test("mid-stream state: after batch 0 only even doc_ids are counted") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staged = StreamFixtures.stageSplit(
      docs, col("doc_id") % 2 === 0, "docs_tokenrate_stream2")
    val firstBatch = rowsOf(StreamingTokenRate.tokenTotalsSelect(
      docs.filter(col("doc_id") % 2 === 0)))
    val q = StreamingTokenRate.tokenTotals(spark, staged)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_token_rate2").start()
    try {
      q.processAllAvailable()
      val full = rowsOf(spark.table("stream_token_rate2"))
      // the full stream strictly extends batch 0: every slice's doc count
      // can only grow, and totals are monotone in docs
      firstBatch.foreach { case (k, (n0, c0, b0, _, _)) =>
        val (n1, c1, b1, _, _) = full(k)
        assert(n1 >= n0 && c1 >= c0 && b1 >= b0, s"slice $k shrank")
      }
    } finally q.stop()
  }
}
