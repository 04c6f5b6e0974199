package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Streaming quality gate (round 13): stream == batch == the scoring core
  * of the GATED quality_classifier_confusion row, under the frozen model. */
class StreamingQualityGateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("row-local map scoring equals the gated join-shape score, doc for doc") {
    val model = graft.operators.QualityClassifier.modelRow(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val mapScores = StreamingQualityGate.scoreProjection(docs, model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val joinScores = graft.operators.QualityClassifier.perDocScores(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapScores == joinScores,
      s"map/join scoring divergence: ${
        mapScores.toSeq.diff(joinScores.toSeq).take(3)} vs ${
        joinScores.toSeq.diff(mapScores.toSeq).take(3)}")
  }

  test("streamed admission totals equal the batch gate under the frozen model") {
    val model = graft.operators.QualityClassifier.modelRow(spark, dir)
      .localCheckpoint(true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staged = StreamFixtures.stageSplit(docs, col("doc_id") % 2 === 0,
      "docs_quality_gate_stream")
    val q = StreamingQualityGate.qualityGate(spark, staged, model)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_quality_gate").start()
    try {
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("stream_quality_gate"))
      val batch = rowsOf(StreamingQualityGate.gateSelect(docs, model))
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
      assert(streamed.values.map(_._1).sum > 0)
      // the gate must actually discriminate: some source admits fewer docs
      // than it sees (the trained model rejects at least someone)
      assert(streamed.values.exists { case (n, pos, _) => pos < n },
        "gate admitted everything — no discrimination")
    } finally q.stop()
  }

  test("mid-stream state: totals only grow across the batch boundary") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.operators.QualityClassifier.modelRow(spark, dir)
      .localCheckpoint(true)
    val firstBatch = rowsOf(StreamingQualityGate.gateSelect(
      docs.filter(col("doc_id") % 2 === 0), model))
    val staged = StreamFixtures.stageSplit(docs, col("doc_id") % 2 === 0,
      "docs_quality_gate_stream2")
    val q = StreamingQualityGate.qualityGate(spark, staged, model)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_quality_gate2").start()
    try {
      q.processAllAvailable()
      val full = rowsOf(spark.table("stream_quality_gate2"))
      firstBatch.foreach { case (k, (n0, p0, s0)) =>
        val (n1, p1, s1) = full(k)
        assert(n1 >= n0 && p1 >= p0 && s1 >= s0, s"source $k shrank")
      }
    } finally q.stop()
  }
}
