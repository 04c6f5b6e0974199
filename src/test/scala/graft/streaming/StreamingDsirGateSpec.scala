package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.operators.DataSelection

/** Streaming DSIR admission gate (round 13): row-local weights == the gated
  * batch importance weights, and the deployed threshold policy reproduces
  * the batch selection (modulo boundary-weight ties, which a threshold
  * admits and a rank cut splits). */
class StreamingDsirGateSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("row-local hashed-feature weights equal the gated join-shape weights, doc for doc") {
    val model = DataSelection.modelRow(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val rowLocal = StreamingDsirGate.weightProjection(docs, model)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val batch = DataSelection.dsirImportance(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rowLocal == batch,
      s"row-local/join weight divergence: ${rowLocal.toSeq.diff(batch.toSeq).take(3)}")
  }

  test("streamed admission equals batch gate; deployed thresholds reproduce the selection") {
    val model = DataSelection.modelRow(spark, dir).localCheckpoint(true)
    val thresholds = DataSelection.selectionThresholds(spark, dir).localCheckpoint(true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staged = StreamFixtures.stageSplit(docs, col("doc_id") % 2 === 0,
      "docs_dsir_gate_stream")
    val q = StreamingDsirGate.dsirGate(spark, staged, model, thresholds)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_dsir_gate").start()
    try {
      q.processAllAvailable()
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val streamed = rowsOf(spark.table("stream_dsir_gate"))
      val batch = rowsOf(StreamingDsirGate.gateSelect(docs, model, thresholds))
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
      // threshold deployment vs the rank-based batch selection: per source,
      // admitted = docs with weight >= threshold; the batch keeps exactly
      // ceil(n/10) by (weight, doc_id) — so admitted >= selected, and any
      // excess is exactly the boundary-weight tie mass
      val sel = DataSelection.dsirSelect(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val thr = thresholds.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val weights = DataSelection.dsirImportance(spark, dir).collect()
        .map(r => (r.getString(1), r.getLong(3)))
      streamed.foreach { case (src, (_, admitted, _)) =>
        val atLeast = weights.count { case (s, w) => s == src && w >= thr(src) }.toLong
        assert(admitted == atLeast, s"$src admitted $admitted != threshold count $atLeast")
        assert(admitted >= sel(src), s"$src admitted fewer than the batch selection")
        val boundaryTies = weights.count { case (s, w) => s == src && w == thr(src) }.toLong
        assert(admitted - sel(src) <= math.max(boundaryTies - 1, 0L),
          s"$src admits ${admitted - sel(src)} beyond selection but only $boundaryTies sit on the boundary")
      }
    } finally q.stop()
  }
}
