package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Streaming IVF maintenance (round 12): stream == batch == the GATED
  * ann_ivf_incremental table. */
class StreamingIvfMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("streamed maintenance table equals the gated batch ivfIncremental row-for-row") {
    val centroids = StreamingIvfMaintenance.frozenCentroids(spark, dir)
    assert(centroids.size == 16 && centroids.forall(_._2.length == 64))
    // split at the base/new boundary: batch 0 = the base index, batch 1 =
    // the arrivals — the production replay order
    val staged = StreamFixtures.stageSplit(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      col("vec_id") < 400, "emb_ivf_stream")
    val q = StreamingIvfMaintenance.maintain(spark, staged, centroids)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_ivf_maint").start()
    try {
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("stream_ivf_maint"))
      val batch = rowsOf(
        graft.operators.Similarity.ivfIncremental(spark, dir))
      assert(streamed == batch,
        s"stream/batch divergence: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
      assert(streamed.nonEmpty && streamed.values.exists(_._2 > 0),
        "arrivals should land in some cell")
    } finally q.stop()
  }

  test("mid-stream state: after batch 0 only base vectors are assigned") {
    val centroids = StreamingIvfMaintenance.frozenCentroids(spark, dir)
    val staged = StreamFixtures.stageSplit(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      col("vec_id") < 400, "emb_ivf_stream2")
    // batch twin restricted to the base set = what the stream must show
    // after its first micro-batch
    val base = rowsOf(StreamingIvfMaintenance.maintenanceSelect(
      spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") < 400),
      centroids, 400L))
    assert(base.values.forall(_._2 == 0L), "no arrivals yet -> n_new all zero")
    // and the full stream result strictly extends it (cells only gain)
    val q = StreamingIvfMaintenance.maintain(spark, staged, centroids)
      .writeStream.outputMode("complete").format("memory")
      .queryName("stream_ivf_maint2").start()
    try {
      q.processAllAvailable()
      val full = rowsOf(spark.table("stream_ivf_maint2"))
      base.foreach { case (cell, (nb, _, _, bm, _, _)) =>
        assert(full(cell)._1 == nb, s"cell $cell base count changed")
        assert(full(cell)._4 == bm, s"cell $cell base mean changed")
      }
    } finally q.stop()
  }

  test("n_base = 0 guard: an arrivals-only state emits zeros, never NULLs") {
    // the batch invariant (each centroid sits in its own cell) does not
    // hold mid-stream: an arrivals-first feed reaches a state where some
    // cell has n_base = 0 — the guarded projections must stay non-NULL
    val centroids = StreamingIvfMaintenance.frozenCentroids(spark, dir)
    val out = StreamingIvfMaintenance.maintenanceSelect(
      spark.read.parquet(s"$dir/embeddings.parquet").filter(col("vec_id") >= 400),
      centroids, 400L).collect()
    assert(out.nonEmpty, "arrivals must land somewhere")
    out.foreach { r =>
      assert(!r.anyNull, s"guarded projections must not emit NULL: $r")
      assert(r.getLong(r.fieldIndex("n_base")) == 0L)
      assert(r.getLong(r.fieldIndex("growth_permille")) == 0L)
      assert(r.getLong(r.fieldIndex("base_mean_micro")) == 0L)
      assert(r.getLong(r.fieldIndex("drift_permille")) == 0L)
    }
  }

  test("degenerate: a single frozen centroid absorbs everything") {
    val centroids = StreamingIvfMaintenance.frozenCentroids(spark, dir, nCentroids = 1)
    val out = StreamingIvfMaintenance.maintenanceSelect(
      spark.read.parquet(s"$dir/embeddings.parquet"), centroids, 400L).collect()
    assert(out.length == 1 && out(0).getLong(0) == centroids.head._1)
  }
}
