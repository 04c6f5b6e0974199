package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Retrieval-quality gate for PQ/ADC on PLANTED cluster structure.
  *
  * The fixture embedding corpus is isotropic noise — pairwise L2 distances
  * concentrate (measured: same-label mean 2.00 vs other-label 1.99 at
  * sf0.001), so NO quantized index can rank neighbors there and PQ
  * recall@k is ~0 by mathematics, not by bug. The `ann_pq_topk` oracle
  * gates the arithmetic; THIS spec gates retrieval quality where retrieval
  * is defined: a corpus with real cluster structure, where every query's
  * true neighbors share its cluster and PQ must find them.
  */
class PqRetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val nClusters = 4

  /** Planted-cluster corpus on disk: ids 0-4 queries, 100-115 seed vectors
    * spanning all clusters (the PQ/IVF seed convention), the rest corpus
    * members round-robin over clusters. Returns the temp dir. */
  private lazy val clusteredDir: String = {
    import spark.implicits._
    val dim = 64
    // well-separated deterministic centers: center c has pattern
    // sign = +1 where (d / 4) % nClusters == c, else -1, scaled to 1.0
    def center(c: Int): Array[Float] =
      Array.tabulate(dim)(d => if ((d / 4) % nClusters == c) 1.0f else -1.0f)
    // deterministic small jitter from a hash of (id, d)
    def jitter(id: Int, d: Int): Float =
      (((id * 31 + d) * 2654435761L % 1000) / 1000.0f - 0.5f) * 0.1f
    val rows = (0 until 300).map { id =>
      val c = id % nClusters
      val v = center(c).zipWithIndex.map { case (x, d) => x + jitter(id, d) }
      (id.toLong, v.toSeq, c)
    }
    val tmp = java.nio.file.Files.createTempDirectory("pq_clustered")
    rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp.toString
  }

  test("PQ top-k on clustered vectors recovers same-cluster neighbors") {
    val out = Similarity.pqTopK(spark, clusteredDir).collect()
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.keySet == (0L until 5L).toSet)
    var hits = 0
    var total = 0
    perQuery.foreach { case (q, rs) =>
      val qCluster = (q % nClusters).toInt
      rs.foreach { r =>
        total += 1
        if ((r.getLong(1) % nClusters).toInt == qCluster) hits += 1
      }
    }
    // separation is >> jitter, so PQ should be essentially perfect here;
    // require >= 14/15 to leave room for boundary accidents only
    assert(hits >= total - 1, s"PQ recovered only $hits/$total same-cluster neighbors")
  }

  test("IVF+PQ composition: contraction + ADC + exact re-rank stays same-cluster") {
    val out = Similarity.ivfPqTopK(spark, clusteredDir).collect()
    val perQuery = out.groupBy(_.getLong(0))
    assert(perQuery.keySet == (0L until 5L).toSet)
    perQuery.foreach { case (q, rs) =>
      // full k results, ranks dense from 1, cosine non-increasing
      assert(rs.length == 3, s"query $q returned ${rs.length} rows")
      assert(rs.map(_.getLong(2)).sorted.sameElements(1L to 3L))
      val ordered = rs.sortBy(_.getLong(2)).map(_.getDouble(4))
      assert(ordered.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
      val qCluster = (q % nClusters).toInt
      rs.foreach { r =>
        assert((r.getLong(1) % nClusters).toInt == qCluster,
          s"query $q got cross-cluster neighbor ${r.getLong(1)}")
      }
    }
  }
}
