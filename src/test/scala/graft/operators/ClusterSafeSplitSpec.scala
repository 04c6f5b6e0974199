package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Property gates for [[TextAnalysis.clusterSafeSplit]] — value-exactness is
  * separately gated by its DuckDB oracle (`docs_cluster_safe_split`). The
  * operator's whole point is the structural guarantee the per-doc split
  * can't give: NO verified near-dup pair may straddle splits.
  */
class ClusterSafeSplitSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("no verified near-dup pair straddles the cluster-safe split") {
    val splits = TextAnalysis.clusterSafeSplit(spark, dir).select("doc_id", "split")
    val pairs = Dedup.ngramJaccardPairs(spark, dir).select("id_a", "id_b")
    val straddling = pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() == 0L,
      "cluster-keyed hashing must put every near-dup pair in one split")
    // the same corpus hashed per-doc DOES leak (sanity: the property is not
    // vacuous on this fixture — the detector finds pairs to prevent)
    assert(TextAnalysis.splitLeakage(spark, dir).limit(1).count() > 0L,
      "fixture must contain at least one straddling pair under the per-doc split")
  }

  test("cluster members share one split and every corpus doc is assigned exactly once") {
    val out = TextAnalysis.clusterSafeSplit(spark, dir)
    val n = Dedup.corpusWithNearDups(spark, dir).count()
    assert(out.count() == n, "one split row per corpus doc")
    assert(out.select("doc_id").distinct().count() == n)
    // all members of a split_key agree on the split by construction of the
    // projection; assert it end-to-end anyway (guards a future refactor
    // that hashes something doc-dependent)
    val disagree = out.groupBy("split_key").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1)
    assert(disagree.count() == 0L)
    // all three splits are populated at this corpus size
    assert(out.select("split").distinct().count() == 3L)
  }
}
