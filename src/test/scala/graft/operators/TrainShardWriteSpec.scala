package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Gates on the WRITTEN training-shard artifact (VERDICT r7 #2): the
  * pipeline's product is a parquet directory, so the checks here run
  * against what lands on disk — layout, completeness vs the manifest,
  * pack-order arithmetic, and bit-identical rerun — while value-level
  * equivalence of the read-back summary is driver-gated by
  * `docs_shard_write`'s DuckDB oracle. */
class TrainShardWriteSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private def snapshot(out: String): Seq[(Long, Long, Long, Long, Long, Long, String)] =
    spark.read.parquet(out)
      .select(col("shard").cast("long"), col("pos"), col("doc_id"), col("tokens"),
        col("stream_offset"), col("window_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
      .sortBy(t => (t._1, t._2))

  test("shard write: Hive layout, manifest completeness, pack arithmetic, deterministic rerun") {
    val out = TextAnalysis.shardWrite(spark, dir)
    // directory-per-shard Hive layout — the pruning lever a trainer's
    // per-shard reader relies on
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(shardDirs.length == 8, s"expected 8 shard directories, got: ${shardDirs.mkString(",")}")
    val rows = snapshot(out)
    // exactly the manifest's final_keep docs, each exactly once
    val kept = TextAnalysis.trainingManifest(spark, dir)
      .filter(col("final_keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._3).toSet == kept, "written docs != manifest final_keep set")
    assert(rows.length == kept.size, "a doc was written more than once")
    assert(kept.nonEmpty && kept.size < 500, "fixture should keep a strict subset")
    // within each shard: pos is 1..n dense, offsets are exact prefix sums
    // of token counts from 0, and window_id = offset div 2048
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      assert(docs.map(_._2).toSeq == (1L to docs.length).toSeq, s"shard $shard pos not dense")
      var expect = 0L
      docs.foreach { case (_, _, id, toks, off, win, _) =>
        assert(off == expect, s"shard $shard doc $id offset $off != running sum $expect")
        assert(win == off / 2048, s"shard $shard doc $id window_id mismatch")
        expect += toks
      }
    }
    // rerun determinism: a second write (fresh manifest build — the memo
    // is cleared — and an overwrite-mode write) must produce bit-identical
    // content, or resumed/repeated production runs silently diverge
    Dedup.clearSharedStages()
    val out2 = TextAnalysis.shardWrite(spark, dir)
    assert(out2 == out)
    assert(snapshot(out2) == rows, "rerun produced different shard content")
  }

  test("shard write gate: read-back summary is consistent with the written rows") {
    val out = TextAnalysis.shardWritePath(dir)
    val gate = TextAnalysis.shardWriteGate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(gate.map(_._1).toSeq == gate.map(_._1).toSeq.sorted)
    val rows = snapshot(out)
    val byShard = rows.groupBy(_._1)
    assert(gate.map(_._1).toSet == byShard.keySet)
    gate.foreach { case (shard, nDocs, nWindows, nTokens, _) =>
      val docs = byShard(shard)
      assert(nDocs == docs.length)
      assert(nTokens == docs.map(_._4).sum)
      // windows COVERED by the contiguous packed stream = ceil(Σtokens/w).
      // NOT max(window_id)+1: window_id marks each doc's START window, and
      // a tail doc crossing a boundary spills into windows no doc starts
      // in (this fixture does exactly that — the old formula read 1 where
      // the stream covers 2).
      assert(nWindows == (docs.map(_._4).sum + 2047) / 2048)
      assert(nWindows >= docs.map(_._6).max + 1)
    }
  }
}
