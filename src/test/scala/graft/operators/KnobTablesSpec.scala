package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Brute-force gates for the round-11 knob tables and audits (ANN
  * compression ladder, eval-side burn report, exact-vector dedup). The
  * DuckDB oracles pin cross-engine value equality; these specs pin the
  * SEMANTICS against naive recomputations and that the fixtures populate
  * each table's signal.
  */
class KnobTablesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("compression sweep recall matches set intersection against ground truth") {
    val nq = 5; val k = 10
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gt = pairs(Similarity.cosineTopK(spark, dir, nq, k))
    val legs = Map(
      "flat_f32" -> gt,
      "sq8" -> pairs(Similarity.sq8TopK(spark, dir, nq, k, rerank = 2 * k)),
      "pq8" -> pairs(Similarity.pqTopK(spark, dir, nq, k)),
      "ivfpq8" -> pairs(Similarity.ivfPqTopK(spark, dir, nq, k, rerank = 2 * k)))
    val sweep = Similarity.compressionSweep(spark, dir, nq, k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sweep.keySet == legs.keySet)
    sweep.foreach { case (m, (bytes, hits, permille)) =>
      assert(hits == (legs(m) & gt).size.toLong, s"$m hits")
      assert(permille == hits * 1000L / (nq * k), s"$m permille")
      assert(bytes > 0)
    }
    // the ladder must be a real trade-off on the fixture: the flat
    // baseline is perfect, and compression actually loses something
    // somewhere (otherwise the table can't inform the byte-budget choice)
    assert(sweep("flat_f32")._3 == 1000L)
    assert(sweep.values.map(_._3).min < 1000L,
      "every compressed index is perfect - the knob table is vacuous")
    // each method returns at most k rows per query, so permille <= 1000
    assert(sweep.values.forall(_._3 <= 1000L))
  }

  test("exact vector dups find exactly the planted re-ingest, nothing else") {
    val groups = Similarity.exactVectorDups(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = graft.Fixtures.table(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    // the fixture's vectors are pairwise distinct, so the duplicate
    // groups must be EXACTLY the planted re-ingest: every 41st vector,
    // keep_id = the original (min of the pair), 2 copies each
    val planted = ids.filter(_ % 41 == 0).toSet
    assert(groups.keySet == planted,
      s"extra=${(groups.keySet -- planted).take(5)} missing=${(planted -- groups.keySet).take(5)}")
    assert(groups.values.forall(_ == 2L), "planted groups must have exactly 2 copies")
    assert(groups.nonEmpty)
  }

  test("watermark sweep matches a sequential recomputation of the lateness") {
    import org.apache.spark.sql.functions._
    // independent re-derivation: trust only the per-event arrival hash
    // (property-tested elsewhere); recompute the running-max lateness
    // SEQUENTIALLY — the two-level distributed prefix is what's at risk
    val rows = graft.Fixtures.table(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("tus"))
      .withColumn("arr",
        col("tus") + TextAnalysis.mixedHashOf("late|", col("event_id")) % 120000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    var runMax = Long.MinValue
    val lates = rows.map { case (_, tus, _) =>
      val late = if (runMax == Long.MinValue) 0L else math.max(0L, runMax - tus)
      runMax = math.max(runMax, tus)
      late
    }
    val sweep = EventOps.watermarkSweep(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sweep.keySet == Set(1L, 5L, 15L, 30L, 60L, 120L))
    sweep.foreach { case (d, (n, dropped, ppm)) =>
      assert(n == rows.length.toLong, s"d=$d n_events")
      assert(dropped == lates.count(_ > d * 1000000L).toLong, s"d=$d n_dropped")
      assert(ppm == dropped * 1000000L / n, s"d=$d ppm")
    }
    // the simulated delay is < 120 s, so a 120 s watermark drops nothing;
    // a 1 s watermark must drop something or the sweep is vacuous
    assert(sweep(120L)._2 == 0L, "120 s watermark must be lossless")
    assert(sweep(1L)._2 > 0L, "1 s watermark drops nothing - signal missing")
    // monotone: a longer delay never drops more
    val ds = Seq(1L, 5L, 15L, 30L, 60L, 120L)
    ds.sliding(2).foreach { case Seq(a, b) =>
      assert(sweep(a)._2 >= sweep(b)._2, "drop count must fall as delay rises")
    }
  }

  test("eval burn matches a brute force and catches every planted original") {
    def grams(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      if (ws.length < 5) Set.empty
      else ws.sliding(5).map(_.mkString(" ")).toSet
    }
    val srcByDoc = graft.Fixtures.table(spark, dir, "documents")
      .select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpus = Dedup.corpusWithNearDups(spark, dir)
      .collect().map(r => r.getLong(0) -> grams(r.getString(1)))
    val train = corpus.filter(_._1 < 1000000L)
    val evalDocs = corpus.filter { case (id, _) => id >= 1000000L && id % 97 == 0 }
    val burn = TextAnalysis.evalBurn(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(burn.keySet == evalDocs.map(_._1).toSet)
    evalDocs.foreach { case (eid, eg) =>
      val hits = train.filter { case (_, tg) => (tg & eg).nonEmpty }
      val (nDocs, nGrams, nSrcs) = burn(eid)
      assert(nDocs == hits.length.toLong, s"$eid n_train_docs")
      assert(nGrams == hits.flatMap(h => (h._2 & eg)).distinct.length.toLong,
        s"$eid n_shared_grams")
      assert(nSrcs == hits.map(h => srcByDoc(h._1)).distinct.length.toLong,
        s"$eid n_sources")
      // planted recall: the eval copy drops only the original's first
      // word, so any eval item that still has a 5-gram must be burned
      // by at least its own original
      if (eg.nonEmpty) assert(nDocs >= 1L, s"$eid missed its planted original")
    }
    assert(burn.nonEmpty, "eval spine is empty on the fixture")
  }
}
