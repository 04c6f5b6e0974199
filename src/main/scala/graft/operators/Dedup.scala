package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Fixtures.table

/** Deduplication operators for LLM-data pipelines: exact (hash group-by),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the point of all of this at 100 TB):
  *  - exact dedup is a single hash-partitioned group-by on a 128-bit digest
  *    of the text, never on the text itself — the shuffle carries 16-byte
  *    keys, not documents;
  *  - MinHash/LSH turns all-pairs O(n²) into `explode(bands) → shuffle on
  *    (band, hash) → within-bucket pairs`, which is linear in candidates;
  *  - SimHash reduces each doc to a 16-bit signature whose buckets are
  *    directly joinable;
  *  - n-gram Jaccard runs only on LSH candidates, never all pairs.
  *
  * The test corpus has no true duplicates (FIXTURES.md), so the near-dup
  * demos run over [[corpusWithNearDups]] — documents unioned with a
  * deterministic perturbed copy (first word dropped, doc_id offset by 10⁶) —
  * built identically in the DuckDB oracles.
  */
object Dedup {

  private[graft] val IdOffset = 1000000L

  /** documents ∪ perturbed(documents): plants one near-duplicate per doc.
    * Repartitioned to the cluster's parallelism: the fixture file is a
    * single small parquet (1-2 input splits), and the downstream
    * shingle/signature stages are CPU-bound — without the repartition all
    * hashing lands on one or two cores. */
  def corpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents").select("doc_id", "text")
    d.unionAll(d.select(
      (col("doc_id") + IdOffset).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text")))
      .repartition(spark.sparkContext.defaultParallelism)
  }

  private[operators] val corpusSql: String =
    s"""SELECT doc_id, text FROM documents
       |UNION ALL
       |SELECT doc_id + $IdOffset AS doc_id, substr(text, strpos(text, ' ') + 1) AS text FROM documents""".stripMargin

  /** Offset for PLANTED exact copies — disjoint from [[IdOffset]]'s
    * near-dup band so the two derived corpora can never alias. */
  private[graft] val ExactCopyOffset = 2000000L

  /** Derived FIXTURE corpus with PLANTED byte-identical copies (every 3rd
    * doc re-emitted verbatim under a shifted id) — the raw fixture carries
    * no exact dups, so a raw-table dedup gate passed on 0 rows and couldn't
    * discriminate (VERDICT r14 #3; the `profile_null_patterns` planted-view
    * precedent). The planting lives HERE, in the derived-corpus helper,
    * never inside the dedup operator itself (ADVICE r15): a caller running
    * [[exactDupGroupsOf]] on a real corpus gets a faithful report. */
  private[graft] def corpusWithExactCopies(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents").select("doc_id", "text")
    d.unionAll(d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + ExactCopyOffset).as("doc_id"), col("text")))
  }

  /** Exact dedup: duplicate groups keyed by md5(text) — a FAITHFUL report
    * of its input corpus (doc_id, text): no rows are added or dropped
    * before hashing. Docs with a unique text appear in no group, so an
    * over-grouping bug (hashing the wrong column, dropping the filter)
    * surfaces as extra rows and an under-grouping bug as missing ones. */
  def exactDupGroupsOf(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("keep_id", "n_copies")
      .orderBy("keep_id")

  /** The GATED form: [[exactDupGroupsOf]] over the planted-copy corpus
    * ([[corpusWithExactCopies]]) so the gate discriminates (167 groups at
    * sf0.01, oracle unchanged since r15). */
  def exactDupGroups(spark: SparkSession, dir: String): DataFrame =
    exactDupGroupsOf(corpusWithExactCopies(spark, dir))

  val exactDupGroupsOracle: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $ExactCopyOffset AS doc_id, text FROM documents WHERE doc_id % 3 = 0
       |)
       |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM corpus GROUP BY md5(text) HAVING count(*) > 1
       |ORDER BY keep_id""".stripMargin

  /** Exact dedup, keep-first policy: the surviving doc_ids after hashing the
    * full corpus (including planted copies of identical texts if any). */
  def exactDedupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("text_hash").orderBy("doc_id")
    table(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("text_hash"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("doc_id")
      .orderBy("doc_id")
  }

  val exactDedupKeepFirstOracle: String =
    """SELECT doc_id FROM (
      |  SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- MinHash

  private val NumHashes = 8
  private val BandSize = 2 // 4 bands of 2 → catches J ≳ 0.6 pairs reliably

  /** Word-level 3-gram shingles of a text column (1-based element_at).
    * Precondition: the text has ≥3 words — callers must pre-filter
    * (`sequence(1, n-2)` would run DESCENDING for shorter texts). */
  def shingles(c: Column): Column = {
    val ws = split(c, " ")
    transform(
      sequence(lit(1), size(ws) - 2),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2)))
  }

  /** ≥3-word guard matching the oracle's `WHERE len(...) >= 3`. */
  private def hasShingles(c: Column): Column = size(split(c, " ")) >= 3

  /** MinHash signature entry i: min over shingles of md5(i|shingle) — an
    * md5-keyed hash family, identical on any engine. Built-ins-only form,
    * kept as the semantic reference for the native expression. */
  def minhashHof(sh: Column, i: Int): Column =
    array_min(transform(sh, s => md5(concat(lit(s"$i|"), s))))

  // --------------------------------------- shared materialized pipeline
  /** The near-dup family — candidate pairs, verified pairs, Jaccard
    * estimation, triangles, three clustering forms — all consume the same
    * shingle → minhash → band → verify pipeline, memoized via
    * [[StageMemo]] (materialized once per (session, dir); recomputing it
    * per query was the slowest block of the round-4/5 bench). */
  private def memoStage(spark: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame = StageMemo(spark, dir, stage)(build)

  /** Test/bench hook — clears EVERY memoized stage (near-dup AND span
    * family), kept here because Bench and the leak specs reach it. */
  private[graft] def clearSharedStages(): Unit = StageMemo.clear()

  /** Stage 1 — (doc_id, sig): the native one-pass MinHash signature per
    * doc, materialized once per (session, dir). DELIBERATELY narrow: an
    * earlier form also checkpointed the distinct shingle SETS, but those
    * arrays are ~the corpus over again (hundreds of shingle strings per
    * doc), and serializing them into checkpoint blocks cost more than the
    * one extra scan their two consumers pay — signatures are 8 md5 strings
    * per doc, a few hundred bytes. */
  private[operators] def sharedSignatures(spark: SparkSession, dir: String): DataFrame =
    memoStage(spark, dir, "signatures") {
      corpusWithNearDups(spark, dir)
        .filter(hasShingles(col("text")))
        // native one-pass signature (bit-equal to the minhashHof columns —
        // see VectorExpressionsSpec); h_i = sig[i+1]. min over a list with
        // duplicates = min over its distinct elements, so sig over raw
        // shingles matches the oracle's signature over distinct shingles.
        .select(col("doc_id"),
          graft.functions.VectorExpressions.minhash_sig(shingles(col("text")), NumHashes).as("sig"))
    }

  /** (doc_id, shd) distinct shingle sets — DERIVED per use (one scan +
    * codegen'd split/transform), not materialized; see [[sharedSignatures]]
    * for why. SORTED (r16): shd's only consumers are `size(...)` and the
    * per-pair intersection counts, so the set is emitted in sort_array
    * order once per doc and the pair verifications run the linear
    * merge-count kernel ([[graft.functions.VectorExpressions.SortedIntersectCount]])
    * instead of building a hash set over ~|A| strings per PAIR. */
  private def shingleSets(spark: SparkSession, dir: String): DataFrame =
    corpusWithNearDups(spark, dir)
      .filter(hasShingles(col("text")))
      .select(col("doc_id"),
        sort_array(array_distinct(shingles(col("text")))).as("shd"))

  /** Band derivation from a (doc_id, ..., sig) frame — cheap (one md5 per
    * band per doc), so it is derived rather than materialized. */
  private def bandsFromSig(sig: DataFrame): DataFrame = {
    val bands = (0 until NumHashes / BandSize).map { b =>
      val parts = (0 until BandSize).map(j => element_at(col("sig"), b * BandSize + j + 1))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** BUCKET CAP — the parameter that decides whether the band self-join
    * survives a template hub. A doc near-duplicated n times puts n members
    * into the same (band, band_hash) bucket, and the bucket's pair OUTPUT
    * is n²/2 — at n = 10⁶ that is 5·10¹¹ pairs, which no salting can fix
    * (salting spreads work across tasks; the output volume itself is
    * quadratic, and the verify join downstream would drown in it). The
    * linear-output policy, standard in production near-dup pipelines:
    * within a bucket, rank members by doc_id; emit ALL pairs among the
    * first `MaxBucket` members (full recall for every organically-sized
    * bucket — the largest fixture bucket is 32 at sf0.1) plus STAR pairs
    * from the rank-1 representative to every member past the cap. Per
    * bucket that is ≤ cap²/2 + n pairs — linear in n — and the star leg
    * keeps the bucket CONNECTED, so downstream clustering still collapses
    * the whole template family into one cluster; only pair-level recall
    * inside giant buckets is traded, exactly where pairs are redundant
    * (every member is a near-dup of every other). The same ranked policy
    * is in the DuckDB oracle, so it is gated wherever a bucket crosses the
    * cap; `HubSkewSpec` plants a 2000-copy template and pins both the
    * bounded output and the bounded per-task skew. */
  private[operators] val MaxBucket = 64

  /** DuckDB twin of [[cappedBucketPairs]], shared by every oracle that
    * gates a capped bucket self-join (three minhash-family oracles + the
    * two simhash pair oracles — a cap-policy change edits ONE block).
    * Emits two CTEs, `ranked` and `capped(id_a, id_b)`, over bucket CTE
    * `from` keyed by `keys`; embed after a `|), ` margin. */
  private[operators] def cappedPairsSql(from: String, keys: Seq[String]): String = {
    val k = keys.mkString(", ")
    s"""ranked AS (
       |  SELECT doc_id, $k,
       |    row_number() OVER (PARTITION BY $k ORDER BY doc_id) AS rn
       |  FROM $from
       |), capped AS (
       |  SELECT DISTINCT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |    FROM ranked a JOIN ranked b USING ($k)
       |    WHERE a.rn < b.rn AND b.rn <= $MaxBucket
       |    UNION ALL
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |    FROM ranked a JOIN ranked b USING ($k)
       |    WHERE a.rn = 1 AND b.rn > $MaxBucket
       |  )
       |)""".stripMargin
  }

  /** The capped pair generation from ANY (doc_id, bucket-key...) frame —
    * the shared mechanism behind every LSH-family bucket self-join
    * (minhash bands AND the simhash block-pair multi-index; a cap
    * special-cased in one family leaves the other quadratic under the
    * same template hub). Both join legs filter their inputs to bounded
    * bucket slices BEFORE the join — the dense leg's groups are ≤ cap
    * rows a side, the star leg's build side is 1 row per bucket — so no
    * task ever enumerates a quadratic bucket (an equi-join evaluates
    * every same-key row combination even when a post-filter would
    * discard it). Output is the DISTINCT (id_a, id_b) pair set across
    * buckets; the distinct's input is bounded at keys-per-doc × the
    * linear capped output, so it never sees quadratic volume either. */
  /** Cap-policy TELEMETRY (VERDICT r8 #6): the cap is correct under the
    * oracle, but on a hub-heavy corpus an operator should be able to SEE
    * how much pair enumeration the cap skipped. Every [[cappedBucketPairs]]
    * build carries a named `observe` on its over-cap leg; this listener
    * records the counters per build tag at query completion:
    *  - `capped_buckets`: buckets whose membership exceeded [[MaxBucket]];
    *  - `dropped_pairs`: per-bucket pair enumerations the cap skipped vs
    *    the uncapped self-join (Σ over over-cap rows of rn−2 — for a
    *    bucket of size s that is C(s,2) − C(cap,2) − (s−cap)). A skipped
    *    enumeration is NOT necessarily a lost pair — the same pair often
    *    re-occurs in another band/block bucket, and the star leg keeps the
    *    bucket connected — so this is the upper bound on pair-recall loss
    *    and the exact count of join work avoided. */
  object CapTelemetry {
    import scala.collection.concurrent.TrieMap
    private val Prefix = "cap_policy_"
    private val registered = TrieMap.empty[String, Unit]
    private val metrics = TrieMap.empty[String, (Long, Long)]

    private[operators] def observeName(tag: String): String = Prefix + tag

    private[operators] def ensureListener(spark: SparkSession): Unit = {
      val key = s"${spark.sparkContext.applicationId}@${System.identityHashCode(spark)}"
      registered.getOrElseUpdate(key, {
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
            qe.observedMetrics.foreach { case (name, row) =>
              if (name.startsWith(Prefix)) {
                def l(f: String): Long =
                  Option(row.getAs[Any](f)).map(_.asInstanceOf[Long]).getOrElse(0L)
                metrics.put(name.stripPrefix(Prefix), (l("capped_buckets"), l("dropped_pairs")))
              }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
        })
        ()
      })
      ()
    }

    /** (capped_buckets, dropped_pairs) from the last completed build with
      * this tag; None until such a build has executed in this process. */
    def last(tag: String): Option[(Long, Long)] = metrics.get(tag)
  }

  /** `keep`: key columns to RETAIN in the output alongside (id_a, id_b) —
    * lets several bucket families (e.g. the banding sweep's four configs)
    * share ONE window + join + distinct by folding the family id into the
    * bucket key; pairs are then distinct per kept-key group, exactly as if
    * each family ran its own call. Must be a subset of `keys`. */
  private[operators] def cappedBucketPairs(buckets: DataFrame, keys: Seq[String],
      tag: String, keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keep.forall(keys.contains), s"keep ⊄ keys: $keep vs $keys")
    CapTelemetry.ensureListener(buckets.sparkSession)
    val keyCols = keys.map(col)
    val outCols = keep :+ "id_a" :+ "id_b"
    // rank within bucket in doc_id order: rn_a < rn_b ⟺ id_a < id_b, and
    // the window task is linear in bucket size (never quadratic)
    val ranked = buckets.withColumn("rn",
      row_number().over(Window.partitionBy(keyCols: _*).orderBy("doc_id")))
    val dense = ranked.filter(col("rn") <= MaxBucket)
    // dense-bucket pairs enumerate ROW-LOCALLY from one collected doc list
    // per bucket (r16 continuation): the former dense⨝dense self-join
    // planned the whole band lineage twice and re-sorted both sides; the
    // groupBy here rides the window's existing hash partitioning (no new
    // exchange), and per-group state is BOUNDED BY THE CAP (≤ MaxBucket
    // ids), so the collect is safe at any scale — the unbounded-hub risk
    // that forbids collecting raw buckets doesn't apply post-cap. ids are
    // sorted ascending, so (ids[j], ids[i]) for j<i reproduces exactly the
    // rn_a < rn_b ⟺ id_a < id_b pairs of the join form.
    val denseIds = dense.groupBy(keyCols: _*)
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2) // sequence(1, 0) would DESCEND (gopher note)
    val densePairs = denseIds
      .select(keep.map(col) :+ explode(expr(
        """flatten(transform(sequence(1, size(ids) - 1),
          |  i -> transform(sequence(0, i - 1),
          |    j -> struct(ids[j] AS id_a, ids[i] AS id_b))))"""
          .stripMargin.replace("\n", " "))).as("p"): _*)
      .select(keep.map(col) :+ col("p.id_a").as("id_a") :+ col("p.id_b").as("id_b"): _*)
      .select(outCols.head, outCols.tail: _*)
    val rep = ranked.filter(col("rn") === 1)
      .select(keyCols :+ col("doc_id").as("id_a"): _*)
    // telemetry rides the over-cap leg (its only consumer is the star
    // join): each capped bucket has exactly one rn == cap+1 row, and the
    // skipped enumerations are Σ(rn−2) over these rows — zero extra scan,
    // zero shuffle, observable from any action that runs the build
    val tail = ranked.filter(col("rn") > MaxBucket)
      .observe(CapTelemetry.observeName(tag),
        sum(when(col("rn") === MaxBucket + 1, 1L).otherwise(0L)).as("capped_buckets"),
        sum(col("rn") - 2).as("dropped_pairs"))
      .select(keyCols :+ col("doc_id").as("id_b"): _*)
    val starPairs = rep.join(tail, keys).select(outCols.head, outCols.tail: _*)
    densePairs.unionAll(starPairs).distinct()
  }

  private def bandPairs(bands: DataFrame): DataFrame =
    cappedBucketPairs(bands, Seq("band", "band_hash"), tag = "minhash_bands")

  /** Stage 2 — distinct LSH candidate pairs (id_a < id_b), from the band
    * self-join on (band, band_hash) under the [[MaxBucket]] cap policy.
    * Materialized: consumed by the gated candidates query, the verify
    * stage, and the Jaccard estimator. */
  private[operators] def sharedCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    memoStage(spark, dir, "candidates") {
      bandPairs(bandsFromSig(sharedSignatures(spark, dir)))
    }

  /** Stage 3 — every LSH candidate pair SCORED once: exact 3-gram Jaccard
    * AND the MinHash signature agreement count. One materialized stage
    * serves both downstream consumers (the J ≥ 0.5 verified graph and the
    * estimator-vs-truth query), and the (shd, sig) doc table the join
    * needs on BOTH sides is materialized once for the build's duration —
    * the derive-per-side alternative ran the corpus scan + shingling
    * twice inside a single timed query. */
  private[operators] def sharedScoredCandidates(spark: SparkSession, dir: String): DataFrame =
    memoStage(spark, dir, "scored")(scoredCandidatesBuild(spark, dir))

  /** Un-memoized builder of the scored stage (extracted r16 so the build
    * plan is dumpable for the plans/ audit). */
  private[operators] def scoredCandidatesBuild(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingleSets(spark, dir)
      .join(sharedSignatures(spark, dir), "doc_id")
      .localCheckpoint(true) // transient; ContextCleaner frees the blocks
    sharedCandidatePairs(spark, dir)
      .join(docs.select(col("doc_id").as("id_a"), col("shd").as("sh_a"), col("sig").as("sig_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("shd").as("sh_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("n_match",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (a, x) => a + x))
      // |A∪B| = |A| + |B| − |A∩B| for the (distinct) shingle sets: same
      // double as size(array_union(..)) but without materializing a
      // ~|A|+|B|-string union array per pair — array_union was the
      // dominant per-pair cost of the build (guide §1.2: per-task work;
      // measured 7.0 → 2.9 s on the banding sweep's identical expression).
      // r16 continuation: shd is emitted SORTED (see [[shingleSets]]), so
      // the count is a linear merge walk — no per-pair hash set, no
      // materialized intersection array; same INT as
      // size(array_intersect(..)) on sorted sets (VectorExpressionsSpec).
      .withColumn("inter", graft.functions.VectorExpressions
        .sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .select("id_a", "id_b", "n_match", "jaccard")
  }

  /** The VERIFIED near-dup pair graph: scored candidates kept at J ≥ 0.5.
    * A cheap filter-projection over the materialized scored stage — the
    * triangle/cluster/reachability family all read it. */
  private[operators] def sharedVerifiedPairs(spark: SparkSession, dir: String): DataFrame =
    sharedScoredCandidates(spark, dir)
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b", "jaccard")

  /** LSH band table: (doc_id, band, band_hash) — one row per band per doc.
    * Docs with <3 words have no shingles and drop out (null signature).
    * Declarative (un-memoized) form, kept for plan audits and specs; the
    * query path derives bands from [[sharedSignatures]]. */
  def minhashBands(spark: SparkSession, dir: String): DataFrame = {
    val withSig = corpusWithNearDups(spark, dir)
      .filter(hasShingles(col("text")))
      .withColumn("sh", shingles(col("text")))
    bandsFromSig(withSig.select(col("doc_id"),
      graft.functions.VectorExpressions.minhash_sig(col("sh"), NumHashes).as("sig")))
  }

  /** MinHash/LSH candidate pairs: same (band, band_hash) bucket, distinct.
    * The shuffle key is the 16-byte band hash — linear in data, never n².
    * Reads the materialized [[sharedCandidatePairs]] stage. */
  def minhashCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    sharedCandidatePairs(spark, dir).orderBy("id_a", "id_b")

  /** Fully declarative candidate-pair plan (no materialized stages), for
    * the PLANS.md audit: shows the complete shingle → signature → band
    * self-join pipeline that [[sharedCandidatePairs]] materializes. */
  def minhashCandidatePairsPlan(spark: SparkSession, dir: String): DataFrame =
    bandPairs(minhashBands(spark, dir)).orderBy("id_a", "id_b")

  /** The same signature/band/pair pipeline in DuckDB SQL. */
  val minhashCandidatePairsOracle: String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS h$i")
      .mkString(",\n    ")
    val bandRows = (0 until NumHashes / BandSize)
      .map { b =>
        val parts = (0 until BandSize).map(j => s"h${b * BandSize + j}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS band_hash FROM sig"
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), shingled AS (
       |  SELECT doc_id,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM corpus
       |  WHERE len(string_split(text, ' ')) >= 3
       |), sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM shingled
       |), bands AS (
       |  $bandRows
       |), ${cappedPairsSql("bands", Seq("band", "band_hash"))}
       |SELECT id_a, id_b FROM capped
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ------------------------------------------------ banding knob pick
  /** BANDING RECOMMENDATION (round 12, VERDICT r11 #6b) — the knob-pick
    * the calibration curve exists for: from [[bandingCurve]]'s measured
    * S-curve, emit THE config a deployment should run, under the stated
    * decision rule every dedup owner applies: (1) recall gate — only
    * configs recovering the maximum number of planted near-dup pairs
    * qualify (never trade away known recall); (2) among those, highest
    * measured precision; (3) ties to the stricter banding (larger
    * band_size — fewer candidates for the same quality). The row carries
    * the config's expected verification cost (`pairs_per_true_milli`,
    * candidates per true pair) — the number that prices the choice at
    * corpus scale. One 4-row frame filtered by a 1-row broadcast max;
    * all the heavy lifting is the (already gated, already probed) curve. */
  def bandingPick(spark: SparkSession, dir: String): DataFrame = {
    val curve = bandingCurve(spark, dir)
    val maxPlanted = curve.agg(max("planted_found").as("max_planted"))
    curve.crossJoin(broadcast(maxPlanted))
      .filter(col("planted_found") === col("max_planted"))
      .orderBy(desc("precision_permille"), desc("band_size"))
      .limit(1)
      .select(col("n_bands"), col("band_size"), col("n_candidates"),
        col("n_true"), col("precision_permille"), col("planted_found"),
        expr("""CASE WHEN n_true = 0 THEN NULL
               |ELSE n_candidates * 1000 div n_true END""".stripMargin)
          .as("pairs_per_true_milli"))
  }

  def bandingPickOracle(): String =
    s"""WITH curve AS (
       |${bandingCurveOracle().linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT n_bands, band_size, n_candidates, n_true, precision_permille,
       |  planted_found,
       |  CASE WHEN n_true = 0 THEN NULL
       |  ELSE n_candidates * 1000 // n_true END AS pairs_per_true_milli
       |FROM curve
       |WHERE planted_found = (SELECT max(planted_found) FROM curve)
       |ORDER BY precision_permille DESC, band_size DESC LIMIT 1""".stripMargin

  // -------------------------------------------- banding deployment gate
  /** BANDING DEPLOYMENT GATE (round 13, VERDICT r12 #6b) — a
    * recommendation is not a deployment until something FAILS when they
    * drift: this row puts the production banding ([[NumHashes]]/
    * [[BandSize]] — the constants every minhash-family query actually
    * runs) side by side with [[bandingPick]]'s measured recommendation
    * and flags agreement. The oracle recomputes the PICK independently
    * (full curve replay); the deployed pair enters both engines as the
    * same compiled constant — which is honest: the deployment IS the
    * constant. `BandingDeploymentSpec` additionally asserts
    * `deployed_matches_pick`, so a code change to either the constants or
    * the curve that makes them diverge breaks the build, not just the
    * narrative. Cost: the (memoized) curve + a 1-row projection. */
  def bandingDeployed(spark: SparkSession, dir: String): DataFrame =
    bandingPick(spark, dir)
      .select(
        col("n_bands").as("picked_n_bands"),
        col("band_size").as("picked_band_size"),
        lit((NumHashes / BandSize).toLong).as("deployed_n_bands"),
        lit(BandSize.toLong).as("deployed_band_size"),
        (col("n_bands") === (NumHashes / BandSize).toLong &&
          col("band_size") === BandSize.toLong).as("deployed_matches_pick"),
        col("precision_permille"), col("pairs_per_true_milli"))

  def bandingDeployedOracle(): String =
    s"""WITH pick AS (
       |${bandingPickOracle().linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT n_bands AS picked_n_bands, band_size AS picked_band_size,
       |  CAST(${NumHashes / BandSize} AS BIGINT) AS deployed_n_bands,
       |  CAST($BandSize AS BIGINT) AS deployed_band_size,
       |  (n_bands = ${NumHashes / BandSize} AND band_size = $BandSize)
       |    AS deployed_matches_pick,
       |  precision_permille, pairs_per_true_milli
       |FROM pick""".stripMargin

  // ------------------------------------------- banding calibration curve
  /** LSH BANDING CALIBRATION — the measured S-curve tradeoff (the banded
    * MinHash collision analysis of Broder '97 / Leskovec-Rajaraman-Ullman,
    * MMDS ch. 3) every
    * production near-dup deployment tunes before committing a banding: with
    * the SAME 8-hash signatures, sweep every (n_bands × band_size)
    * factorization — (8×1) loosest … (1×8) strictest — and measure, per
    * config: candidate volume, true pairs among candidates (exact 3-gram
    * J ≥ 0.5), integer precision permille, and how many PLANTED near-dup
    * pairs (doc_id + $IdOffset copies) the banding recovers. Tightening the
    * banding must monotonically trade recall for precision; this query
    * turns that from folklore into a regression-tested table.
    *
    * Scale shape: signatures come from the shared materialized stage; each
    * config is one band self-join under the SAME [[MaxBucket]] cap policy
    * as production candidate generation (so the curve measures the policy
    * actually deployed), and only candidate pairs — never all pairs — are
    * Jaccard-scored. */
  def bandingCurve(spark: SparkSession, dir: String): DataFrame =
    // memoized: the 4-row curve is read twice per session (the curve query
    // and [[bandingPick]]) — without the memo the pick re-pays the whole
    // banded self-join sweep (~7 s at sf0.1 bench scale, round 12)
    memoStage(spark, dir, "banding_curve")(bandingCurveBuild(spark, dir))
      .orderBy("band_size")

  private[operators] def bandingCurveBuild(spark: SparkSession, dir: String): DataFrame = {
    val configs = Seq((8, 1), (4, 2), (2, 4), (1, 8)) // (n_bands, band_size)
    val sig = sharedSignatures(spark, dir)
    val sets = memoStage(spark, dir, "curve_sets")(shingleSets(spark, dir))
    // ALL configs' bands in one explode, the config id folded into the
    // bucket key: one window, one pair join, one distinct for the whole
    // sweep instead of four (per-config caps and per-config pair dedup are
    // preserved because (n_bands, band_size) partitions the buckets)
    val allBands = configs.flatMap { case (nb, r) =>
      (0 until nb).map { b =>
        val parts = (0 until r).map(j => element_at(col("sig"), b * r + j + 1))
        struct(lit(nb.toLong).as("n_bands"), lit(r.toLong).as("band_size"),
          lit(b).as("band"), md5(concat(parts: _*)).as("band_hash"))
      }
    }
    val bandDf = sig.select(col("doc_id"), explode(array(allBands: _*)).as("bh"))
      .select(col("doc_id"), col("bh.n_bands").as("n_bands"),
        col("bh.band_size").as("band_size"), col("bh.band").as("band"),
        col("bh.band_hash").as("band_hash"))
    val cands = cappedBucketPairs(bandDf,
      Seq("n_bands", "band_size", "band", "band_hash"), tag = "curve_sweep",
      keep = Seq("n_bands", "band_size"))
    // a looser banding's candidates largely contain a tighter one's, so the
    // expensive exact-Jaccard verification runs ONCE per DISTINCT pair
    // across the whole sweep (≈ the loosest config's volume), not once per
    // (config, pair); configs then re-attach by equi-join. One job, one
    // aggregation — identical values to the per-config form.
    // |A∪B| = |A| + |B| − |A∩B| on the (distinct) shingle sets: identical
    // double to size(array_union(..)) without allocating the union array
    // per pair — at the sweep's pair volume (~330 k distinct pairs at
    // sf0.1) the union allocation dominated the whole build (7.0 → 2.9 s
    // measured, guide §1.2). r16 continuation: shd is SORTED at the source
    // ([[shingleSets]]), so the intersection count is the linear
    // merge-count kernel — no per-pair hash set over ~|A| strings
    // (the sweep's residual floor), no intersection array.
    val scoredUniq = cands.select("id_a", "id_b").distinct()
      .join(sets.select(col("doc_id").as("id_a"), col("shd").as("sh_a")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("shd").as("sh_b")), "id_b")
      .withColumn("inter", graft.functions.VectorExpressions
        .sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")).cast("double"))
      .select("id_a", "id_b", "jaccard")
    cands.join(scoredUniq, Seq("id_a", "id_b"))
      .groupBy("n_bands", "band_size")
      .agg(
        count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("n_true"),
        sum(when(col("id_b") === col("id_a") + IdOffset, 1L).otherwise(0L))
          .as("planted_found"))
      .select(col("n_bands"), col("band_size"), col("n_candidates"), col("n_true"),
        expr("""CAST(CASE WHEN n_candidates = 0 THEN 0
               |     ELSE n_true * 1000 div n_candidates END AS BIGINT)""".stripMargin)
          .as("precision_permille"),
        col("planted_found"))
      .orderBy("band_size")
  }

  def bandingCurveOracle(): String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS h$i")
      .mkString(",\n    ")
    val jac = "CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE) / " +
      "len(list_distinct(list_concat(sa.shd, sb.shd)))"
    def cfg(nb: Int, r: Int): String = {
      val bandRows = (0 until nb).map { b =>
        val parts = (0 until r).map(j => s"h${b * r + j}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS band_hash FROM sig"
      }.mkString("\n      UNION ALL\n      ")
      s"""SELECT CAST($nb AS BIGINT) AS n_bands, CAST($r AS BIGINT) AS band_size,
         |  count(*) AS n_candidates,
         |  CAST(sum(CASE WHEN jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN id_b = id_a + $IdOffset THEN 1 ELSE 0 END) AS BIGINT) AS planted_found
         |FROM (
         |  SELECT id_a, id_b, $jac AS jaccard
         |  FROM (
         |    WITH bands AS (
         |      $bandRows
         |    ), ${cappedPairsSql("bands", Seq("band", "band_hash"))}
         |    SELECT id_a, id_b FROM capped
         |  ) p
         |  JOIN sets sa ON sa.doc_id = id_a
         |  JOIN sets sb ON sb.doc_id = id_b
         |)""".stripMargin
    }
    val unions = Seq((8, 1), (4, 2), (2, 4), (1, 8)).map(c => cfg(c._1, c._2))
      .mkString("(\n", "\n) UNION ALL (\n", "\n)")
    s"""WITH corpus AS (
       |  $corpusSql
       |), shingled AS (
       |  SELECT doc_id,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM corpus
       |  WHERE len(string_split(text, ' ')) >= 3
       |), sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM shingled
       |), sets AS (
       |  SELECT doc_id, list_distinct(sh) AS shd FROM shingled
       |)
       |SELECT n_bands, band_size, n_candidates, n_true,
       |  CAST(CASE WHEN n_candidates = 0 THEN 0
       |       ELSE n_true * 1000 // n_candidates END AS BIGINT) AS precision_permille,
       |  planted_found
       |FROM ($unions)
       |ORDER BY band_size""".stripMargin
  }

  // ------------------------------------------- pipeline build (gated)
  /** Materializes the three shared stages and reports their sizes —
    * (n_docs, n_candidates, n_verified), the numbers an operator watches
    * on a real ingest (candidate volume vs corpus tells you whether the
    * banding is healthy; verified/candidates is the LSH precision).
    *
    * Named `dedup_build_*` so it sorts BEFORE every other dedup-family
    * query in the bench: the one-time stage materialization lands on THIS
    * line, and the downstream family members' times are their own work —
    * honest per-query attribution instead of the first family member
    * silently absorbing the build. */
  def buildPipeline(spark: SparkSession, dir: String): DataFrame =
    sharedSignatures(spark, dir).agg(count(lit(1)).as("n_docs"))
      .crossJoin(sharedCandidatePairs(spark, dir).agg(count(lit(1)).as("n_candidates")))
      .crossJoin(sharedVerifiedPairs(spark, dir).agg(count(lit(1)).as("n_verified")))

  // lazy: composes ngramJaccardPairsOracle, which is defined further down
  // the file — an eager val here NPEs the object initializer
  lazy val buildPipelineOracle: String =
    s"""SELECT
       |  (SELECT count(*) FROM (
       |${corpusSql.linesIterator.map("    " + _).mkString("\n")}
       |  ) c WHERE len(string_split(text, ' ')) >= 3) AS n_docs,
       |  (SELECT count(*) FROM (
       |${minhashCandidatePairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q) AS n_candidates,
       |  (SELECT count(*) FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) v) AS n_verified""".stripMargin

  // -------------------------------------------------------- dedup funnel
  /** The DEDUP FUNNEL — the one-row answer to "what did dedup buy us":
    * corpus size, survivors after exact (hash) dedup, and survivors after
    * near-dup clustering with keep-one-per-cluster (docs outside the
    * verified graph survive unconditionally; each cluster keeps one).
    * Composes the materialized pipeline: no corpus re-hashing beyond the
    * one md5 scan for the exact stage. */
  def dedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = corpusWithNearDups(spark, dir)
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(md5(col("text"))).as("n_after_exact"))
    val g = dedupClusters(spark, dir)
      .agg(count(lit(1)).as("n_graph_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
    raw.crossJoin(broadcast(g))
      .withColumn("n_after_near",
        col("n_raw") - (col("n_graph_docs") - col("n_clusters")))
      .select("n_raw", "n_after_exact", "n_graph_docs", "n_clusters", "n_after_near")
  }

  // lazy: composes dedupClustersOracle (defined later in the file)
  lazy val dedupFunnelOracle: String =
    s"""WITH corpus AS (
       |  ${corpusSql.linesIterator.mkString("\n|  ")}
       |), clusters AS (
       |  SELECT * FROM (
       |${dedupClustersOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |)
       |SELECT
       |  (SELECT count(*) FROM corpus) AS n_raw,
       |  (SELECT count(DISTINCT md5(text)) FROM corpus) AS n_after_exact,
       |  (SELECT count(*) FROM clusters) AS n_graph_docs,
       |  (SELECT count(DISTINCT cluster_id) FROM clusters) AS n_clusters,
       |  (SELECT count(*) FROM corpus)
       |    - ((SELECT count(*) FROM clusters) - (SELECT count(DISTINCT cluster_id) FROM clusters)) AS n_after_near""".stripMargin

  // ----------------------------------------------------------- keep list
  /** The row-level KEEP LIST — the decision the funnel only counts: for
    * every corpus doc, its near-dup cluster (itself when unclustered) and
    * whether keep-one-per-cluster retains it (smallest doc_id survives).
    * This is the table a user anti-joins the corpus against to actually
    * deduplicate; docs outside the verified graph survive unconditionally.
    * Two joins against the materialized cluster labels — no corpus
    * re-hashing. */
  def dedupKeepList(spark: SparkSession, dir: String): DataFrame =
    // memoized (r16): read by four declared queries (keep list, impact,
    // weights, quality bias) — (doc_id, cluster_id, keep) is 3 longs/row
    memoStage(spark, dir, "keep_list") {
      val corpus = corpusWithNearDups(spark, dir).select("doc_id")
      val clusters = dedupClusters(spark, dir)
      val keepers = clusters.groupBy("cluster_id").agg(min("doc_id").as("keep_id"))
      corpus.join(clusters, Seq("doc_id"), "left")
        .join(keepers, Seq("cluster_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
          when(col("keep_id").isNull || col("keep_id") === col("doc_id"), 1L)
            .otherwise(0L).as("keep"))
    }.orderBy("doc_id")

  /** DEDUP IMPACT BY SOURCE — the curation report a data owner reads after
    * a dedup pass: per source, how many docs the keep-one-per-cluster
    * policy retains vs drops, in counts and integer permille. Planted
    * near-dup copies (doc_id ≥ IdOffset) attribute back to their base
    * doc's source, so a source whose content is heavily templated shows
    * its true drop rate. A group-by over the keep-list join — no corpus
    * re-hashing (the cluster labels are the materialized stage). */
  def dedupImpactBySource(spark: SparkSession, dir: String): DataFrame = {
    val src = table(spark, dir, "documents").select(col("doc_id").as("base_id"), col("source"))
    dedupKeepList(spark, dir)
      .withColumn("base_id",
        when(col("doc_id") >= IdOffset, col("doc_id") - IdOffset).otherwise(col("doc_id")))
      .join(src, "base_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"))
      .select(col("source"), col("n_docs"),
        expr("CAST(n_kept AS BIGINT)").as("n_kept"),
        (col("n_docs") - col("n_kept")).cast("bigint").as("n_dropped"),
        expr("(n_docs - n_kept) * 1000 div n_docs").as("drop_permille"))
      .orderBy("source")
  }

  def dedupImpactBySourceOracle: String =
    s"""WITH kl AS (
       |  SELECT * FROM (
       |${dedupKeepListOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(kl.keep) AS BIGINT) AS n_kept,
       |  CAST(count(*) - sum(kl.keep) AS BIGINT) AS n_dropped,
       |  CAST((count(*) - sum(kl.keep)) * 1000 // count(*) AS BIGINT) AS drop_permille
       |FROM kl
       |JOIN documents d ON d.doc_id =
       |  CASE WHEN kl.doc_id >= $IdOffset THEN kl.doc_id - $IdOffset ELSE kl.doc_id END
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** CONTENT-DEFINED CHUNKING dedup report — the storage-dedup/partial-
    * overlap angle the document-level families miss: words stream through
    * a per-word rolling hash, a word is a chunk BOUNDARY when its hash ≡ 0
    * (mod 16, expected ~16-word chunks), and chunk identity is the md5 of
    * the chunk's words. Because boundaries depend only on CONTENT, a
    * shared passage chunks identically in every doc that contains it
    * regardless of offset (the CDC property rsync/LBFS/backup dedup rest
    * on — fixed-width chunks would misalign after one inserted word). The
    * near-dup corpus makes the report non-trivial: planted copies share
    * most chunks, so cross-doc chunk reuse is the sub-document dup mass.
    *
    * 100 TB shape: one explode stream, a per-doc partitioned prefix sum
    * for chunk ids, one (doc, chunk) rollup, one chunk-hash rollup — all
    * 16-byte-key shuffles, no pair joins at all. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = corpusWithNearDups(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
      .withColumn("b",
        when(graft.functions.VectorExpressions.rolling_hash(col("word")) % 16 === 0, 1L)
          .otherwise(0L))
      .withColumn("chunk", sum(col("b")).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val chunks = toks.groupBy(col("doc_id"), col("chunk"))
      .agg(md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("word")))),
            s => s.getField("word")), " ")).as("ch"),
        count(lit(1)).as("nw"))
    val perHash = chunks.groupBy("ch")
      .agg(count(lit(1)).as("n_inst"), countDistinct(col("doc_id")).as("n_docs"),
        sum(col("nw")).as("w"))
    perHash.agg(
        sum(col("n_inst")).as("nc"), count(lit(1)).as("nd"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("nx"),
        sum(col("w")).as("tw"))
      .select(
        expr("CAST(nc AS BIGINT)").as("n_chunks"),
        col("nd").as("n_distinct_chunks"),
        expr("CAST(nx AS BIGINT)").as("n_cross_doc_chunks"),
        expr("CAST(1000 * (nc - nd) div nc AS BIGINT)").as("chunk_dup_permille"),
        expr("CAST(1000 * tw div nc AS BIGINT)").as("mean_words_per_chunk_milli"))
  }

  def cdcChunksOracle: String =
    s"""WITH corpus AS (
       |  ${corpusSql.linesIterator.mkString("\n|  ")}
       |), toks AS (
       |  SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS word
       |  FROM corpus, unnest(generate_series(1, len(string_split(text, ' ')))) AS s(i)
       |), marked AS (
       |  SELECT doc_id, pos, word,
       |    CASE WHEN list_reduce(
       |        list_prepend(CAST(0 AS BIGINT),
       |          list_transform(list_filter(string_split(word, ''), c -> c != ''),
       |            c -> CAST(unicode(c) AS BIGINT))),
       |        (a, b) -> (a * 31 + b) % 1000000007) % 16 = 0
       |      THEN 1 ELSE 0 END AS b
       |  FROM toks WHERE word != ''
       |), numbered AS (
       |  SELECT doc_id, pos, word,
       |    CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS chunk
       |  FROM marked
       |), chunks AS (
       |  SELECT doc_id, chunk, md5(string_agg(word, ' ' ORDER BY pos)) AS ch,
       |         count(*) AS nw
       |  FROM numbered GROUP BY doc_id, chunk
       |), per_hash AS (
       |  SELECT ch, count(*) AS n_inst, count(DISTINCT doc_id) AS n_docs,
       |         CAST(sum(nw) AS BIGINT) AS w
       |  FROM chunks GROUP BY ch
       |)
       |SELECT CAST(sum(n_inst) AS BIGINT) AS n_chunks,
       |  count(*) AS n_distinct_chunks,
       |  CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_doc_chunks,
       |  CAST(1000 * (sum(n_inst) - count(*)) // sum(n_inst) AS BIGINT) AS chunk_dup_permille,
       |  CAST(1000 * sum(w) // sum(n_inst) AS BIGINT) AS mean_words_per_chunk_milli
       |FROM per_hash""".stripMargin

  /** CLUSTER LANGUAGE PURITY — near-dup clusters that mix languages are a
    * smell worth its own report: legitimate near-dups share language;
    * cross-language clusters usually mean templated boilerplate (the same
    * nav/footer skeleton translated) or a shingle space too coarse for
    * short docs — either way the keep-one policy is about to pick one
    * language's copy and silently delete the other's. Per multi-doc
    * cluster the distinct base-doc languages; rolled up to the counts a
    * reviewer reads. Joins over the materialized cluster labels. */
  def clusterLangPurity(spark: SparkSession, dir: String): DataFrame = {
    val langs = table(spark, dir, "documents").select(col("doc_id").as("base_id"), col("lang"))
    val per = dedupClusters(spark, dir)
      .withColumn("base_id",
        when(col("doc_id") >= IdOffset, col("doc_id") - IdOffset).otherwise(col("doc_id")))
      .join(langs, "base_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("lang")).as("n_langs"))
    per.agg(count(lit(1)).as("nc"),
        sum(when(col("n_langs") >= 2, 1L).otherwise(0L)).as("nm"),
        max(col("n_langs")).as("mx"))
      .select(col("nc").as("n_clusters"),
        expr("CAST(nm AS BIGINT)").as("n_multilang"),
        expr("CAST(nm * 1000 div nc AS BIGINT)").as("multilang_permille"),
        col("mx").as("max_langs"))
  }

  def clusterLangPurityOracle: String =
    s"""WITH clusters AS (
       |  SELECT * FROM (
       |${dedupClustersOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), per AS (
       |  SELECT c.cluster_id, count(*) AS n_docs, count(DISTINCT d.lang) AS n_langs
       |  FROM clusters c JOIN documents d ON d.doc_id =
       |    CASE WHEN c.doc_id >= $IdOffset THEN c.doc_id - $IdOffset ELSE c.doc_id END
       |  GROUP BY c.cluster_id
       |)
       |SELECT count(*) AS n_clusters,
       |  CAST(sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multilang,
       |  CAST(sum(CASE WHEN n_langs >= 2 THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
       |    AS multilang_permille,
       |  max(n_langs) AS max_langs
       |FROM per""".stripMargin

  /** DEDUP × QUALITY SELECTION-BIAS AUDIT — near-dup removal is supposed
    * to delete templated boilerplate, which skews low-quality; this
    * cross-tab checks that belief on THIS corpus instead of assuming it.
    * Docs are cohorted by the [[TextAnalysis.qualityPrune]] keep decision
    * (top-700‰ stopword-score per source) and each cohort reports its
    * dedup drop rate from the keep list. If the kept-quality cohort loses
    * as much as the pruned cohort, dedup is eating unique signal, not
    * boilerplate — the report that catches an over-aggressive threshold
    * before a training run does. Planted copies attribute to their base
    * doc (which carries the quality score). Two materialized stages
    * joined on an 8-byte key; output is 2 rows. */
  def dedupQualityBias(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.qualityPrune(spark, dir)
      .select(col("doc_id").as("base_id"), col("keep").as("quality_keep"))
    dedupKeepList(spark, dir)
      .withColumn("base_id",
        when(col("doc_id") >= IdOffset, col("doc_id") - IdOffset).otherwise(col("doc_id")))
      .join(quality, "base_id")
      .groupBy("quality_keep")
      .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_kept"))
      .select(col("quality_keep"), col("n_docs"),
        expr("CAST(n_kept AS BIGINT)").as("n_kept"),
        (col("n_docs") - col("n_kept")).cast("bigint").as("n_dropped"),
        expr("(n_docs - n_kept) * 1000 div n_docs").as("drop_permille"))
      .orderBy("quality_keep")
  }

  def dedupQualityBiasOracle: String =
    s"""WITH kl AS (
       |  SELECT * FROM (
       |${dedupKeepListOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), qp AS (
       |  SELECT * FROM (
       |${TextAnalysis.qualityPruneOracle().linesIterator.map("    " + _).mkString("\n")}
       |  ) q2
       |)
       |SELECT qp.keep AS quality_keep, count(*) AS n_docs,
       |  CAST(sum(kl.keep) AS BIGINT) AS n_kept,
       |  CAST(count(*) - sum(kl.keep) AS BIGINT) AS n_dropped,
       |  CAST((count(*) - sum(kl.keep)) * 1000 // count(*) AS BIGINT) AS drop_permille
       |FROM kl
       |JOIN qp ON qp.doc_id =
       |  CASE WHEN kl.doc_id >= $IdOffset THEN kl.doc_id - $IdOffset ELSE kl.doc_id END
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** DEDUP SURVIVOR WEIGHTS — the estimation fix that makes a deduped
    * corpus statistically usable: keep-one-per-cluster biases every
    * downstream count unless each surviving doc is reweighted by the
    * number of docs it represents (its cluster size — the Horvitz-Thompson
    * inverse-inclusion weight, here exact because inclusion is
    * deterministic). Per source: raw corpus docs, survivors, the doc mass
    * the survivors REPRESENT under cluster-size weights, and the coverage
    * permille. Source-pure clusters ⇒ coverage ≡ 1000; deviation is
    * cross-source clustering reassigning mass to the keeper's source —
    * exactly the drift a weighted-estimate user must know about.
    * All linear joins over the materialized keep list; no re-hashing. */
  def dedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val kl = dedupKeepList(spark, dir)
      .withColumn("base_id",
        when(col("doc_id") >= IdOffset, col("doc_id") - IdOffset).otherwise(col("doc_id")))
    val src = table(spark, dir, "documents").select(col("doc_id").as("base_id"), col("source"))
    val kls = kl.join(src, "base_id")
    val raw = kls.groupBy("source").agg(count(lit(1)).as("raw_docs"))
    val sizes = kl.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    val rep = kls.filter(col("keep") === 1L)
      .join(sizes, "cluster_id")
      .groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum(col("cluster_size")).as("represented"))
    raw.join(rep, Seq("source"), "left")
      .select(col("source"), col("raw_docs"),
        coalesce(col("kept_docs"), lit(0L)).as("kept_docs"),
        expr("CAST(COALESCE(represented, 0) AS BIGINT)").as("represented"),
        expr("CAST(COALESCE(represented, 0) * 1000 div raw_docs AS BIGINT)")
          .as("coverage_permille"))
      .orderBy("source")
  }

  def dedupWeightsOracle: String =
    s"""WITH kl AS (
       |  SELECT * FROM (
       |${dedupKeepListOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), m AS (
       |  SELECT kl.*, CASE WHEN doc_id >= $IdOffset THEN doc_id - $IdOffset
       |                    ELSE doc_id END AS base_id FROM kl
       |), j AS (
       |  SELECT m.*, d.source FROM m JOIN documents d ON d.doc_id = m.base_id
       |), raw AS (
       |  SELECT source, count(*) AS raw_docs FROM j GROUP BY source
       |), sz AS (
       |  SELECT cluster_id, count(*) AS cluster_size FROM kl GROUP BY cluster_id
       |), rep AS (
       |  SELECT j.source, count(*) AS kept_docs,
       |         CAST(sum(sz.cluster_size) AS BIGINT) AS represented
       |  FROM j JOIN sz ON sz.cluster_id = j.cluster_id
       |  WHERE j.keep = 1 GROUP BY j.source
       |)
       |SELECT r.source, r.raw_docs,
       |  COALESCE(rep.kept_docs, 0) AS kept_docs,
       |  COALESCE(rep.represented, 0) AS represented,
       |  CAST(COALESCE(rep.represented, 0) * 1000 // r.raw_docs AS BIGINT) AS coverage_permille
       |FROM raw r LEFT JOIN rep ON rep.source = r.source
       |ORDER BY r.source""".stripMargin

  // def, not val: composes dedupClustersOracle (defined later in the file)
  def dedupKeepListOracle: String =
    s"""WITH corpus AS (
       |  ${corpusSql.linesIterator.mkString("\n|  ")}
       |), clusters AS (
       |  SELECT * FROM (
       |${dedupClustersOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), keepers AS (
       |  SELECT cluster_id, min(doc_id) AS keep_id FROM clusters GROUP BY cluster_id
       |)
       |SELECT c.doc_id,
       |  coalesce(cl.cluster_id, c.doc_id) AS cluster_id,
       |  CAST(CASE WHEN k.keep_id IS NULL OR k.keep_id = c.doc_id THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM corpus c
       |LEFT JOIN clusters cl ON cl.doc_id = c.doc_id
       |LEFT JOIN keepers k ON k.cluster_id = cl.cluster_id
       |ORDER BY c.doc_id""".stripMargin

  // ----------------------------------------------- ensemble dedup verdict
  /** MULTI-SIGNAL dedup arbitration: merge LEXICAL duplicate evidence
    * (MinHash-verified n-gram Jaccard over the text corpus) with SEMANTIC
    * evidence (label-blocked embedding cosine) into one per-pair verdict —
    * `both` is remove-with-confidence, `text_only` (boilerplate wrappers
    * around different content) and `embed_only` (paraphrases sharing no
    * 3-gram) route to their own policies. The fixtures plant the SAME
    * id+10⁶ copy scheme on both sides, so planted pairs must score `both`
    * — pinned in the spec.
    *
    * 100 TB shape: a full-outer equi-join of two already-materialized
    * pair graphs on 16 B keys — nothing rescans either corpus; the pair
    * graphs are orders of magnitude smaller than their corpora. */
  def dedupEnsemble(spark: SparkSession, dir: String): DataFrame = {
    val text = sharedVerifiedPairs(spark, dir)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val embed = Similarity.sharedEmbeddingPairs(spark, dir)
      .select(col("id_a"), col("id_b"), col("cos"))
    text.join(embed, Seq("id_a", "id_b"), "full_outer")
      .withColumn("verdict",
        when(col("jaccard").isNotNull && col("cos").isNotNull, "both")
          .when(col("jaccard").isNotNull, "text_only")
          .otherwise("embed_only"))
      .select("id_a", "id_b", "jaccard", "cos", "verdict")
      .orderBy("id_a", "id_b")
  }

  // lazy: composes ngramJaccardPairsOracle (defined later in the file)
  lazy val dedupEnsembleOracle: String =
    s"""WITH text_pairs AS (
       |${ngramJaccardPairsOracle.linesIterator.map("  " + _).mkString("\n")}
       |), embed_pairs AS (
       |  SELECT * FROM (
       |${Similarity.embeddingNearDupsOracle().linesIterator.map("    " + _).mkString("\n")}
       |  ) e
       |)
       |SELECT
       |  coalesce(t.id_a, p.id_a) AS id_a,
       |  coalesce(t.id_b, p.id_b) AS id_b,
       |  t.jaccard, p.cos,
       |  CASE WHEN t.id_a IS NOT NULL AND p.id_a IS NOT NULL THEN 'both'
       |       WHEN t.id_a IS NOT NULL THEN 'text_only'
       |       ELSE 'embed_only' END AS verdict
       |FROM text_pairs t FULL OUTER JOIN embed_pairs p
       |  ON t.id_a = p.id_a AND t.id_b = p.id_b
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------- keep-BEST canonical
  /** Quality-aware canonical selection: keep-one-per-cluster where the
    * survivor is the BEST copy (most tokens, doc_id tie-break), not the
    * first — the policy real pipelines want when near-dup clusters mix a
    * full article with its truncated mirrors ([[dedupKeepList]]'s
    * smallest-id rule keeps whichever mirror crawled first). On the
    * planted fixture the perturbed copy drops a word, so keep-best must
    * retain every ORIGINAL — pinned in the spec. Token counts come from
    * one projection of the corpus (integers, oracle-exact); the argmax is
    * a per-cluster window over cluster labels joined to that projection —
    * both sides shuffle (id, small-int) pairs only, never text.
    *
    * 100 TB shape: identical to [[dedupKeepList]] plus one
    * (doc_id → n_tokens) projection join; the per-cluster window
    * partitions by cluster_id (clusters are near-dup-sized, never
    * corpus-sized partitions). */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val quality = corpusWithNearDups(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("n_tokens"))
    val clusters = dedupClusters(spark, dir)
    val w = Window.partitionBy("cluster_id").orderBy(col("n_tokens").desc, col("doc_id"))
    val best = clusters.join(quality, "doc_id")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"))
    quality.join(clusters, Seq("doc_id"), "left")
      .join(best, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("n_tokens"),
        when(col("keep_id").isNull || col("keep_id") === col("doc_id"), 1L)
          .otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  // def, not val: composes dedupClustersOracle (defined later in the file)
  def dedupKeepBestOracle: String =
    s"""WITH corpus AS (
       |  ${corpusSql.linesIterator.mkString("\n|  ")}
       |), quality AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM corpus
       |), clusters AS (
       |  SELECT * FROM (
       |${dedupClustersOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), best AS (
       |  SELECT cluster_id, doc_id AS keep_id FROM (
       |    SELECT cl.cluster_id, cl.doc_id,
       |      row_number() OVER (PARTITION BY cl.cluster_id
       |                         ORDER BY q.n_tokens DESC, cl.doc_id) AS rnk
       |    FROM clusters cl JOIN quality q ON q.doc_id = cl.doc_id
       |  ) WHERE rnk = 1
       |)
       |SELECT q.doc_id,
       |  coalesce(cl.cluster_id, q.doc_id) AS cluster_id,
       |  q.n_tokens,
       |  CAST(CASE WHEN b.keep_id IS NULL OR b.keep_id = q.doc_id THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM quality q
       |LEFT JOIN clusters cl ON cl.doc_id = q.doc_id
       |LEFT JOIN best b ON b.cluster_id = cl.cluster_id
       |ORDER BY q.doc_id""".stripMargin

  // --------------------------------------------------- degree histogram
  /** DEGREE HISTOGRAM of the verified near-dup graph — the shape
    * diagnostic an ingest operator reads before trusting transitive
    * dedup: a healthy corpus is dominated by degree-1 mutual pairs; a fat
    * tail means template content (candidates for [[pagerankHubs]]) and a
    * sudden mode shift means the shingle/banding config broke. Two tiny
    * aggregates over the materialized pair graph — no corpus access. */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    pairs.select(col("id_a").as("doc_id"))
      .unionAll(pairs.select(col("id_b").as("doc_id")))
      .groupBy("doc_id").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
      .orderBy("degree")
  }

  // lazy: composes ngramJaccardPairsOracle (defined later in the file)
  lazy val degreeHistogramOracle: String =
    s"""WITH verified AS (
       |${ngramJaccardPairsOracle.linesIterator.map("  " + _).mkString("\n")}
       |), ends AS (
       |  SELECT id_a AS doc_id FROM verified
       |  UNION ALL
       |  SELECT id_b AS doc_id FROM verified
       |), deg AS (
       |  SELECT doc_id, count(*) AS degree FROM ends GROUP BY doc_id
       |)
       |SELECT degree, count(*) AS n_docs FROM deg
       |GROUP BY degree ORDER BY degree""".stripMargin

  // ------------------------------------------------------ PageRank hubs
  /** PAGERANK over the verified near-dup graph — the hub detector: a
    * document whose near-dup neighborhood is large and well-connected is
    * template/boilerplate content (the "same page, thousand mirrors"
    * pattern), and its rank concentrates mass where degree counting
    * alone can't distinguish one hub from many chains. Three power
    * iterations, damping 0.85, unrolled as join → group-by rounds over
    * the materialized pair graph.
    *
    * Cross-engine exactness: ranks live in INTEGER micro-units
    * (r₀ = 10⁶); each round is `150000 + (850 · Σ (r(u) div deg(u))) div
    * 1000` — floor divisions on non-negative BIGINTs agree between
    * Spark's `div` and DuckDB's `//`, so three rounds stay bit-identical
    * with zero float drift (the ivfRefined integer-E-step recipe).
    *
    * 100 TB shape: per round, one equi-join of the rank table against the
    * edge list + one partial+final sum shuffle — the canonical Pregel
    * step as plain DataFrame ops; the edge list is the already
    * materialized stage. */
  def pagerankHubs(spark: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true) // reused every round; truncates lineage growth
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var rank = deg.select(col("src").as("doc_id"), lit(1000000L).as("pr"))
    (0 until iters).foreach { _ =>
      val contrib = edges
        .join(rank.withColumnRenamed("doc_id", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_sum"))
      rank = rank.join(contrib.withColumnRenamed("dst", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + expr("(850 * coalesce(in_sum, 0L)) div 1000")).as("pr"))
    }
    rank.orderBy("doc_id")
  }

  /** Oracle unrolled to the SAME `iters` as the query it gates (a fixed
    * 3-round oracle against a parameterized query would silently compare
    * different computations for any other `iters`). A def, not a val: it
    * composes ngramJaccardPairsOracle, which is defined later in the
    * file — eager evaluation at object init would NPE. */
  def pagerankHubsOracle(iters: Int = 3): String = {
    require(iters >= 1, "pagerank needs at least one iteration")
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT r.doc_id,
         |    150000 + (850 * coalesce(s.in_sum, 0)) // 1000 AS pr
         |  FROM $prev r LEFT JOIN (
         |    SELECT e.dst AS doc_id, sum(p.pr // d.deg) AS in_sum
         |    FROM edges e
         |    JOIN $prev p ON p.doc_id = e.src
         |    JOIN deg d ON d.src = e.src
         |    GROUP BY e.dst) s ON s.doc_id = r.doc_id
         |)""".stripMargin
    val rounds = (1 to iters).map(i => round(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH verified AS (
       |${ngramJaccardPairsOracle.linesIterator.map("  " + _).mkString("\n")}
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM verified
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM verified
       |), deg AS (
       |  SELECT src, count(*) AS deg FROM edges GROUP BY src
       |), r0 AS (
       |  SELECT src AS doc_id, CAST(1000000 AS BIGINT) AS pr FROM deg
       |), $rounds
       |SELECT doc_id, CAST(pr AS BIGINT) AS pr FROM r$iters ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------- takedown manifest
  /** TAKEDOWN (right-to-be-forgotten) manifest — the governance op every
    * training-data pipeline needs: for each requested document, the purge
    * work list. Removing only the named doc is NOT enough — its verified
    * near-duplicates carry the same content, so the manifest counts them
    * (`n_linked`, from the materialized verified-pair graph) and names the
    * training shard holding the doc (from the deterministic shuffle, so
    * the rewrite touches exactly one shard per doc).
    *
    * 100 TB shape: requests are takedown-sized (thousands) — they
    * broadcast; the verified graph and shard map are the already-built
    * artifacts, so the manifest costs two small joins, no corpus scan. */
  def takedownManifest(spark: SparkSession, dir: String): DataFrame = {
    val requests = table(spark, dir, "documents")
      .filter(col("doc_id") % 41 === 0).select("doc_id")
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("req"), col("id_b").as("nbr"))
      .unionAll(pairs.select(col("id_b").as("req"), col("id_a").as("nbr")))
    val linked = broadcast(requests)
      .join(edges, col("doc_id") === col("req"), "left")
      .groupBy("doc_id").agg(count(col("nbr")).as("n_linked"))
    linked.join(TextAnalysis.shuffleShards(spark, dir).select("doc_id", "shard"), "doc_id")
      .select("doc_id", "shard", "n_linked")
      .orderBy("doc_id")
  }

  /** VERIFICATION-THRESHOLD SWEEP (round 11) — the tuning table for the
    * dedup knob [[dedupBandingCurve]] does NOT cover: banding fixes which
    * pairs are CANDIDATES; the verification threshold fixes which survive.
    * From the ONE materialized verified-pair graph, per candidate threshold
    * t ∈ {0.5 … 1.0}: surviving pair volume, documents touched by any
    * surviving pair (the upper bound on keep-policy drops), and the max
    * per-doc degree (the mega-cluster early-warning — a hub that explodes
    * as t falls means near-identical boilerplate, not true duplication).
    * One pass: the pair table (already ≪ corpus) explodes ×|thresholds|,
    * then two bounded group-bys; thresholds with zero survivors still get
    * a row (left join from the threshold spine). Threshold compares run
    * `jaccard·1000 ≥ t` in IEEE doubles on both engines — bit-identical
    * because both compute the same |∩|/|∪| division. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val th = Seq(500L, 600L, 700L, 800L, 900L, 1000L)
    val spine = th.toDF("t_permille")
    val hits = sharedVerifiedPairs(spark, dir)
      .withColumn("t_permille", explode(array(th.map(lit): _*)))
      .filter(col("jaccard") * 1000.0 >= col("t_permille").cast("double"))
    val nPairs = hits.groupBy("t_permille").agg(count(lit(1)).as("n_pairs"))
    val docs = hits
      .select(col("t_permille"), explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .groupBy("t_permille", "doc_id").agg(count(lit(1)).as("degree"))
      .groupBy("t_permille")
      .agg(count(lit(1)).as("n_docs_linked"), max(col("degree")).as("max_degree"))
    spine.join(nPairs, Seq("t_permille"), "left").join(docs, Seq("t_permille"), "left")
      .select(col("t_permille"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs_linked"), lit(0L)).as("n_docs_linked"),
        coalesce(col("max_degree"), lit(0L)).as("max_degree"))
      .orderBy("t_permille")
  }

  // lazy: composes ngramJaccardPairsOracle (defined later in the file)
  lazy val thresholdSweepOracle: String =
    s"""WITH pairs AS (
       |  SELECT * FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), th AS (
       |  SELECT CAST(unnest([500, 600, 700, 800, 900, 1000]) AS BIGINT) AS t_permille
       |), hits AS (
       |  SELECT t.t_permille, p.id_a, p.id_b FROM pairs p
       |  JOIN th t ON p.jaccard * 1000 >= CAST(t.t_permille AS DOUBLE)
       |), np AS (
       |  SELECT t_permille, count(*) AS n_pairs FROM hits GROUP BY t_permille
       |), deg AS (
       |  SELECT t_permille, doc_id, count(*) AS degree FROM (
       |    SELECT t_permille, id_a AS doc_id FROM hits
       |    UNION ALL
       |    SELECT t_permille, id_b AS doc_id FROM hits
       |  ) GROUP BY t_permille, doc_id
       |), docs AS (
       |  SELECT t_permille, count(*) AS n_docs_linked, max(degree) AS max_degree
       |  FROM deg GROUP BY t_permille
       |)
       |SELECT t.t_permille,
       |  CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(coalesce(docs.n_docs_linked, 0) AS BIGINT) AS n_docs_linked,
       |  CAST(coalesce(docs.max_degree, 0) AS BIGINT) AS max_degree
       |FROM th t
       |LEFT JOIN np USING (t_permille)
       |LEFT JOIN docs USING (t_permille)
       |ORDER BY t.t_permille""".stripMargin

  // ------------------------------------------------- pair audit sample
  /** DEDUP AUDIT SAMPLE (round 11) — the eyeball set: the k verified
    * pairs whose Jaccard sits CLOSEST to the keep/drop decision boundary
    * (J = 0.5), with a content md5 per side so a reviewer can pull the
    * exact texts. Pairs far from the boundary are obviously right; the
    * cusp band is where a threshold moves real documents, and sampling it
    * deterministically (distance, then ids) makes two reviewers — or two
    * releases — audit the SAME pairs.
    *
    * 100 TB shape: the pair graph is already ≪ corpus; the k-nearest cusp
    * selection is orderBy+limit → TakeOrderedAndProject (O(k) state per
    * partition, no global sort); the k sampled ids then BROADCAST against
    * the corpus for their md5s — two tiny joins, one corpus scan.
    * The permille floor runs on the same IEEE division both engines
    * compute, the [[thresholdSweep]] precedent. */
  def auditSample(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val cusp = sharedVerifiedPairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        floor(col("jaccard") * 1000).cast("bigint").as("j_permille"))
      .withColumn("cusp_dist", abs(col("j_permille") - 500))
      .orderBy(col("cusp_dist"), col("id_a"), col("id_b"))
      .limit(k)
    val texts = corpusWithNearDups(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
    broadcast(cusp)
      .join(texts.select(col("doc_id").as("id_a"), col("h").as("md5_a")), "id_a")
      .join(texts.select(col("doc_id").as("id_b"), col("h").as("md5_b")), "id_b")
      .select("id_a", "id_b", "j_permille", "cusp_dist", "md5_a", "md5_b")
      .orderBy("id_a", "id_b")
  }

  // lazy: composes ngramJaccardPairsOracle (defined later in the file)
  lazy val auditSampleOracle: String =
    s"""WITH pairs AS (
       |  SELECT * FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), corpus AS (
       |  ${corpusSql.linesIterator.mkString("\n|  ")}
       |), sampled AS (
       |  SELECT id_a, id_b,
       |    CAST(floor(jaccard * 1000) AS BIGINT) AS j_permille,
       |    abs(CAST(floor(jaccard * 1000) AS BIGINT) - 500) AS cusp_dist
       |  FROM pairs
       |  ORDER BY cusp_dist, id_a, id_b
       |  LIMIT 20
       |)
       |SELECT s.id_a, s.id_b, s.j_permille, s.cusp_dist,
       |  md5(ca.text) AS md5_a, md5(cb.text) AS md5_b
       |FROM sampled s
       |JOIN corpus ca ON ca.doc_id = s.id_a
       |JOIN corpus cb ON cb.doc_id = s.id_b
       |ORDER BY s.id_a, s.id_b""".stripMargin

  /** The full PURGE SET behind [[takedownManifest]]: the requested docs
    * PLUS their verified near-duplicates (same content, different id) as
    * one distinct id column — the set a release must not contain. Shared
    * by [[TextAnalysis.releaseReport]]'s `kept_takedown` gate. Shape:
    * requests broadcast against the materialized pair graph; only 8 B ids
    * move. */
  def takedownPurgeSet(spark: SparkSession, dir: String): DataFrame = {
    val requests = table(spark, dir, "documents")
      .filter(col("doc_id") % 41 === 0).select("doc_id")
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    val edges = pairs.select(col("id_a").as("req"), col("id_b").as("nbr"))
      .unionAll(pairs.select(col("id_b").as("req"), col("id_a").as("nbr")))
    val linked = broadcast(requests)
      .join(edges, col("doc_id") === col("req"))
      .select(col("nbr").as("doc_id"))
    requests.unionAll(linked).distinct()
  }

  // lazy: composes ngramJaccardPairsOracle (defined later in the file)
  lazy val takedownManifestOracle: String =
    s"""WITH verified AS (
       |${ngramJaccardPairsOracle.linesIterator.map("  " + _).mkString("\n")}
       |), edges AS (
       |  SELECT id_a AS req, id_b AS nbr FROM verified
       |  UNION ALL
       |  SELECT id_b AS req, id_a AS nbr FROM verified
       |), requests AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 41 = 0
       |), linked AS (
       |  SELECT r.doc_id, count(e.nbr) AS n_linked
       |  FROM requests r LEFT JOIN edges e ON e.req = r.doc_id
       |  GROUP BY r.doc_id
       |), hashed AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
       |  FROM documents
       |)
       |SELECT l.doc_id, h.skey % 8 AS shard, l.n_linked
       |FROM linked l JOIN hashed h USING (doc_id)
       |ORDER BY l.doc_id""".stripMargin

  // ------------------------------------------------- incremental dedup
  /** INCREMENTAL dedup against a REFERENCE corpus: which incoming documents
    * survive when everything colliding with an already-ingested corpus is
    * dropped — the streaming-ingest form of near-dedup (v2 of a crawl
    * against v1, a new dump against the training set so far). Here the
    * planted perturbed copies (doc_id ≥ 10⁶) play the reference and the
    * originals are the incoming batch.
    *
    * Collision = sharing ANY (band, band_hash) LSH bucket with a reference
    * doc — the standard conservative candidate-level filter (no pairwise
    * verify pass: at ingest you'd rather over-drop than over-keep).
    * Shape: bands derive from the materialized [[sharedSignatures]] stage;
    * the reference's DISTINCT bucket set semi-joins the incoming bands on
    * the 16-byte band hash — two linear shuffles, no pair enumeration at
    * all. Docs under 3 words have no bands and are out of scope (they
    * cannot near-dup by shingles). */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandsFromSig(sharedSignatures(spark, dir))
    val incoming = bands.filter(col("doc_id") < IdOffset)
    val ref = bands.filter(col("doc_id") >= IdOffset)
      .select("band", "band_hash").distinct()
    val flagged = incoming.join(ref, Seq("band", "band_hash"), "left_semi")
      .select("doc_id").distinct()
    // summary row (n_incoming / n_flagged / n_survivors): on this fixture
    // LSH recall on the planted copies is ~100%, so a survivor LIST would
    // be empty — the counts are the operative ingest metric anyway
    incoming.select("doc_id").distinct().agg(count(lit(1)).as("n_incoming"))
      .crossJoin(flagged.agg(count(lit(1)).as("n_flagged")))
      .withColumn("n_survivors", col("n_incoming") - col("n_flagged"))
  }

  val dedupIncrementalOracle: String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS h$i")
      .mkString(",\n    ")
    val bandRows = (0 until NumHashes / BandSize)
      .map { b =>
        val parts = (0 until BandSize).map(j => s"h${b * BandSize + j}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS band_hash FROM sig"
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), shingled AS (
       |  SELECT doc_id,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM corpus
       |  WHERE len(string_split(text, ' ')) >= 3
       |), sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM shingled
       |), bands AS (
       |  $bandRows
       |), flagged AS (
       |  SELECT DISTINCT i.doc_id
       |  FROM bands i JOIN bands r ON i.band = r.band AND i.band_hash = r.band_hash
       |  WHERE i.doc_id < $IdOffset AND r.doc_id >= $IdOffset
       |)
       |SELECT
       |  (SELECT count(DISTINCT doc_id) FROM bands WHERE doc_id < $IdOffset) AS n_incoming,
       |  (SELECT count(*) FROM flagged) AS n_flagged,
       |  (SELECT count(DISTINCT doc_id) FROM bands WHERE doc_id < $IdOffset)
       |    - (SELECT count(*) FROM flagged) AS n_survivors""".stripMargin
  }

  // ------------------------------------------------------ Bloom prefilter
  private val BloomBits = 1048576 // 2^20; 60 bits used per BIGINT word
  private val BloomK = 4

  /** k deterministic bit positions for a text hash: salted rolling hashes
    * mod m — pure integer math, identical cross-engine. */
  private def bloomBitCols(h: Column): Seq[Column] =
    (0 until BloomK).map(j =>
      TextAnalysis.rollingHash(concat(lit(s"bf$j|"), h)) % BloomBits)

  /** BLOOM-FILTER ingest prefilter — the cheap exact-duplicate screen that
    * runs BEFORE any expensive near-dup machinery at scale: the reference
    * corpus's text hashes are folded into an m = 2²⁰-bit Bloom filter
    * (k = 4 salted rolling hashes; 60 bits per BIGINT word so no shift
    * ever touches the sign bit), and every incoming doc probes it. A miss
    * on ANY bit proves the text is new; only probe-positive docs (true
    * dups + the filter's false positives) proceed to hashing/LSH.
    *
    * Incoming fixture: exact copies of every 3rd reference doc (MUST all
    * flag — a Bloom filter has no false negatives, asserted in the spec)
    * plus the perturbed suffix copies (should mostly pass; FP rate at
    * 500·4/2²⁰ load is ≈ 0).
    *
    * 100 TB shape: the filter is m/8 = 128 KB per 2²⁰ bits — build is one
    * linear scan + a 17k-row bit_or aggregate; the probe side joins that
    * BROADCAST word table, so admission control costs one scan and zero
    * shuffles of the incoming corpus. Sized up (m ∝ corpus), a 10¹¹-doc
    * filter at 1% FP is ~120 GB — partition the key space by `w` range and
    * the same plan holds with the word table bucket-joined instead of
    * broadcast. */
  def bloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val words = d.select(explode(array(bloomBitCols(md5(col("text"))): _*)).as("bit"))
      .select(expr("bit div 60").as("w"), col("bit") % 60 as "b")
      .groupBy("w")
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).as("word"))
    val incoming = d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 2 * IdOffset).as("doc_id"), col("text"))
      .unionAll(d.select((col("doc_id") + IdOffset).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
    val hits = incoming
      .select(col("doc_id"), explode(array(bloomBitCols(md5(col("text"))): _*)).as("bit"))
      .select(col("doc_id"), expr("bit div 60").as("w"), col("bit") % 60 as "b")
      .join(broadcast(words), Seq("w"), "left")
      .withColumn("hit", coalesce(
        (col("word").bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"))) =!= 0L,
        lit(false)))
      .groupBy("doc_id").agg(bool_and(col("hit")).as("all_hit"))
    hits.agg(
      count(lit(1)).as("n_incoming"),
      sum(when(col("all_hit"), 1L).otherwise(0L)).as("n_flagged"),
      sum(when(col("all_hit"), 0L).otherwise(1L)).as("n_pass"))
  }

  val bloomPrefilterOracle: String = {
    def fold(s: String): String =
      s"""list_reduce(
         |      list_prepend(CAST(0 AS BIGINT),
         |        list_transform(
         |          list_filter(string_split($s, ''), c -> c != ''),
         |          c -> CAST(unicode(c) AS BIGINT))),
         |      (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin
    val refBit = fold("'bf' || CAST(j AS VARCHAR) || '|' || md5(text)")
    s"""WITH salts AS (
       |  SELECT unnest(range(0, $BloomK)) AS j
       |), ref_bits AS (
       |  SELECT ($refBit) % $BloomBits AS bit
       |  FROM documents CROSS JOIN salts
       |), words AS (
       |  SELECT bit // 60 AS w,
       |    bit_or(CAST(1 AS BIGINT) << CAST(bit % 60 AS INTEGER)) AS word
       |  FROM ref_bits GROUP BY 1
       |), incoming AS (
       |  SELECT doc_id + ${2 * IdOffset} AS doc_id, text FROM documents WHERE doc_id % 3 = 0
       |  UNION ALL
       |  SELECT doc_id + $IdOffset AS doc_id, substr(text, strpos(text, ' ') + 1) AS text
       |  FROM documents
       |), inc_bits AS (
       |  SELECT doc_id, ($refBit) % $BloomBits AS bit
       |  FROM incoming CROSS JOIN salts
       |), hits AS (
       |  SELECT i.doc_id,
       |    bool_and(w.word IS NOT NULL AND
       |             (w.word & (CAST(1 AS BIGINT) << CAST(i.bit % 60 AS INTEGER))) != 0) AS all_hit
       |  FROM inc_bits i LEFT JOIN words w ON w.w = i.bit // 60
       |  GROUP BY i.doc_id
       |)
       |SELECT count(*) AS n_incoming,
       |  CAST(sum(CASE WHEN all_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST(sum(CASE WHEN all_hit THEN 0 ELSE 1 END) AS BIGINT) AS n_pass
       |FROM hits""".stripMargin
  }

  /** MinHash signature per GROUP (here: per language) via the
    * [[graft.functions.MinHashAgg]] TypedImperativeAggregate — the mergeable
    * sketch form: shingles stream through a partial aggregate on every
    * partition and buffers combine by element-wise min, so a group's
    * signature never needs its members co-located or collected. */
  def groupSignatures(spark: SparkSession, dir: String): DataFrame =
    // per-doc signatures come from the materialized shared stage (same
    // hasShingles filter, same native one-pass minhash); the INNER join
    // back to the documents table both attaches the group key and selects
    // exactly the raw (non-planted) docs — planted ids are absent from the
    // table at any corpus factor. (An explicit `doc_id < IdOffset` filter
    // used to sit here; the 10× whole-suite ledger caught it dropping
    // replicas whose ids exceed the fixture offset while the oracle
    // scanned the full table — round 13.) Then elementwise min per group:
    // min over docs of (min over doc's shingles) = min over the group's
    // shingle union — the same signature the shingle-explode + MinHashAgg
    // form computes, but the shuffle carries one 8-element row per DOC
    // instead of one row per SHINGLE (~500× fewer rows). MinHashAgg
    // remains the general mergeable-sketch aggregate (spec-gated for
    // partition invariance).
    sharedSignatures(spark, dir)
      .join(table(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("sig"))
      .groupBy("lang")
      // the driver's compare sorts result columns in pandas, which cannot
      // hash/sort array cells — emit the signature as a joined string
      .agg(concat_ws(",",
        (0 until NumHashes).map(i => min(element_at(col("sig"), i + 1))): _*).as("sig"))
      .orderBy("lang")

  val groupSignaturesOracle: String = {
    val mins = (0 until NumHashes).map(i => s"min(md5('$i|' || shingle))").mkString(", ")
    s"""WITH shingled AS (
       |  SELECT lang,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3
       |), ex AS (
       |  SELECT lang, s.shingle FROM shingled, unnest(sh) AS s(shingle)
       |)
       |SELECT lang, array_to_string([$mins], ',') AS sig FROM ex GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------- SimHash

  private val SimBits = 16

  /** SimHash table (doc_id, simhash) at a given bit width, unordered —
    * shared by the signature query (16-bit compact form) and the
    * hamming-pair join (32-bit, sparse enough for pair detection).
    * One-pass native expression: a projection with NO shuffle (vs the
    * built-ins twin [[simhashTableHof]], which shuffles every word of the
    * corpus and carries `bits` aggregation buffers per doc — bit-equality
    * of the two forms is spec-tested). The trim guard reproduces the
    * explode form's drop of all-whitespace docs. */
  def simhashTable(spark: SparkSession, dir: String, bits: Int = SimBits,
      mod: Long = 1000000007L): DataFrame =
    corpusWithNearDups(spark, dir)
      .filter(trim(col("text")) =!= "")
      .select(col("doc_id"),
        graft.functions.VectorExpressions.simhash_words(col("text"), bits, mod).as("simhash"))

  /** Built-ins-only SimHash (explode → group-by → bits × sum(when)) — the
    * semantic reference [[simhashTable]] is tested bit-equal against. */
  def simhashTableHof(spark: SparkSession, dir: String, bits: Int = SimBits): DataFrame = {
    val exploded = corpusWithNearDups(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .withColumn("h", TextAnalysis.rollingHash(col("word")))
    val voteSums = (0 until bits).map { b =>
      sum(when(expr(s"(h div ${1L << b}) % 2") === 1, 1L).otherwise(-1L)).as(s"v$b")
    }
    val recombine = (0 until bits)
      .map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    exploded
      .groupBy("doc_id")
      .agg(voteSums.head, voteSums.tail: _*)
      .select(col("doc_id"), recombine.as("simhash"))
  }

  /** 16-bit SimHash per document: word hashes are the portable rolling
    * polynomial hash; bit b of the signature is the sign of the ±1 vote sum
    * over words. Computed with explode → group-by (distributed, no UDF). */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame =
    simhashTable(spark, dir).orderBy("doc_id")

  private val Sim64Bits = 56 // word hash is 58-bit (Mod58); top 2 bits skewed

  /** 64-bit-class (56-bit) SimHash: same vote construction as the 16-bit
    * signature but over the 58-bit-entropy rolling hash ([[graft.functions
    * .VectorExpressions.Mod58]]), which is what makes the high bits
    * meaningful — with the 30-bit default hash, bits 30+ of a "64-bit"
    * simhash would all be the sign of a constant-0 vote. 56 bits drops
    * random-pair hamming≤3 collisions to ~10⁻¹² (vs ~4·10⁻⁶ at 30 bits),
    * the regime needed when deduping 10¹⁰ documents. */
  def simhash64Signatures(spark: SparkSession, dir: String): DataFrame =
    simhashTable(spark, dir, Sim64Bits, graft.functions.VectorExpressions.Mod58)
      .orderBy("doc_id")

  val simhash64SignaturesOracle: String = {
    val mod = graft.functions.VectorExpressions.Mod58
    val votes = (0 until Sim64Bits)
      .map(b => s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val recombine = (0 until Sim64Bits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), wordhash AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_filter(string_split(w.word, ''), c -> c != ''),
       |                       c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % $mod) AS h
       |  FROM corpus, unnest(string_split(text, ' ')) AS w(word)
       |  WHERE w.word != ''
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM wordhash GROUP BY doc_id
       |)
       |SELECT doc_id, $recombine AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  private val SimPairBits = 30 // word-hash entropy is 30 bits (mod 1e9+7)
  private val SimBlocks = 5 // 6-bit blocks; keys are block PAIRS (multi-index)

  /** All (i,j) block-pair combinations — the multi-index hamming scheme:
    * with 5 blocks and ≤3 flipped bits, at most 3 blocks are touched, so
    * some PAIR of blocks is jointly untouched and the join on
    * (pair, value_i, value_j) is exact for hamming ≤ 3. Pair keys carry
    * 12 bits (vs 6 for single blocks), shrinking candidate buckets by ~64×. */
  private val blockPairs: Seq[(Int, Int)] =
    for (i <- 0 until SimBlocks; j <- i + 1 until SimBlocks) yield (i, j)

  /** Near-dup pairs by SimHash hamming distance ≤ 3, exact via multi-index
    * pigeonhole blocking. Random-pair collisions at ham ≤ 3 are ~4·10⁻⁶ on
    * 30 bits, so the verified output stays close to the true near-dups.
    * Shuffle key is (block-pair, 12-bit value); candidate volume is
    * Σ bucket² — tiny for hash-uniform signatures. */
  def simhashHammingPairs(spark: SparkSession, dir: String): DataFrame =
    simhashHammingPairsAt(spark, dir, SimPairBits, SimBlocks)

  /** Generalized multi-index hamming pair join: any (bits, blocks, mod)
    * with ≤3 flipped bits touching ≤3 blocks — exact whenever
    * blocks ≥ 5 (an untouched block PAIR always exists). */
  def simhashHammingPairsAt(spark: SparkSession, dir: String, bits: Int,
      blocks: Int, mod: Long = 1000000007L): DataFrame = {
    val blockBits = bits / blocks
    val pairs = for (i <- 0 until blocks; j <- i + 1 until blocks) yield (i, j)
    def bval(i: Int) = expr(s"(simhash div ${1L << (blockBits * i)}) % ${1L << blockBits}")
    // signature table materialized once per (session, dir, bits, mod):
    // it feeds both join sides, and a CacheManager persist here would
    // leak into later queries (same class as the minhash-family leak)
    val sig = memoStage(spark, dir, s"simhash_${bits}_$mod") {
      simhashTable(spark, dir, bits, mod)
    }
    val probes = sig.select(col("doc_id"),
      explode(array(pairs.zipWithIndex.map { case ((i, j), k) =>
        struct(lit(k).as("blk"), (bval(i) * (1L << blockBits) + bval(j)).as("bval"))
      }: _*)).as("p"))
      .select(col("doc_id"), col("p.blk").as("blk"), col("p.bval").as("bval"))
    // the multi-index buckets go through the SAME capped mechanism as the
    // minhash bands ([[cappedBucketPairs]]): a 10⁶-copy template puts all
    // copies into every one of its C(blocks,2) probe buckets, and an
    // uncapped self-join enumerates 10¹² combinations per bucket before
    // any post-filter can discard them. The cap replaces the earlier
    // minimal-matching-key dedup (a codegen'd per-row filter): that trick
    // deduped without a shuffle but required the pair to be PRESENT at
    // its smallest matching key — under a cap the smallest key's bucket
    // may not emit it — and its join still enumerated quadratic buckets.
    // The DISTINCT here sees ≤ C(blocks,2) copies of a bounded pair set.
    // Signatures ride back in on two 8-byte-key joins against the
    // memoized sig table rather than through the pair legs.
    cappedBucketPairs(probes, Seq("blk", "bval"), tag = s"simhash_blocks_$bits")
      .join(sig.select(col("doc_id").as("id_a"), col("simhash").as("sh_a")), "id_a")
      .join(sig.select(col("doc_id").as("id_b"), col("simhash").as("sh_b")), "id_b")
      .withColumn("hamming", expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** 55-bit pair detection (5 blocks of 11 bits, C(5,2)=10 probe keys of
    * 22 bits): the high-precision twin of [[simhashHammingPairs]] —
    * random-pair hamming≤3 collisions drop from ~4·10⁻⁶ (30-bit) to
    * ~10⁻¹², the regime where pair candidates stay clean at 10¹⁰
    * documents. 5×11 beats 7×8 on both axes: half the probe rows and
    * 64×-more-selective join keys, still pigeonhole-exact for ham ≤ 3. */
  private val Sim64PairBits = 55

  def simhash64HammingPairs(spark: SparkSession, dir: String): DataFrame =
    simhashHammingPairsAt(spark, dir, Sim64PairBits, 5, graft.functions.VectorExpressions.Mod58)

  val simhash64HammingPairsOracle: String =
    simhashPairsOracleAt(Sim64PairBits, 5, graft.functions.VectorExpressions.Mod58)

  /** Generalized DuckDB oracle for [[simhashHammingPairsAt]]. */
  def simhashPairsOracleAt(bits: Int, blocks: Int, mod: Long): String = {
    val blockBits = bits / blocks
    val pairs = for (i <- 0 until blocks; j <- i + 1 until blocks) yield (i, j)
    val votes = (0 until bits)
      .map(b => s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val recombine = (0 until bits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    def bval(i: Int) = s"(simhash // ${1L << (blockBits * i)}) % ${1L << blockBits}"
    val probeRows = pairs.zipWithIndex
      .map { case ((i, j), k) =>
        s"SELECT doc_id, simhash, $k AS blk, ${bval(i)} * ${1L << blockBits} + ${bval(j)} AS bval FROM sig"
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), wordhash AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_filter(string_split(w.word, ''), c -> c != ''),
       |                       c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % $mod) AS h
       |  FROM corpus, unnest(string_split(text, ' ')) AS w(word)
       |  WHERE w.word != ''
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM wordhash GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $recombine AS simhash FROM votes
       |), probes AS (
       |  $probeRows
       |), ${cappedPairsSql("probes", Seq("blk", "bval"))}
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(sga.simhash, sgb.simhash)) AS BIGINT) AS hamming
       |FROM capped
       |JOIN sig sga ON sga.doc_id = id_a
       |JOIN sig sgb ON sgb.doc_id = id_b
       |WHERE bit_count(xor(sga.simhash, sgb.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  val simhashHammingPairsOracle: String =
    simhashPairsOracleAt(SimPairBits, SimBlocks, 1000000007L)

  val simhashSignaturesOracle: String = {
    val votes = (0 until SimBits)
      .map(b => s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(",\n    ")
    val recombine = (0 until SimBits)
      .map(b => s"(CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), wordhash AS (
       |  SELECT doc_id,
       |    list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(list_filter(string_split(w.word, ''), c -> c != ''),
       |                       c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007) AS h
       |  FROM corpus, unnest(string_split(text, ' ')) AS w(word)
       |  WHERE w.word != ''
       |), votes AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM wordhash GROUP BY doc_id
       |)
       |SELECT doc_id, $recombine AS simhash
       |FROM votes ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------- n-gram Jaccard verify

  /** Verified near-dup pairs: the LSH band candidates re-scored with exact
    * 3-gram Jaccard, kept at J ≥ 0.5 — the canonical candidate→verify
    * composition. The expensive exact measure runs only on candidate pairs
    * (never all pairs), and the candidates come from the banded join whose
    * buckets stay small (a single-minhash block degenerates on a small
    * vocabulary: one popular min-shingle ⇒ giant bucket ⇒ quadratic pairs).
    * Reads the materialized [[sharedVerifiedPairs]] stage. */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    sharedVerifiedPairs(spark, dir).orderBy("id_a", "id_b")

  val ngramJaccardPairsOracle: String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS h$i")
      .mkString(",\n    ")
    val bandRows = (0 until NumHashes / BandSize)
      .map { b =>
        val parts = (0 until BandSize).map(j => s"h${b * BandSize + j}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS band_hash FROM sig"
      }
      .mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), shingled AS (
       |  SELECT doc_id,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM corpus
       |  WHERE len(string_split(text, ' ')) >= 3
       |), sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM shingled
       |), bands AS (
       |  $bandRows
       |), ${cappedPairsSql("bands", Seq("band", "band_hash"))}
       |, sets AS (
       |  SELECT doc_id, list_distinct(sh) AS shd FROM shingled
       |)
       |SELECT id_a, id_b,
       |  CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE) / len(list_distinct(list_concat(sa.shd, sb.shd))) AS jaccard
       |FROM capped
       |JOIN sets sa ON sa.doc_id = id_a
       |JOIN sets sb ON sb.doc_id = id_b
       |WHERE CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE) / len(list_distinct(list_concat(sa.shd, sb.shd))) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---------------------------------------------------- graph diagnostics
  /** Triangle count over the verified near-dup graph — the standard
    * cohesion diagnostic before trusting transitive closure (a chain A-B-C
    * with no A-C edge merges on transitivity alone; triangles are
    * mutually-verified merges). Distributed shape: two equi-joins over the
    * canonically-ordered edge list (a<b<c), each shuffling on a vertex id —
    * the classic MapReduce triangle enumeration, no adjacency matrix ever
    * materialized. */
  def nearDupTriangles(spark: SparkSession, dir: String): DataFrame = {
    // the edge list is the materialized shared stage — joined three times
    // below, each side reads checkpoint blocks, so no per-query persist
    // (round 3 leaked exactly such a cache into later bench queries)
    val e = sharedVerifiedPairs(spark, dir).select(col("id_a"), col("id_b"))
    val e1 = e.select(col("id_a").as("a"), col("id_b").as("b"))
    val e2 = e.select(col("id_a").as("b"), col("id_b").as("c"))
    val e3 = e.select(col("id_a").as("a"), col("id_b").as("c"))
    val n = e1.join(e2, "b").join(e3, Seq("a", "c"))
      .agg(count(lit(1)).as("n_triangles"))
      .collect()(0).getLong(0)
    import spark.implicits._
    Seq(n).toDF("n_triangles")
  }

  val nearDupTrianglesOracle: String =
    s"""WITH pairs AS (
       |  SELECT id_a, id_b FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |)
       |SELECT count(*) AS n_triangles
       |FROM pairs e1
       |JOIN pairs e2 ON e2.id_a = e1.id_b
       |JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b""".stripMargin

  // ----------------------------------------------- source-overlap matrix
  /** SOURCE-OVERLAP matrix: verified near-dup pair counts rolled up to
    * (source, source) — "which sources share content". The standard
    * mirror-site / syndication diagnostic before mixture budgeting: two
    * sources with heavy overlap double-count their shared documents in any
    * per-source token budget, and the cheaper source should usually be
    * dropped. Endpoints map to sources via the planted-id convention
    * (copy id = original + [[IdOffset]]), pairs canonicalize by
    * (least, greatest) so the matrix is upper-triangular.
    *
    * 100 TB shape: two equi-joins of the (small) pair graph against the
    * doc→source projection, then a rollup whose cardinality is
    * |sources|² at most — nothing scales with corpus size except the two
    * 8 B-key joins. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val srcs = table(spark, dir, "documents").select(col("doc_id").as("orig"), col("source"))
    sharedVerifiedPairs(spark, dir)
      .select((col("id_a") % IdOffset).as("oa"), (col("id_b") % IdOffset).as("ob"))
      .join(srcs.select(col("orig").as("oa"), col("source").as("sa")), "oa")
      .join(srcs.select(col("orig").as("ob"), col("source").as("sb")), "ob")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  lazy val sourceOverlapOracle: String =
    s"""WITH pairs AS (
       |  SELECT id_a, id_b FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), srcs AS (
       |  SELECT doc_id AS orig, source FROM documents
       |)
       |SELECT least(sa.source, sb.source) AS source_a,
       |       greatest(sa.source, sb.source) AS source_b,
       |       count(*) AS n_pairs
       |FROM pairs p
       |JOIN srcs sa ON sa.orig = p.id_a % $IdOffset
       |JOIN srcs sb ON sb.orig = p.id_b % $IdOffset
       |GROUP BY 1, 2
       |ORDER BY source_a, source_b""".stripMargin

  // ------------------------------------------------- fuzzy (edit-distance)
  /** Fuzzy duplicate pairs by EDIT DISTANCE ≤ 2 over part names — the
    * record-linkage companion to the token-set (jaccard) and bit-signature
    * (simhash) dedup families: catches typo-class corruption that changes
    * a single character (token-set methods see an entirely different token;
    * simhash sees a different word hash). Levenshtein is exact integer DP
    * in both engines, so the whole operator is oracle-gated.
    *
    * Scale shape — record-linkage canonical form: the DP runs over
    * DISTINCT names (with per-name row counts carried along), not over
    * rows, so cost and output are vocabulary-bounded — matching a name
    * pair back to row pairs is a cheap equi-join the caller does when
    * needed. Candidates come from a BLOCKED equi-join on (name length,
    * first word) — an edit-distance-1/2 corruption in a later token
    * preserves both. lev=0 (exact duplicates) is excluded: that is the
    * exact-dedup family's job. Like the other dedup demos the fixture
    * plants its own near-dups: every name's copy with the last character
    * replaced by 'q', distance 1 from its source. */
  def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame =
    fuzzyNamePairsImpl(spark, dir, materialize = true)

  /** Un-materialized twin for plan audits. */
  private[graft] def fuzzyNamePairsPlan(spark: SparkSession, dir: String): DataFrame =
    fuzzyNamePairsImpl(spark, dir, materialize = false)

  private def fuzzyNamePairsImpl(spark: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val names = table(spark, dir, "part")
      .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("n_rows"))
    val perturbed = names.select(
      concat(expr("substring(name, 1, length(name) - 1)"), lit("q")).as("name"),
      col("n_rows"))
      .groupBy("name").agg(sum("n_rows").as("n_rows"))
    val all = names.unionAll(perturbed)
      .groupBy("name").agg(sum("n_rows").as("n_rows"))
      .withColumn("blk_len", length(col("name")))
      .withColumn("blk_word", expr("split_part(name, ' ', 1)"))
    // distinct-name-sized, read by BOTH self-join sides (the r16
    // scored-stage pattern) — without materialization the name
    // aggregation + perturbation union ran once per side (r17; plan:
    // 4 part scans → 1)
    val allM = if (materialize) all.localCheckpoint(false) else all
    val a = allM.select(col("blk_len"), col("blk_word"),
      col("name").as("name_a"), col("n_rows").as("rows_a"))
    val b = allM.select(col("blk_len"), col("blk_word"),
      col("name").as("name_b"), col("n_rows").as("rows_b"))
    a.join(b, Seq("blk_len", "blk_word"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")).cast("bigint"))
      .filter(col("lev") >= 1 && col("lev") <= 2)
      .select("name_a", "name_b", "lev", "rows_a", "rows_b")
      .orderBy("name_a", "name_b")
  }

  val fuzzyNamePairsOracle: String =
    """WITH names AS (
      |  SELECT p_name AS name, count(*) AS n_rows FROM part GROUP BY p_name
      |), perturbed AS (
      |  SELECT substring(name, 1, length(name) - 1) || 'q' AS name,
      |         CAST(sum(n_rows) AS BIGINT) AS n_rows
      |  FROM names GROUP BY 1
      |), all_names AS (
      |  SELECT name, CAST(sum(n_rows) AS BIGINT) AS n_rows FROM (
      |    SELECT * FROM names UNION ALL SELECT * FROM perturbed
      |  ) GROUP BY name
      |), blocked AS (
      |  SELECT name, n_rows, length(name) AS blk_len,
      |         split_part(name, ' ', 1) AS blk_word
      |  FROM all_names
      |)
      |SELECT a.name AS name_a, b.name AS name_b,
      |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
      |       a.n_rows AS rows_a, b.n_rows AS rows_b
      |FROM blocked a
      |JOIN blocked b ON a.blk_len = b.blk_len AND a.blk_word = b.blk_word
      |WHERE a.name < b.name
      |  AND levenshtein(a.name, b.name) BETWEEN 1 AND 2
      |ORDER BY name_a, name_b""".stripMargin

  // ------------------------------------------------------ dedup clustering
  /** Transitive dedup clusters: connected components over the VERIFIED
    * near-dup pair graph (the step between pair detection and "keep one
    * per cluster" — pairs alone under-merge when A~B and B~C but A!~C).
    * Pregel-style min-label propagation: each iteration every node takes
    * the min label among itself and its neighbors — one join + one
    * aggregate per round, converging in O(cluster diameter) rounds
    * (driver only checks the convergence COUNT; all data work is
    * distributed, exactly GraphX's connected-components loop). The DuckDB
    * oracle computes the same components by recursive-CTE transitive
    * closure + min over reachable ids. */
  def dedupClusters(spark: SparkSession, dir: String, maxIters: Int = 20): DataFrame = {
    // memoized (r16): the CC fixpoint is an EAGER driver loop (one join +
    // one count per round) that SEVEN declared queries re-ran end to end
    // (keep list/weights/impact/bias/funnel/sizes/gate — the gate even
    // twice, via labels AND the histogram). Labels are |graph nodes| rows
    // of two longs; build once per (session, dir), release after the last
    // consumer. This is also the production shape: cluster once, answer
    // every downstream question from the label table.
    val labels = memoStage(spark, dir, s"cc_labels_$maxIters") {
      val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
      // symmetrized edges: a cheap union-projection over the materialized
      // pair-graph blocks, re-read per propagation round — no extra persist
      val edges = pairs
        .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      val seed = edges.select(col("id_a").as("doc_id")).distinct()
        .withColumn("label", col("doc_id"))
      propagateMinLabels(edges, seed, maxIters)
    }
    labels.select(col("doc_id"), col("label").as("cluster_id")).orderBy("doc_id")
  }

  /** Cluster-SIZE distribution of the near-dup graph — "is duplication a
    * long tail of pairs or a few mega-clusters", the number that decides
    * whether keep-one dedup recovers 1 % or 40 % of the corpus. Sizes come
    * from the converged CC labels (cluster-keyed count), then a log₂
    * histogram over the size domain plus the documents-at-stake mass per
    * bucket. NOT SQL-expressible (the labels are the iterative CC
    * fixpoint), so the driver records rows-only; exact cluster semantics
    * are pinned by the CC specs and [[dedupClusters]]' own oracle. */
  def clusterSizeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(spark, dir)
    labels.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .groupBy(length(expr("bin(sz)")).cast("bigint").as("size_bucket"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_docs"),
        min(col("sz")).as("min_size"), max(col("sz")).as("max_size"))
      .orderBy("size_bucket")
  }

  /** Rounds of plain 1-hop propagation before POINTER JUMPING switches on:
    * shallow components (the overwhelmingly common near-dup case — groups
    * of a handful of documents) converge before jumping would pay for its
    * extra self-join per round; a graph still unconverged after this many
    * hops has proven itself deep, and jumping's O(log d) takes over. */
  private val JumpAfter = 4

  /** Min-label propagation loop with ADAPTIVE POINTER JUMPING, factored out
    * so specs can drive it on a planted graph. Every round propagates —
    * each node takes the min label over its neighborhood (1 hop of
    * progress). From round [[JumpAfter]] on, a second step jumps: each
    * node replaces its label with that label-node's own previous-round
    * label (`label ← label(label)`, path-halving), turning O(diameter)
    * convergence into O(log diameter) — the decisive difference on long
    * near-dup chains at corpus scale, while shallow graphs never pay the
    * extra per-round join (measured 2.5× on the fixture when always on).
    * Both steps only ever replace a label with a smaller label from the
    * same component, so the fixpoint is exactly the per-component minimum.
    *
    * Per round: `localCheckpoint` truncates the lineage (the plan would
    * otherwise grow joins-deep per round — quadratic driver-side planning
    * cost and a guaranteed stall), and the previous label rides along so
    * the convergence check is a filter over the materialized checkpoint,
    * not another join. Non-convergence at `maxIters` THROWS: silently
    * returning partially-propagated labels would merge-under — a wrong
    * cluster_id is worse than a loud abort.
    */
  /** Rounds the LAST [[propagateMinLabels]] run took to converge — driver
    * pacing visibility (VERDICT r16 #9): every round costs one
    * localCheckpoint job + one count, so the fixture's round count IS the
    * iteration budget a 100 TB run pays per clustering pass.
    * `CcConvergenceSpec` pins it (≤ JumpAfter + O(log diameter)) so a
    * regression in the jumping step can't silently multiply driver
    * round-trips. Single-session test hook — not part of any query. */
  @volatile private[graft] var lastConvergenceRounds: Int = -1

  private[operators] def propagateMinLabels(
      edges: DataFrame, seed: DataFrame, maxIters: Int): DataFrame = {
    var labels = seed.localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges.join(labels, edges("id_b") === labels("doc_id"))
        .groupBy(edges("id_a").as("nid")).agg(min("label").as("nmin"))
      val stepped = labels.join(neighborMin, labels("doc_id") === col("nid"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          col("label").as("prev_label"))
      val jumped =
        if (i < JumpAfter) stepped
        else {
          val jump = labels.select(col("doc_id").as("j_doc"), col("label").as("j_lbl"))
          stepped.join(jump, col("label") === col("j_doc"), "left")
            .select(col("doc_id"),
              least(col("label"), coalesce(col("j_lbl"), col("label"))).as("label"),
              col("prev_label"))
        }
      val updated = jumped
        .localCheckpoint() // truncates lineage; superseded checkpoint blocks
                           // are reclaimed by the ContextCleaner on dereference
      val changed = updated.filter(col("label") =!= col("prev_label")).count()
      labels = updated.select("doc_id", "label")
      converged = changed == 0
      i += 1
    }
    lastConvergenceRounds = i
    if (!converged)
      throw new IllegalStateException(
        s"dedupClusters did not converge in $maxIters iterations — component " +
          s"diameter exceeds maxIters; raise maxIters (labels would be wrong)")
    labels
  }

  /** Connected components via LARGE-STAR / SMALL-STAR (the MapReduce CC
    * algorithm of Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — the O(log²n)-round alternative to label
    * propagation whose round count scales with component DIAMETER. Each
    * round rewrites the edge set:
    *
    *  - large-star: per node u with neighborhood N(u), connect every
    *    strictly-larger neighbor to m = min(N(u) ∪ {u});
    *  - small-star: per node u over its smaller-or-equal neighbors S(u),
    *    connect each of them (and u) to m = min(S(u)).
    *
    * Both steps only link nodes within a component and only ever point
    * upward to smaller ids, so the fixpoint is a star per component rooted
    * at the component minimum — labels fall out of the final edge list
    * without any propagation phase. Convergence is detected by an edge-set
    * signature (count + XOR of 64-bit hashes): one tiny aggregate per
    * round instead of a set-difference join; a signature collision would
    * need an XOR tie on differing same-size sets (astronomically unlikely,
    * and the oracle gate still pins end-to-end correctness).
    *
    * vs [[dedupClusters]]: propagation does 1 join/round with rounds ~
    * diameter (pointer jumping → log d but still touches every node each
    * round); star contraction SHRINKS the working edge set as components
    * collapse — on a 100 TB near-dup graph (shallow components, a few
    * deep chains) the edge list after round 2 is a fraction of the input,
    * which is what makes the remaining rounds cheap. Both forms are gated
    * by the same recursive-CTE oracle. */
  def dedupClustersStar(spark: SparkSession, dir: String, maxIters: Int = 15): DataFrame = {
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    starComponents(pairs, maxIters)
      .select(col("doc_id"), col("cluster_id")).orderBy("doc_id")
  }

  /** Star-contraction loop, factored out for spec access. `pairs` must be
    * distinct undirected edges; returns (doc_id, cluster_id) for every
    * node incident to an edge. */
  private[operators] def starComponents(pairs: DataFrame, maxIters: Int): DataFrame = {
    var edges = pairs.filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .distinct().localCheckpoint()
    // count + XOR of 64-bit edge hashes: order-independent, cannot overflow
    // (sum would trip ANSI long-overflow on large edge sets), distinct edges
    // so XOR self-cancellation can't hide a change of a single edge.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("a"), col("b")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(edges)
    var done = false
    var i = 0
    while (!done && i < maxIters) {
      // large-star over both orientations: m = min(N(u) ∪ {u}); since every
      // emitted pair is (v, m) with v > u ≥ m, canonical order is (m, v).
      val dirEdges = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = dirEdges.groupBy("u").agg(min("v").as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      val afterLarge = dirEdges.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
      // small-star over the down-pointing orientation (edges already sit as
      // a < b): per u = b, m = min of its smaller neighbors; link each
      // smaller neighbor v ≠ m and u itself to m.
      val mins2 = afterLarge.groupBy(col("b").as("u")).agg(min("a").as("m"))
      val joined = afterLarge
        .join(mins2, afterLarge("b") === mins2("u"))
        .select(col("a").as("v"), col("m"), col("u"))
      val next = joined.filter(col("v") =!= col("m"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionAll(joined.select(col("m").as("a"), col("u").as("b")))
        .distinct().localCheckpoint()
      val nextSig = signature(next)
      done = nextSig == sig
      sig = nextSig
      edges = next
      i += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"starComponents did not converge in $maxIters rounds")
    // Fixpoint = stars rooted at component minima: every edge is
    // (root, member). Members label to their root; roots (never on the
    // member side) label to themselves.
    val members = edges.groupBy(col("b").as("doc_id")).agg(min("a").as("cluster_id"))
    val roots = edges.select(col("a").as("doc_id")).distinct()
      .join(edges.select(col("b").as("m")), col("doc_id") === col("m"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    members.unionAll(roots)
  }

  val dedupClustersOracle: String = {
    // strip the ORDER BY-only tail reuse: embed the full pairs oracle as a
    // subquery (DuckDB allows WITH inside a derived table)
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs
       |), reach(a, b) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
       |)
       |SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id
       |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------ recursive reachability
  /** Transitive reachability with PATH COUNTS over the verified near-dup
    * graph, via Spark 4's native `WITH RECURSIVE` — the declarative
    * fixpoint surface (the iterative [[dedupClusters]]/[[dedupClustersStar]]
    * forms are the hand-built equivalents; this one lets users WRITE the
    * recursion and leaves iteration to the engine). The edge list is kept
    * in its canonical `id_a < id_b` orientation, so the directed graph is a
    * DAG and `UNION ALL` recursion terminates without cycle detection;
    * `n_paths` counts the distinct increasing paths a→b — 1 for direct
    * pairs, more inside transitive clusters (a strictly stronger signal
    * than plain reachability: it is the number of independent verification
    * chains connecting the two documents). */
  def reachRecursive(spark: SparkSession, dir: String): DataFrame = {
    // the edge view must be MATERIALIZED before the recursion: the
    // recursive step joins it once per iteration, and an unmaterialized
    // view would re-run the whole minhash→band→jaccard pipeline each round
    // (measured 15.5 s vs ~2 s at sf0.1). sharedVerifiedPairs is already
    // localCheckpointed, so the view reads existing blocks.
    sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
      .createOrReplaceTempView("dedup_pairs")
    spark.sql(
      """WITH RECURSIVE reach(a, b) AS (
        |  SELECT id_a, id_b FROM dedup_pairs
        |  UNION ALL
        |  SELECT r.a, p.id_b FROM reach r JOIN dedup_pairs p ON r.b = p.id_a
        |)
        |SELECT a, b, count(*) AS n_paths FROM reach
        |GROUP BY a, b ORDER BY a, b""".stripMargin)
  }

  val reachRecursiveOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (
       |${ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), reach(a, b) AS (
       |  SELECT id_a, id_b FROM pairs
       |  UNION ALL
       |  SELECT r.a, p.id_b FROM reach r JOIN pairs p ON r.b = p.id_a
       |)
       |SELECT a, b, count(*) AS n_paths FROM reach
       |GROUP BY a, b ORDER BY a, b""".stripMargin

  // ---------------------------------------------- minhash Jaccard estimate
  /** MinHash Jaccard ESTIMATION next to ground truth: for every LSH
    * candidate pair, the fraction of agreeing signature components
    * (E[match/k] = J — the estimator the whole MinHash family rests on)
    * alongside the exact Jaccard of the distinct shingle sets. At 100 TB
    * the estimate is what you act on (k comparisons per pair, signatures
    * already materialized); this query makes its error VISIBLE and
    * oracle-pins both columns. n_match/8 is an exact binary fraction, so
    * the double is bit-identical cross-engine. */
  def minhashJaccardEstimate(spark: SparkSession, dir: String): DataFrame =
    // a pure projection of the materialized scored stage — no per-query
    // persist (the round-5 ADVICE leak: this query cached `docs` + bands
    // and never released them, so the blocks haunted every later query of
    // the bench process), and no recomputation (n_match and the exact
    // Jaccard were both computed in the stage's single candidate pass)
    sharedScoredCandidates(spark, dir)
      .withColumn("est_jaccard", col("n_match").cast("double") / NumHashes)
      .select("id_a", "id_b", "n_match", "est_jaccard", "jaccard")
      .orderBy("id_a", "id_b")

  val minhashJaccardEstimateOracle: String = {
    val sigExprs = (0 until NumHashes)
      .map(i => s"list_min(list_transform(sh, s -> md5('$i|' || s))) AS h$i")
      .mkString(",\n    ")
    val bandRows = (0 until NumHashes / BandSize)
      .map { b =>
        val parts = (0 until BandSize).map(j => s"h${b * BandSize + j}").mkString(" || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS band_hash FROM sig"
      }
      .mkString("\n  UNION ALL\n  ")
    val matchSum = (0 until NumHashes)
      .map(i => s"(CASE WHEN sga.h$i = sgb.h$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH corpus AS (
       |  $corpusSql
       |), shingled AS (
       |  SELECT doc_id,
       |    list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    ) AS sh
       |  FROM corpus
       |  WHERE len(string_split(text, ' ')) >= 3
       |), sig AS (
       |  SELECT doc_id,
       |    $sigExprs
       |  FROM shingled
       |), bands AS (
       |  $bandRows
       |), ${cappedPairsSql("bands", Seq("band", "band_hash"))}
       |, sets AS (
       |  SELECT doc_id, list_distinct(sh) AS shd FROM shingled
       |)
       |SELECT id_a, id_b,
       |  CAST($matchSum AS BIGINT) AS n_match,
       |  CAST($matchSum AS DOUBLE) / $NumHashes AS est_jaccard,
       |  CAST(len(list_intersect(sa.shd, sb.shd)) AS DOUBLE) / len(list_distinct(list_concat(sa.shd, sb.shd))) AS jaccard
       |FROM capped
       |JOIN sets sa ON sa.doc_id = id_a
       |JOIN sets sb ON sb.doc_id = id_b
       |JOIN sig sga ON sga.doc_id = id_a
       |JOIN sig sgb ON sgb.doc_id = id_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  // --------------------------------------- prefix-filtering EXACT join

  /** EXACT Jaccard-threshold self-join via prefix filtering (AllPairs /
    * PPJoin — Bayardo et al. WWW'07, Xiao et al. WWW'08): the
    * no-false-negatives alternative to MinHash/LSH. Tokens (3-gram
    * shingles) are globally ordered by ascending document frequency
    * (rarest first, token tie-break); a doc's PREFIX is its first
    * ⌊(1−t)·|d|⌋+1 tokens in that order. Theorem: J(a,b) ≥ t ⇒ a and b
    * share a prefix token — so candidates = docs sharing ≥1 prefix token,
    * then exact set verification. Where LSH trades recall for speed
    * (band-miss pairs are silently lost), this is recall-1.0 by
    * construction — the oracle is literally the brute-force all-pairs
    * join.
    *
    * 100 TB shape: the prefix inverted index joins on RARE tokens (df
    * ascending ⇒ the popular tokens that blow up an inverted-index join
    * are exactly the ones excluded from prefixes), plus the AllPairs
    * length filter (`t·|a| ≤ |b|`) drops cross-size candidates before
    * verification. The verification join touches candidate pairs only —
    * never the n² pair space. Candidate volume is corpus-dependent (a
    * template-heavy corpus inflates it) — the same hub risk the LSH path
    * caps with [[cappedBucketPairs]]; here the df-ascending order is the
    * structural mitigation.
    */
  def prefixFilterJoinPairs(spark: SparkSession, dir: String, t10: Int = 6): DataFrame = {
    val ranked = rankedShingleToks(spark, dir)
    val prefix = ranked
      .filter(col("rn") <= expr(s"(sz * (10 - $t10)) div 10") + 1)
      .select("doc_id", "tok", "rn", "sz")
    val cands = prefix.select(col("doc_id").as("id_a"), col("tok"),
        col("rn").as("ra"), col("sz").as("sa"))
      .join(prefix.select(col("doc_id").as("id_b"), col("tok"),
        col("rn").as("rb"), col("sz").as("sb")), "tok")
      .filter(col("id_a") < col("id_b") &&
        // AllPairs length filter: J ≥ t needs t·|a| ≤ |b| (and symmetric)
        col("sb") * 10 >= col("sa") * t10 && col("sa") * 10 >= col("sb") * t10)
      .groupBy("id_a", "id_b", "sa", "sb")
      .agg(min(col("ra")).as("pa"), min(col("rb")).as("pb"))
      // PPJoin positional filter: the globally-FIRST common token of a true
      // pair is always inside both prefixes (that is the prefix lemma), so
      // min match positions upper-bound the overlap: O ≤ 1 + min(sa−pa,
      // sb−pb). Require that bound to reach the equivalent overlap
      // threshold α = ⌈t(sa+sb)/(1+t)⌉ — cuts candidates ~3x here before
      // the expensive verification, with false negatives impossible.
      .filter(lit(1) + least(col("sa") - col("pa"), col("sb") - col("pb")) >=
        expr(s"($t10 * (sa + sb) + ${10 + t10} - 1) div ${10 + t10}"))
      .select("id_a", "id_b", "sa", "sb")
    val ta = ranked.select(col("doc_id").as("id_a"), col("tok"))
    val tb = ranked.select(col("doc_id").as("id_b"), col("tok"))
    cands.join(ta, "id_a").join(tb, Seq("id_b", "tok"))
      .groupBy("id_a", "id_b", "sa", "sb")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * 10 >= (col("sa") + col("sb") - col("inter")) * t10)
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("sa") + col("sb") - col("inter")).as("un"),
        (col("inter").cast("double") / (col("sa") + col("sb") - col("inter")).cast("double"))
          .as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** The df-ranked shingle-token frame both prefix-filter joins read:
    * (doc_id, tok, rn, sz) with rn = the token's rank in the doc under the
    * global rarest-first order and sz = the doc's distinct-shingle count.
    * ONE tokenize pass feeds everything: rank + doc size ride the same
    * per-doc window, and the lazy localCheckpoint stops the downstream
    * consumers (prefix sides, verify sides) from re-exploding the corpus
    * (measured 2x end-to-end at sf0.1); lazy so plan-only consumers
    * (PlansDump) still build without running a job. */
  private[operators] def rankedShingleToks(spark: SparkSession, dir: String): DataFrame =
    // memoized per (session, dir) so the Jaccard and containment joins —
    // and back-to-back bench reps — share ONE tokenize+rank+checkpoint;
    // the checkpoint inside stays LAZY, so memo construction runs no job
    // and PlansDump still builds both join plans job-free
    memoStage(spark, dir, "ranked_toks") { rankedShingleToksPlan(spark, dir) }

  /** Declarative (un-memoized) form of [[rankedShingleToks]]. */
  private def rankedShingleToksPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      // the single-file fixture reads as ONE partition; spread the
      // CPU-bound shingle explode across cores (same gotcha as
      // corpusWithNearDups — tokenize was 6 s single-threaded at sf0.1)
      .repartition(spark.sparkContext.defaultParallelism)
    // hoist the split: inside shingles()'s lambda, `split(text)` is
    // re-evaluated per element (no CSE across a HOF boundary) — ~75
    // splits/doc; pre-splitting to an array column makes tokenize 5x
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val toks = ws.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2))))).as("tok"))
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df"), col("tok"))
    toks.join(dfreq, "tok")
      .select(col("doc_id"), col("tok"),
        row_number().over(wDoc).as("rn"),
        count(lit(1)).over(Window.partitionBy("doc_id")).as("sz"))
      .localCheckpoint(false)
  }

  /** EXACT containment-threshold join — the ASYMMETRIC twin of
    * [[prefixFilterJoinPairs]]: emit directed pairs where ≥ t of doc A's
    * shingles also appear in doc B (`|A∩B|/|A| ≥ t`). This is the dedup
    * case Jaccard structurally misses: a short document embedded verbatim
    * in a much longer one has tiny J (the union is dominated by B) but
    * containment 1.0 — exactly the quote/boilerplate/excerpt duplication a
    * training-corpus pipeline must see. MinHash/LSH misses it for the same
    * reason (minhash concentrates around J), so the index here is the
    * containment-prefix: A's first `|A| − ⌈t·|A|⌉ + 1` rarest tokens must
    * hit SOME token of B (no upper length filter exists — B may be any
    * size ≥ ⌈t·|A|⌉). Candidates join A-prefixes (rare tokens by
    * construction) against the full token index, then exact verification
    * counts the true intersection — no false negatives, and the
    * brute-force all-ordered-pairs oracle is the gate. */
  def containmentJoinPairs(spark: SparkSession, dir: String, t10: Int = 9): DataFrame = {
    val ranked = rankedShingleToks(spark, dir)
    // α = ⌈t·|A|⌉ required overlap; prefix = sz − α + 1 rarest tokens
    val aPref = ranked
      .filter(col("rn") <= col("sz") - expr(s"($t10 * sz + 9) div 10") + 1)
      .select(col("doc_id").as("id_a"), col("tok"), col("sz").as("sa"))
    val cands = aPref
      .join(ranked.select(col("doc_id").as("id_b"), col("tok"), col("sz").as("sb")), "tok")
      .filter(col("id_a") =!= col("id_b") &&
        // B must be able to absorb the required overlap: |B| ≥ ⌈t·|A|⌉
        col("sb") * 10 >= col("sa") * t10)
      .select("id_a", "id_b", "sa", "sb").distinct()
    val ta = ranked.select(col("doc_id").as("id_a"), col("tok"))
    val tb = ranked.select(col("doc_id").as("id_b"), col("tok"))
    cands.join(ta, "id_a").join(tb, Seq("id_b", "tok"))
      .groupBy("id_a", "id_b", "sa", "sb")
      .agg(count(lit(1)).as("inter"))
      .filter(col("inter") * 10 >= col("sa") * t10)
      .select(col("id_a"), col("id_b"), col("sa"), col("sb"), col("inter"),
        (col("inter").cast("double") / col("sa").cast("double")).as("containment"))
      .orderBy("id_a", "id_b")
  }

  /** Brute-force ordered-pairs twin — recall 1.0 is the claim, so the
    * naive join IS the gate. */
  def containmentJoinPairsOracle(t10: Int = 9): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    )) AS s
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(len(a.s) AS BIGINT) AS sa, CAST(len(b.s) AS BIGINT) AS sb,
       |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(a.s) AS DOUBLE)
       |    AS containment
       |FROM toks a JOIN toks b ON a.doc_id != b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) * 10 >= $t10 * len(a.s)
       |ORDER BY id_a, id_b""".stripMargin

  /** Brute-force all-pairs twin — the exactness claim IS the gate: the
    * prefix-filtered join must return the identical pair set. */
  def prefixFilterJoinPairsOracle(t10: Int = 6): String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |    )) AS s
       |  FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3
       |)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
       |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS BIGINT) AS un,
       |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
       |    / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
       |WHERE len(list_intersect(a.s, b.s)) * 10
       |      >= $t10 * (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
       |ORDER BY id_a, id_b""".stripMargin

  // ------------------------------------------------- k-core decomposition
  /** k-core of an undirected edge list by parallel peeling: every round
    * removes ALL nodes of degree < k at once (two semi-joins on 8 B keys),
    * iterating to the fixpoint. Peeling never discards a true core node
    * (its degree within the surviving graph only drops when non-core
    * neighbors leave), so the fixpoint IS the unique maximal subgraph of
    * min-degree ≥ k. Batch removal converges in few rounds on real graphs
    * (each round strictly shrinks the edge set or terminates); lineage is
    * cut per round with localCheckpoint, the connected-components recipe.
    * Edge-count stability is the exact fixpoint test: any removed node
    * carried ≥ 1 edge, so "no edges lost" ⟺ "nothing removed". */
  def kCoreOf(edges: DataFrame, k: Int, maxRounds: Int = 50): DataFrame = {
    var cur = edges.select("id_a", "id_b").localCheckpoint()
    var n = cur.count()
    var prev = -1L
    var rounds = 0
    while (n != prev && n > 0 && rounds < maxRounds) {
      val keep = cur.select(col("id_a").as("id"))
        .union(cur.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select("id")
      cur = cur
        .join(keep, cur("id_a") === keep("id"), "left_semi")
        .join(keep, cur("id_b") === keep("id"), "left_semi")
        .localCheckpoint()
      prev = n
      n = cur.count()
      rounds += 1
    }
    cur
  }

  /** k-core summary over the near-dup pair graph for k ∈ {2, 3}: core
    * size in nodes/edges per k. Estimator-free but ITERATIVE — not
    * SQL-expressible, so the driver records the weaker rows-only check and
    * exact semantics are pinned by [[kCoreOf]]'s planted-graph spec plus
    * the in-query property gate [[kCoreGate]]. */
  /** The k-core edge set MEMOIZED per (session, dir, k) — [[kCoreSummary]]
    * needs k ∈ {2, 3} and [[kCoreGate]] re-needs k = 2, so without the memo
    * the iterative peel ran three times per suite pass (r17, the cc_labels
    * pattern). Cores are NESTED ((k+1)-core ⊆ k-core — peeling can only
    * remove nodes, and a subgraph with min degree ≥ k+1 also has min
    * degree ≥ k), so the k = 3 peel starts from the MEMOIZED 2-core's
    * edges instead of the full graph: strictly fewer rows per round,
    * identical fixpoint (the unique maximal subgraph of min degree ≥ 3 is
    * contained in the 2-core, and peeling is confluent). KCoreSpec pins
    * from-2-core ≡ from-scratch on planted graphs. */
  private def sharedKCore(spark: SparkSession, dir: String, k: Int): DataFrame =
    memoStage(spark, dir, s"kcore_$k") {
      if (k <= 2) kCoreOf(sharedVerifiedPairs(spark, dir).select("id_a", "id_b"), k)
      else kCoreOf(sharedKCore(spark, dir, k - 1), k)
    }

  def kCoreSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Seq(2, 3).map { k =>
      val core = sharedKCore(spark, dir, k)
      val nodes = core.select(col("id_a").as("id"))
        .union(core.select(col("id_b").as("id"))).distinct().count()
      (k.toLong, nodes, core.count())
    }
    rows.toDF("k", "n_core_nodes", "n_core_edges").orderBy("k")
  }

  /** Property gate for [[kCoreSummary]] (k=2), DuckDB-checkable as
    * constants: (1) every core node keeps ≥ k neighbors INSIDE the core;
    * (2) no excluded node could be added alone (each has < k core
    * neighbors) — together the defining property plus single-node
    * maximality, both computed in-query over the final core. */
  def kCoreGate(spark: SparkSession, dir: String, k: Int = 2): DataFrame = {
    val e = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    val core = sharedKCore(spark, dir, k)
    val coreNodes = core.select(col("id_a").as("id"))
      .union(core.select(col("id_b").as("id"))).distinct()
    val coreDeg = core.select(col("id_a").as("id"))
      .union(core.select(col("id_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // edges from excluded nodes into the core
    val sym = e.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(e.select(col("id_b").as("u"), col("id_a").as("v")))
    val outsideIntoCore = sym
      .join(coreNodes.select(col("id").as("v")), "v")
      .join(coreNodes.select(col("id").as("u")), Seq("u"), "left_anti")
      .groupBy("u").agg(count(lit(1)).as("core_deg"))
    val degOk = coreDeg.agg(
      coalesce(min(col("deg") >= k), lit(true)).as("every_core_node_deg_ge_k"))
    val maxOk = outsideIntoCore.agg(
      coalesce(min(col("core_deg") < k), lit(true)).as("no_single_node_addable"))
    degOk.crossJoin(maxOk).select(
      lit(k.toLong).as("k"),
      col("every_core_node_deg_ge_k"), col("no_single_node_addable"))
  }

  val kCoreGateOracle: String =
    """SELECT CAST(2 AS BIGINT) AS k,
      |       TRUE AS every_core_node_deg_ge_k,
      |       TRUE AS no_single_node_addable""".stripMargin

  /** Property gate for the connected-components family
    * ([[dedupClusters]] / [[clusterSizeHistogram]]), DuckDB-checkable as
    * literal-TRUE booleans (the kCoreGate pattern — VERDICT r9 #4: put the
    * iterative-fixpoint family's guarantee in the DRIVER ledger, not only
    * in ScalaTest):
    *  - `edges_within_clusters` — no verified-pair edge crosses two labels
    *    (the fixpoint actually converged; an early stop flips this FALSE);
    *  - `label_is_member_min` — each cluster's label IS the minimum member
    *    doc_id (the defining min-label invariant; also proves labels are
    *    members, so clusters can't alias);
    *  - `sizes_partition_nodes` — the size histogram's doc mass equals the
    *    label count (the histogram is a partition, nothing dropped).
    * Soundness (no over-merge) holds by construction — propagation only
    * ever moves labels along edges — and is spec'd on planted graphs. */
  def clusterSizesGate(spark: SparkSession, dir: String): DataFrame = {
    val labels = dedupClusters(spark, dir)
    val pairs = sharedVerifiedPairs(spark, dir).select("id_a", "id_b")
    val la = labels.select(col("doc_id").as("id_a"), col("cluster_id").as("ca"))
    val lb = labels.select(col("doc_id").as("id_b"), col("cluster_id").as("cb"))
    val edgesOk = pairs.join(la, "id_a").join(lb, "id_b")
      .agg(coalesce(min(col("ca") === col("cb")), lit(true)).as("edges_within_clusters"))
    val minOk = labels.groupBy("cluster_id").agg(min(col("doc_id")).as("min_id"))
      .agg(coalesce(min(col("cluster_id") === col("min_id")), lit(true))
        .as("label_is_member_min"))
    val massOk = clusterSizeHistogram(spark, dir).agg(sum(col("n_docs")).as("mass"))
      .crossJoin(labels.agg(count(lit(1)).as("n_labels")))
      .select((col("mass") === col("n_labels")).as("sizes_partition_nodes"))
    edgesOk.crossJoin(minOk).crossJoin(massOk)
  }

  val clusterSizesGateOracle: String =
    """SELECT TRUE AS edges_within_clusters,
      |       TRUE AS label_is_member_min,
      |       TRUE AS sizes_partition_nodes""".stripMargin
}
