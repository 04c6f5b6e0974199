package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-level memo of materialized pipeline stages, keyed by
  * (SparkContext identity, data dir, stage name) — shared by the near-dup
  * family (signatures → candidates → scored pairs) and the span family
  * (duplicated 5-grams).
  *
  * Stages run ONCE per (session, dir) and are materialized with
  * `localCheckpoint(eager = true)` — RDD blocks, released by the
  * ContextCleaner when unreferenced, never registered in the CacheManager
  * (the per-query `Dataset.persist()` alternative leaked cached blocks
  * into every later query of the process — ADVICE r5 #1). This is also
  * the 100 TB shape: materialize the derived artifact once and run every
  * downstream analytic against it, rather than re-hashing the corpus per
  * question.
  *
  * ==Bounded residency (VERDICT r14 #1)==
  * GC-managed release turned out not to bound anything in practice: the
  * memo itself holds the strong reference for process lifetime, and even
  * after [[clear]] the ContextCleaner only frees blocks after a full GC
  * enqueues the weak refs (its own periodic GC defaults to 30 min — longer
  * than a whole bench run). Round 14 measured the cost: the LM family's
  * new memoized stages stayed resident across the remaining ~300 bench
  * queries, tripled JVM GC time, and taxed every later family ~16%. So the
  * memo now supports EXPLICIT release: [[beginQuery]] attributes reads to
  * the declared query names, [[lastReaders]] derives each stage's final
  * consumer from an observed run order, and [[release]] / [[releaseAll]]
  * drop entries AND eagerly unpersist their checkpoint blocks (safe: a
  * released stage simply rebuilds for any later consumer — same contract
  * as a fresh session). Bench releases each stage right after its last
  * consumer's timed run; steady-state memory is then one family's working
  * set, not the whole suite's history.
  *
  * ==Immutable-dir contract==
  * A memoized stage is pinned to the FILES AS READ at build time: if data
  * under `dir` is rewritten or appended mid-session, every consumer of the
  * stage silently serves results for the old files. That is deliberate —
  * the fixture dirs are driver-generated snapshots and a production corpus
  * version is an immutable path (new snapshot ⇒ new dir ⇒ new key). Point
  * each corpus VERSION at its own directory; never rewrite one in place.
  * ([[clear]] resets the memo when a test must re-read a mutated dir.)
  */
private[graft] object StageMemo {

  /** One lock object per key: a stage build runs an EAGER Spark job
    * (localCheckpoint), so a global lock would serialize unrelated stage
    * builds behind it — e.g. the span family's gram-frequency build
    * blocking the near-dup family's signature build (ADVICE r6). The
    * per-key lock still guarantees each stage builds exactly once. */
  private val stageCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Memo]

  private final class Memo(build: () => DataFrame) {
    lazy val df: DataFrame = build() // lazy val = per-instance (per-key) lock
  }

  /** Context key: (applicationId, startTime) — unique per SparkContext
    * within a JVM (identityHashCode is not: it can collide after GC and
    * hand a new context a DataFrame bound to a dead one). */
  private def ctxKey(spark: SparkSession): String = {
    val sc = spark.sparkContext
    s"${sc.applicationId}@${sc.startTime}"
  }

  def apply(spark: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame = {
    val ck = ctxKey(spark)
    // only ONE SparkContext can be active per JVM: entries from any other
    // context are dead — evict them so cycled sessions don't pin stopped
    // contexts' plans/RDDs for process lifetime
    stageCache.keys.filter(_._1 != ck).foreach(stageCache.remove)
    val q = currentQuery.get()
    if (q != null)
      readLog.updateWith(normalize(stage)) {
        case Some(rs) => Some(rs + q)
        case None     => Some(Set(q))
      }
    // REBUILD VISIBILITY (ADVICE r15): a build of a stage that was already
    // released this tracking window means some consumer ran AFTER the
    // stage's inferred last reader — e.g. two distinct stages aliasing
    // under normalize(), or warm-SF attribution not transferring — and its
    // cost lands inside that consumer's timed line. Count it so the bench
    // artifact can surface the inflation instead of hiding it.
    val key = (ck, dir, stage)
    if (!stageCache.contains(key) && releasedStages.contains(normalize(stage))) {
      rebuildCounter.incrementAndGet()
      val reader = Option(q).getOrElse("<unattributed>")
      rebuilds.updateWith(normalize(stage)) {
        case Some(rs) => Some(rs + reader)
        case None     => Some(Set(reader))
      }
    }
    // TrieMap.getOrElseUpdate is atomic per key; the eager checkpoint job
    // runs under the winning Memo's own lazy-val lock, so two stages build
    // concurrently while two callers of the SAME stage still share one build
    stageCache.getOrElseUpdate(key,
      new Memo(() => build.localCheckpoint(true))).df
  }

  /** Test/bench hook: drop every memoized stage WITHOUT unpersisting
    * (blocks are then freed by the ContextCleaner once the returned
    * DataFrames go unreferenced and a GC runs) — kept for the dir-mutation
    * specs, where a caller may still hold a frame built on the old files.
    * Bench paths want [[releaseAll]] instead. */
  def clear(): Unit =
    stageCache.clear()

  // ------------------------------------------------ bounded residency

  /** Query attribution for [[lastReaders]]: the name set by [[beginQuery]]
    * is recorded against every stage read until the next beginQuery. */
  private val currentQuery =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** normalized stage name → declared queries observed reading it. */
  private val readLog =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]

  /** Stage names can embed dir-dependent numerics (`embed_pairs_<maxId>`);
    * attribution learned at the warmup SF must transfer to the measured
    * SF, so reader bookkeeping drops a trailing numeric suffix. */
  private def normalize(stage: String): String =
    stage.replaceAll("_[0-9]+$", "")

  /** Marks the query whose stage reads should be attributed to `name`. */
  def beginQuery(name: String): Unit = currentQuery.set(name)

  /** Each observed stage's LAST consumer under `queryOrder` (the order the
    * caller runs queries in). A stage read only outside any beginQuery
    * window, or by a query not in the order, keeps no entry — it is then
    * never auto-released. */
  def lastReaders(queryOrder: Seq[String]): Map[String, String] =
    readLog.toMap.flatMap { case (stage, readers) =>
      queryOrder.reverseIterator.find(readers).map(stage -> _)
    }

  /** Releases every resident stage whose last consumer (per `lastReader`,
    * from [[lastReaders]]) is `query`: the entry is removed AND its
    * checkpoint blocks are unpersisted NOW — not left to a GC that may
    * never run during the process. A later (unattributed) consumer simply
    * rebuilds the stage. */
  def releaseAfter(query: String, lastReader: Map[String, String]): Unit =
    stageCache.keys
      .filter(k => lastReader.get(normalize(k._3)).contains(query))
      .foreach { k =>
        releasedStages.put(normalize(k._3), ())
        stageCache.remove(k).foreach(unpersist)
      }

  /** Drops EVERY memoized stage and eagerly unpersists its blocks — the
    * bench/CLI reset (safe there: queries re-derive every frame from the
    * memo on each invocation, so no stale reference can survive). */
  def releaseAll(): Unit =
    stageCache.keys.foreach { k =>
      releasedStages.put(normalize(k._3), ())
      stageCache.remove(k).foreach(unpersist)
    }

  // ------------------------------------------------ rebuild visibility

  /** Normalized names of stages released since [[resetRebuildTracking]];
    * a later build of one of these is a REBUILD, logged in [[rebuilds]]
    * against the query it billed (ADVICE r15: aliasing under [[normalize]]
    * or non-transferring warm-SF attribution would otherwise silently
    * inflate a later query's timed line). */
  private val releasedStages =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val rebuilds =
    scala.collection.concurrent.TrieMap.empty[String, Set[String]]
  private val rebuildCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Starts a fresh rebuild-tracking window (bench calls this right after
    * the warmup's [[releaseAll]], so EXPECTED timed-run first builds don't
    * count as rebuilds — only post-release rebuilds do). */
  def resetRebuildTracking(): Unit = {
    releasedStages.clear(); rebuilds.clear(); rebuildCounter.set(0L)
  }

  /** Total rebuilds of previously-released stages in this window. */
  def rebuildCount: Long = rebuildCounter.get()

  /** normalized stage → queries whose timed window absorbed a rebuild. */
  def rebuildLog: Map[String, Set[String]] = rebuilds.toMap

  /** Frees a released stage's checkpoint blocks. The checkpointed Dataset's
    * plan root is the LogicalRDD wrapping the persisted RDD; unpersist on
    * it is idempotent and safe against the ContextCleaner. Lineage was
    * truncated at checkpoint time, so the RDD must never be acted on again
    * — guaranteed here because the memo entry is removed first and every
    * consumer re-enters through [[apply]]. */
  private def unpersist(m: Memo): Unit =
    try m.df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
    }
    catch { case _: Throwable => () }
}
