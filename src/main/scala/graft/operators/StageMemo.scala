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
    // TrieMap.getOrElseUpdate is atomic per key; the eager checkpoint job
    // runs under the winning Memo's own lazy-val lock, so two stages build
    // concurrently while two callers of the SAME stage still share one build
    stageCache.getOrElseUpdate((ck, dir, stage),
      new Memo(() => build.localCheckpoint(true))).df
  }

  /** Test/bench hook: drop every memoized stage (blocks are then freed by
    * the ContextCleaner once the returned DataFrames go unreferenced). */
  def clear(): Unit =
    stageCache.clear()
}
