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
  */
private[graft] object StageMemo {

  private val stageCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  /** Context key: (applicationId, startTime) — unique per SparkContext
    * within a JVM (identityHashCode is not: it can collide after GC and
    * hand a new context a DataFrame bound to a dead one). */
  private def ctxKey(spark: SparkSession): String = {
    val sc = spark.sparkContext
    s"${sc.applicationId}@${sc.startTime}"
  }

  def apply(spark: SparkSession, dir: String, stage: String)(
      build: => DataFrame): DataFrame = stageCache.synchronized {
    val ck = ctxKey(spark)
    // only ONE SparkContext can be active per JVM: entries from any other
    // context are dead — evict them so cycled sessions don't pin stopped
    // contexts' plans/RDDs for process lifetime
    stageCache.keys.filter(_._1 != ck).foreach(stageCache.remove)
    stageCache.getOrElseUpdate((ck, dir, stage), build.localCheckpoint(true))
  }

  /** Test/bench hook: drop every memoized stage (blocks are then freed by
    * the ContextCleaner once the returned DataFrames go unreferenced). */
  def clear(): Unit = stageCache.synchronized {
    stageCache.clear()
  }
}
