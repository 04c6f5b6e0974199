package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Auto-salted skew join: [[Relational.saltedSupplierRevenue]] hard-codes
  * salt ×8; this helper CHOOSES the salt count from the data, the way a
  * planner would — sample the big side's join-key frequencies, estimate the
  * hottest key's row count, and split it into chunks of roughly one
  * shuffle-partition's fair share.
  *
  * Relationship to AQE: `spark.sql.adaptive.skewJoin` re-plans skew
  * REACTIVELY from runtime map-output sizes and only splits sort-merge-join
  * partitions; salting handles it BY CONSTRUCTION, works for any join
  * strategy, and also fixes the downstream `groupBy` on the same hot key
  * (AQE's skew-join does not). The sample is one tiny job at plan time —
  * the same cost class as AQE's stats collection, NOT a driver collect of
  * data rows.
  *
  * Correctness does not depend on the sample: whatever salt count comes
  * back, every big-side row carries exactly one salt in [0, n) and the
  * small side is replicated for all n, so the inner join's result multiset
  * is identical to the unsalted join (spec-asserted).
  */
object AdaptiveSalt {

  /** Choose a salt count for `big`'s `key`: ceil(hottest-key rows / fair
    * per-partition share), clamped to [1, maxSalts]. Returns 1 (no salting)
    * when the data is not skewed. */
  def chooseSalts(big: DataFrame, key: String,
      sampleFraction: Double = 0.02, maxSalts: Int = 64): Int = {
    val spark = big.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism.toLong
    val sampled = big.select(key).sample(withReplacement = false, sampleFraction, seed = 42L)
    val top = sampled.groupBy(key).count()
      .agg(max(col("count")).as("hot"), sum(col("count")).as("total"))
      .collect()(0)
    if (top.isNullAt(0)) return 1
    val hot = top.getLong(0)
    val total = top.getLong(1)
    val fairShare = math.max(total / math.max(parallelism, 1L), 1L)
    math.min(math.max((hot + fairShare - 1) / fairShare, 1L), maxSalts.toLong).toInt
  }

  /** Inner equi-join `big ⋈ small` on `bigKey = smallKey`, salted with a
    * data-chosen salt count. The big side's salt is a deterministic hash of
    * the full row (any value in [0, n) is correct — it only spreads rows of
    * the same key); the small side explodes ×n so every (key, salt) bucket
    * has its replica. Returns the joined frame and the salt count used. */
  def join(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      sampleFraction: Double = 0.02, maxSalts: Int = 64): (DataFrame, Int) = {
    val n = chooseSalts(big, bigKey, sampleFraction, maxSalts)
    // keys resolve against their OWNING frame: bare col(...) is ambiguous
    // (AnalysisException) whenever both sides use the same key name — the
    // common FK-join spelling
    if (n <= 1) {
      (big.join(small, big(bigKey) === small(smallKey)), 1)
    } else {
      val b = big.withColumn("__salt", pmod(hash(big.columns.map(col): _*), lit(n)))
      val s = small.withColumn("__salt", explode(array((0 until n).map(lit): _*)))
      val joined = b.join(s, b(bigKey) === s(smallKey) && b("__salt") === s("__salt"))
        .drop("__salt")
      (joined, n)
    }
  }
}
