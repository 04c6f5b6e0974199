package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 optimization probe (dev tool, TEST tree — VERDICT r16 #7: probe
  * code must not ship in src/main): times operator-internal stages in
  * isolation with the noop sink (guide §1.4). Invoke with
  * `sbt 'Test/runMain graft.operators.ProbeR17 <sfDir> <mode>'`.
  *
  * Modes:
  *  - `lmbi`  — bigram LM chain decomposition (explode, tf agg, fit, score)
  *  - `lmtri` — trigram LM chain decomposition
  */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mode = if (args.length > 1) args(1) else "lmbi"
    val cpus = sys.env.getOrElse(
      "SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time(label: String, reps: Int = 3)(df: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"probe $label rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }

    mode match {
      case "lmbi" =>
        val docs = graft.Fixtures.spread(
          spark.read.parquet(s"$sfDir/documents.parquet"))
        val raw = docs
          .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(col("doc_id"), col("lang"), explode(expr(
            "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS w1, ts[i + 1] AS w2))")).as("p"))
          .select(col("doc_id"), col("lang"), col("p.w1").as("w1"), col("p.w2").as("w2"))
          .filter(col("w1") =!= "" && col("w2") =!= "")
        time("lmbi explode-only")(raw)
        time("lmbi docPairTf (explode + tf agg)")(TextAnalysis.docPairTf(spark, sfDir))
        val pairs = TextAnalysis.docPairTf(spark, sfDir).localCheckpoint(true)
        println(s"pairs rows: ${pairs.count()}")
        import org.apache.spark.sql.expressions.Window
        val bigFreq = pairs.groupBy("lang", "w1", "w2").agg(sum("tf").as("c12"))
          .withColumn("c1", sum("c12").over(Window.partitionBy("lang", "w1")))
        time("lmbi bigFreq agg+window")(bigFreq)
        time("lmbi full fit+score from ckpt pairs")(
          TextAnalysis.bigramSurprisalFrom(pairs))
      case "lmtri" =>
        time("lmtri docTriTf (explode + tf agg)")(TextAnalysis.docTriTfProbe(spark, sfDir))
        val occ = TextAnalysis.docTriTfProbe(spark, sfDir).localCheckpoint(true)
        println(s"occ rows: ${occ.count()}")
        time("lmtri scored from ckpt occ")(TextAnalysis.trigramScoredOcc(occ))
        time("lmtri full (scored+docscores+buckets) from ckpt occ")(
          TextAnalysis.trigramDocScores(TextAnalysis.trigramScoredOcc(occ)))
      case "catalog" =>
        // VERDICT r16 #5: does the 10-table catalog DAG serialize
        // table-by-table, and does driver-side job overlap (guide §2.6)
        // recover the tail? A/B: one union action vs per-table
        // localCheckpoint jobs submitted from a bounded pool, then union.
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          graft.profile.ProfileQueries.catalogProfilePlan(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"probe catalog union-action rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          val futs = graft.Fixtures.allTables.map { t =>
            scala.concurrent.Future {
              val cols = graft.Fixtures.numericCols(t)
              graft.profile.ProfileQueries.fullProfile(spark, sfDir, t)
                .select(explode(array(cols.map(c => struct(
                  lit(t).as("tbl"), lit(c).as("col_name"),
                  col("n_rows"), col(s"nulls_$c").as("n_nulls"),
                  col(s"min_$c").cast("double").as("min_d"),
                  col(s"max_$c").cast("double").as("max_d"),
                  col(s"avg_$c").as("avg_d"),
                  col(s"ndv_$c").as("ndv"))): _*)).as("p"))
                .select("p.*")
                .localCheckpoint(true)
            }
          }
          val frames = futs.map(f =>
            scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
          pool.shutdown()
          frames.reduce(_ union _).write.format("noop").mode("overwrite").save()
          println(f"probe catalog pooled-ckpt rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      case "tail" =>
        // flat-tail decomposition (VERDICT r16 #8): where do the ~0.5-1 s
        // of a bounded-output tail query go? A/B the presentation sort
        // shapes on a representative scan→groupBy→orderBy query.
        val base = graft.Fixtures.table(spark, sfDir, "events")
          .groupBy(date_trunc("hour", col("ts").cast("timestamp")).as("hour"))
          .agg(count(lit(1)).as("n"), sum("value").as("sv"))
        time("tail agg only", 5)(base)
        time("tail agg+orderBy", 5)(base.orderBy("hour"))
        time("tail agg+coalesce1+sortWithin", 5)(
          base.coalesce(1).sortWithinPartitions("hour"))
        // a declared tail query end-to-end for reference
        time("tail events_hourly declared", 5)(
          graft.SparkEntry.queries("events_hourly")(spark, sfDir))
      case m if m.startsWith("exec:") =>
        // executed-plan dump (the ProbeR16 exec mode, r17 paths): run the
        // DECLARED query and write its AQE-finalized executed plan —
        // the after-evidence for lazy-checkpoint changes, whose unexecuted
        // plan truncates at the checkpoint node
        val parts = m.split(":", 3)
        val (suffix, names) = (parts(1), parts(2).split(",").toSeq)
        names.foreach { name =>
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          df.collect()
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"/root/repo/plans/r17/${name}_exec_$suffix.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"exec plan $name -> ${name}_exec_$suffix.txt")
        }
      case other => sys.error(s"unknown probe mode: $other")
    }
    spark.stop()
  }
}
