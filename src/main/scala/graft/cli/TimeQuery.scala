package graft.cli

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named [[graft.SparkEntry.queries]] entry in isolation.
  *
  * Usage: runMain graft.cli.TimeQuery <queryName> [sfDir] [reps]
  *
  * Same session config and noop-sink action as [[graft.Bench]], but a single
  * query repeated `reps` times with per-rep seconds printed — the tool for
  * separating "the plan is slow" from "the box was contended" when a driver
  * bench line disagrees with local runs (round-6 `profile_summary_lineitem`:
  * 14.6 s in the artifact vs 1.5 s on three clean runs).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // self-identifying header: when invoked via plain `java` (Bench's
    // fresh-JVM fork) there is no sbt "running (fork) …" echo, so log
    // parsers (tools/adjudicate_bench.py) key off THIS line (ADVICE r15)
    println(s"timequery $name @ $sfDir")
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
    // single query: memo cleared per rep (each rep pays the full build).
    // comma-separated list: memo cleared ONCE up front, then the queries
    // run in order — the bench-like context (a build-owning line first,
    // memo-reading lines after) for separating build cost from query cost.
    val names = name.split(",").map(_.trim).filter(_.nonEmpty)
    if (names.length == 1) {
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        graft.operators.StageMemo.releaseAll()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    } else {
      // memo cleared once up front, so ONLY rep 1 pays the shared-stage
      // build; reps ≥ 2 time fully-memoized reads even for the
      // build-owning query. Tag the lines so the two aren't misread as
      // measuring the same thing (ADVICE r8).
      graft.operators.StageMemo.releaseAll()
      (1 to reps).foreach { i =>
        val tag = if (i == 1) " (build)" else " (memoized)"
        names.foreach { n =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"rep $i$tag $n: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
    }
    spark.stop()
  }
}
