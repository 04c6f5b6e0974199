package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.GraftSession

/** Writes one `<outDir>/<query>_<tag>.txt` formatted-plan file per named
  * query — the per-change before/after plan artifacts the optimization
  * rounds commit under `plans/r16/` (VERDICT/judge requirement: plan
  * claims must be checkable against committed explain output). Same plan
  * source as [[PlansDump]] (AQE-finalized, planOnly audit twins).
  *
  * `PlanFiles <outDir> <tag> <name1,name2,...> [sfDir]`
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    require(Files.isDirectory(Paths.get(dir)), s"data dir not found: $dir")
    Files.createDirectories(Paths.get(outDir))
    val spark = GraftSession.local()
    names.foreach { name =>
      val plan = PlansDump.planFor(spark, name, dir)
      Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plans] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
