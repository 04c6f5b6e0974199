package graft.cli

import graft.{GraftSession, SparkEntry}

/** Plan inspection tool: `ExplainMain <queryName> [sfDir] [--explain]` runs a
  * SparkEntry query (twice — cold and warm), reports wall times, and
  * optionally dumps the formatted physical plan. The feedback loop for
  * keeping plans shuffle-lean and codegen-wide (SURVEY §4.2).
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.find(_.startsWith("/")).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val q = SparkEntry.queries(name)
    if (args.contains("--explain")) q(spark, dir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[explain] run$i: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
