package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: run a comma-separated subset of [[graft.SparkEntry.queries]]
  * through the same dump-and-compare path as [[graft.Verify]], so a new
  * query can be oracle-gated in isolation without re-dumping all ~200.
  *
  * Usage: runMain graft.cli.VerifySubset <sfDir> <outDir> <name1,name2,...>
  * Then:  python3 tools/oracle_check.py <sfDir> <outDir>
  *
  * Names absent from [[graft.SparkEntry.oracleSql]] are dumped but omitted
  * from oracle_sql.json (the driver's weaker rows-only path).
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, list) = args.take(3)
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify-subset] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
