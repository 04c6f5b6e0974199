package graft.sources

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** CSV malformed-row handling — the ingestion-resilience surface a real
  * pipeline needs before anything downstream runs: PERMISSIVE keeps bad rows
  * with typed nulls + the raw line in a rescue column, DROPMALFORMED
  * silently filters them, FAILFAST refuses the file. All three behaviors are
  * per-partition streaming decisions in the CSV parser — no shuffle, scale
  * is the same as any scan. */
class CsvModesSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("qty", LongType),
    StructField("name", StringType),
    StructField("_corrupt", StringType)))

  private def stage(): String = {
    val dir = Files.createTempDirectory("csv_modes")
    Files.write(dir.resolve("data.csv"),
      "id,qty,name\n1,10,alpha\n2,notanumber,beta\n3,30,gamma\n".getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  test("PERMISSIVE keeps malformed rows with nulls and captures the raw line") {
    val rows = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema)
      .csv(stage())
      .collect()
    assert(rows.length == 3)
    val bad = rows.filter(!_.isNullAt(3))
    assert(bad.length == 1)
    assert(bad.head.getString(3).contains("notanumber"))
    assert(bad.head.isNullAt(1)) // qty unparseable → typed null
  }

  test("DROPMALFORMED filters the bad row (only when the bad column is read)") {
    val df = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .schema(StructType(schema.fields.init))
      .csv(stage())
    // full-row read: the unparseable qty makes the row malformed → dropped
    val full = df.collect().map(_.getLong(0)).sorted
    assert(full.toSeq == Seq(1L, 3L))
    // CAVEAT pinned on purpose: with column pruning, a projection that
    // skips the bad column never parses it, so the row is NOT malformed
    // for that projection and survives — malformedness is per-read, not
    // per-file. Downstream counts can differ between projections.
    val pruned = df.select("id").collect().map(_.getLong(0)).sorted
    assert(pruned.toSeq == Seq(1L, 2L, 3L))
  }

  test("FAILFAST throws on the bad row") {
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read
        .option("header", "true")
        .option("mode", "FAILFAST")
        .schema(StructType(schema.fields.init))
        .csv(stage())
        .collect()
    }
    assert(ex.getMessage.contains("Malformed") || ex.getCause != null)
  }
}
