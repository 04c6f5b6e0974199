package graft.render

import org.apache.spark.sql.types.{BooleanType, IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite
import graft.profile._

/** The `--color` render mode (VERDICT r8 #7 — the reference's Ink color
  * coding, `/root/reference/src/listTables.tsx:363-469`, as raw SGR
  * sequences). Two pins:
  *  1. visible-byte equivalence: stripping every escape from
  *     [[TableRenderer.renderColor]] yields [[TableRenderer.render]]'s
  *     output byte-for-byte on the full sf0.001 catalog;
  *  2. a literal golden WITH escapes for a hand-built profile, so the
  *     exact color assignment (banner cyan-bold, title yellow-bold, count
  *     green/magenta/red by mode, cols blue, header gray-bold, name green,
  *     type gray, range/values yellow) can't drift silently.
  */
class ColorRenderSpec extends AnyFunSuite {

  private val Esc = ""
  private def strip(s: String): String = s.replaceAll("\\[[0-9;]*m", "")

  private val profile = TableProfile("public", "users", 3, ExactRows(42L), Seq(
    ColumnProfile("id", IntegerType, ColumnClass.Numeric, Some(1), Some(99), None, None),
    ColumnProfile("name", StringType, ColumnClass.Other, None, None, None, None),
    ColumnProfile("active", BooleanType, ColumnClass.Bool, None, None, Some(30L), Some(12L))))

  test("stripping escapes from the color render yields the plain render exactly") {
    val spark = SparkSuite.spark
    val profiles = Profiler.profileRoot(spark, SparkSuite.Sf0001, exact = true)
    assert(strip(TableRenderer.renderColor(profiles, TableRenderer.Exact)) ==
      TableRenderer.render(profiles, TableRenderer.Exact))
    val est = Profiler.profileRoot(spark, SparkSuite.Sf0001, exact = false)
    assert(strip(TableRenderer.renderColor(est, TableRenderer.Estimated)) ==
      TableRenderer.render(est, TableRenderer.Estimated))
  }

  test("color golden: exact mode, with literal escape sequences") {
    val got = TableRenderer.renderColor(Seq(profile), TableRenderer.Exact)
    val expected =
      s"$Esc[1;36mTables (schema.table) — rows (exact), columns:$Esc[0m\n" +
        s"$Esc[1;33mpublic.users$Esc[0m — $Esc[32m42 rows$Esc[0m, $Esc[34m3 cols$Esc[0m\n" +
        "\n" +
        s"$Esc[1;90mname$Esc[0m    $Esc[1;90mtype$Esc[0m  $Esc[1;90mrange$Esc[0m  $Esc[1;90mvalues$Esc[0m\n" +
        s"$Esc[32mid$Esc[0m      $Esc[90mint$Esc[0m   $Esc[33m1-99$Esc[0m\n" +
        s"$Esc[32mname$Esc[0m    $Esc[90mtext$Esc[0m\n" +
        s"$Esc[32mactive$Esc[0m  $Esc[90mbool$Esc[0m         $Esc[33mYes 30 (71.4%) | No 12 (28.6%)$Esc[0m\n"
    assert(got == expected)
  }

  test("estimated and error counts take magenta and red") {
    val est = TableProfile("public", "t", 0, EstimatedRows(7L), Seq.empty)
    assert(TableRenderer.renderColor(Seq(est), TableRenderer.Estimated)
      .contains(s"$Esc[35m~7 rows$Esc[0m"))
    val err = TableProfile("public", "t", 0, CountError, Seq.empty)
    assert(TableRenderer.renderColor(Seq(err), TableRenderer.Exact)
      .contains(s"$Esc[31merror rows$Esc[0m"))
  }

  test("empty catalog renders the plain message") {
    assert(TableRenderer.renderColor(Seq.empty, TableRenderer.Exact) == "No tables found.\n")
  }
}
