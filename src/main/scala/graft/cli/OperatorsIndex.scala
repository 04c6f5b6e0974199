package graft.cli

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.{SparkEntry, VerifySupport}

/** Generates `OPERATORS.md` — the user-facing index the 322-query surface
  * never had (VERDICT r10 #4): one row per registered query with the
  * implementing method, its `file:line`, the correctness gate the driver
  * ledger holds for it, and the measured scale exponent where a
  * [[ScaleProbe]] build covers its method.
  *
  * Everything is DERIVED, never hand-written, so the index cannot go stale:
  *   - query names + gate types from the live [[SparkEntry.queries]] /
  *     [[SparkEntry.oracleSql]] / [[VerifySupport.rowsOnlyJustified]] maps;
  *   - implementing method per query by parsing `SparkEntry.scala`'s own
  *     registration lines (every RHS is a single `Object.method(...)` call);
  *   - `file:line` by locating `object X` / `def m` in the main source tree;
  *   - scale exponents by parsing `ScaleProbe.scala` for which method each
  *     probe build calls, then `SCALE.md`'s measured tables for that build's
  *     latest last-pair slope.
  * The main REQUIREs full resolution — a query whose registration no longer
  * parses, or whose method moved without a trace, fails the generation run
  * (and `OperatorsIndexSpec` runs the same resolution under `sbt test`).
  *
  * Usage: runMain graft.cli.OperatorsIndex [outFile] [srcRoot]
  */
object OperatorsIndex {

  case class Row(name: String, obj: String, method: String, file: String,
                 line: Int, gate: String, scaleExp: Option[String])

  private def read(p: Path): String = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

  private def mainSources(srcRoot: String): Seq[Path] =
    Files.walk(Paths.get(srcRoot, "src/main/scala")).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  /** name → (object, method) from SparkEntry.scala's registration lines.
    * Literal entries (`"x" -> (Obj.m(...))`) plus interpolated families
    * (`s"prefix_$t" -> ... Obj.m(...)`) — the latter resolve any runtime
    * key that starts with the interpolation's literal prefix. */
  def parseRegistrations(srcRoot: String): (Map[String, (String, String)], Seq[(String, (String, String))]) = {
    val src = read(Paths.get(srcRoot, "src/main/scala/graft/SparkEntry.scala"))
    val body = src.substring(src.indexOf("def queries"), src.indexOf("def oracleSql"))
    val call = """([A-Z]\w*)\.(\w+)\(""".r
    val literal = """"([a-z0-9_]+)" -> (.+)""".r
    val interp = """s"([a-z0-9_]+)\$\w+" -> (.+)""".r
    def impl(rhs: String): Option[(String, String)] =
      call.findFirstMatchIn(rhs).map(m => (m.group(1), m.group(2)))
    val lits = literal.findAllMatchIn(body).flatMap { m =>
      impl(m.group(2)).map(m.group(1) -> _)
    }.toMap
    val prefixes = interp.findAllMatchIn(body).flatMap { m =>
      impl(m.group(2)).map(m.group(1) -> _)
    }.toSeq
    (lits, prefixes)
  }

  /** (object, method) → (file, 1-based def line) over the main tree. */
  def locate(srcRoot: String): ((String, String)) => Option[(String, Int)] = {
    val files = mainSources(srcRoot).map(p => p -> read(p))
    val objFile: Map[String, (Path, String)] = files.flatMap { case (p, s) =>
      """(?m)^\s*object\s+(\w+)""".r.findAllMatchIn(s).map(_.group(1) -> (p, s))
    }.toMap

    { case (obj, method) =>
      objFile.get(obj).flatMap { case (p, s) =>
        val defRe = ("""(?m)^\s*(?:private\[\w+\]\s+|protected\s+)?def\s+""" +
          java.util.regex.Pattern.quote(method) + """\b""").r
        defRe.findFirstMatchIn(s).map { m =>
          val line = s.substring(0, m.start).count(_ == '\n') + 1
          (Paths.get(srcRoot).relativize(p).toString, line)
        }
      }
    }
  }

  /** probe build name → (object, method) from ScaleProbe.scala's build
    * tuples: `("name", d => graft.x.Obj.m(spark, d, ...))`. */
  def parseProbeBuilds(srcRoot: String): Map[String, (String, String)] = {
    val src = read(Paths.get(srcRoot, "src/main/scala/graft/cli/ScaleProbe.scala"))
    """\("(\w+)",\s*d => graft[\w.]*\.([A-Z]\w*)\.(\w+)\(""".r
      .findAllMatchIn(src).map(m => m.group(1) -> (m.group(2), m.group(3))).toMap
  }

  /** build name → latest measured exponents cell from SCALE.md's probe
    * tables (`| \`build\` | t … | e1, e2 |`); later tables win (re-probes). */
  def parseScaleExponents(srcRoot: String): Map[String, String] = {
    val p = Paths.get(srcRoot, "SCALE.md")
    if (!Files.exists(p)) return Map.empty
    """(?m)^\|\s*`(\w+)`[^|]*\|(.*)\|\s*$""".r.findAllMatchIn(read(p)).flatMap { m =>
      val cells = m.group(2).split("\\|").map(_.trim)
      // bold markers appear in the single-slope tables (`**0.48**`)
      val last = cells.lastOption.getOrElse("").replace("*", "")
      // an exponents cell is one or more comma-separated signed decimals
      if (last.matches("""[-−]?\d+\.\d+(,\s*[-−]?\d+\.\d+)*""")) Some(m.group(1) -> last)
      else None
    }.toMap // later occurrences overwrite earlier ones
  }

  def gateOf(name: String): String =
    if (SparkEntry.oracleSql.contains(name)) "oracle"
    else VerifySupport.rowsOnlyJustified.get(name)
      .map(j => s"rows-only — $j")
      .getOrElse(sys.error(s"query $name has neither oracle nor rows-only justification"))

  def familyOf(name: String): String =
    if (name.matches("q\\d+.*")) "tpch"
    else if (name.startsWith("q_")) "relational"
    else name.takeWhile(_ != '_') match { case "" => name; case f => f }

  def buildRows(srcRoot: String): Seq[Row] = {
    val (lits, prefixes) = parseRegistrations(srcRoot)
    val loc = locate(srcRoot)
    val probeImpl = parseProbeBuilds(srcRoot)
    val exps = parseScaleExponents(srcRoot)
    val expByImpl: Map[(String, String), String] =
      probeImpl.flatMap { case (build, om) => exps.get(build).map(om -> _) }
    SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val om = lits.getOrElse(name,
        prefixes.collectFirst { case (pre, v) if name.startsWith(pre) => v }
          .getOrElse(sys.error(s"no registration parsed for query $name")))
      val (file, line) = loc(om)
        .getOrElse(sys.error(s"cannot locate def ${om._1}.${om._2} for $name"))
      Row(name, om._1, om._2, file, line, gateOf(name), expByImpl.get(om))
    }
  }

  def render(rows: Seq[Row]): String = {
    val sb = new StringBuilder
    sb.append("# OPERATORS — generated query/operator index\n\n")
    sb.append(s"One row per driver-facing query (${rows.size} total). Regenerate with\n")
    sb.append("`sbt 'runMain graft.cli.OperatorsIndex'` after adding queries — the\n")
    sb.append("generator fails if any registration no longer resolves, so this file\n")
    sb.append("tracks `SparkEntry` exactly. Gate column: `oracle` = DuckDB hash-gated\n")
    sb.append("by the driver (`CORRECTNESS_r*.json`); `rows-only` = justified\n")
    sb.append("estimate/fixpoint surface with its guarantee oracle-gated in the named\n")
    sb.append("scalar twin. Scale exp = SCALE.md §7's latest measured consecutive-pair\n")
    sb.append("exponents for the implementing method's probe build (1.0 = linear;\n")
    sb.append("blank = family not individually probed — see SCALE.md for the\n")
    sb.append("family-level argument).\n")
    rows.groupBy(r => familyOf(r.name)).toSeq.sortBy(_._1).foreach { case (fam, rs) =>
      sb.append(s"\n## $fam (${rs.size})\n\n")
      sb.append("| query | implementation | gate | scale exp |\n|---|---|---|---|\n")
      rs.sortBy(_.name).foreach { r =>
        val gate = r.gate.replace("|", "\\|")
        sb.append(s"| ${r.name} | `${r.obj}.${r.method}` — ${r.file}:${r.line} " +
          s"| $gate | ${r.scaleExp.getOrElse("")} |\n")
      }
    }
    sb.toString
  }

  /** The README's query-count line, derived from the same rows as
    * OPERATORS.md — the generator stamps it so the README cannot drift
    * (VERDICT r11 #5). Only the full stamped line shape is rewritten —
    * anchored on the trailing `OPERATORS.md` pointer — so unrelated prose
    * that happens to say "N named queries" is never clobbered. */
  def readmeCountLine(rows: Seq[Row]): String =
    s"${rows.size} named queries (${rows.count(_.gate == "oracle")} oracle-gated " +
      s"+ ${rows.count(_.gate != "oracle")} justified rows-only) + their DuckDB " +
      "oracle SQL — per-query index: OPERATORS.md"

  def stampReadme(srcRoot: String, rows: Seq[Row]): Boolean = {
    val readme = Paths.get(srcRoot, "README.md")
    if (!Files.exists(readme)) return false
    val txt = read(readme)
    val patched = txt.replaceAll(
      """\d+ named queries \(\d+ oracle-gated[^\n]*OPERATORS\.md""",
      java.util.regex.Matcher.quoteReplacement(readmeCountLine(rows)))
    val changed = patched != txt
    if (changed) Files.write(readme, patched.getBytes(StandardCharsets.UTF_8))
    changed
  }

  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("OPERATORS.md")
    val srcRoot = args.lift(1).getOrElse(".")
    val rows = buildRows(srcRoot)
    Files.write(Paths.get(out), render(rows).getBytes(StandardCharsets.UTF_8))
    val stamped = stampReadme(srcRoot, rows)
    println(s"[operators] wrote ${rows.size} rows to $out " +
      s"(${rows.count(_.gate == "oracle")} oracle, " +
      s"${rows.count(_.gate != "oracle")} rows-only, " +
      s"${rows.count(_.scaleExp.isDefined)} scale-probed)" +
      (if (stamped) "; README.md count line restamped" else "; README.md already current"))
  }
}
