package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.OperatorsIndex

/** Pins the generated operator index's resolution invariants under `sbt
  * test`: every runtime query must parse to an `Object.method` registration
  * and locate to a real `def` in the main tree — so OPERATORS.md can never
  * silently drop or mislabel a query (it either regenerates complete or the
  * build fails).
  */
class OperatorsIndexSpec extends AnyFunSuite {

  lazy val rows = OperatorsIndex.buildRows(".")

  test("every registered query resolves to an implementation site") {
    assert(rows.size == SparkEntry.queries.size)
    rows.foreach { r =>
      assert(r.file.endsWith(".scala") && r.line > 0, s"${r.name}: ${r.file}:${r.line}")
      assert(new java.io.File(r.file).isFile, s"${r.name}: missing ${r.file}")
    }
  }

  test("gate column matches the driver ledger maps exactly") {
    rows.foreach { r =>
      if (SparkEntry.oracleSql.contains(r.name)) assert(r.gate == "oracle", r.name)
      else assert(r.gate.startsWith("rows-only — "), r.name)
    }
    assert(rows.count(_.gate != "oracle") == VerifySupport.rowsOnlyJustified.size)
  }

  test("README's query-count line is current (regenerate with OperatorsIndex)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains(OperatorsIndex.readmeCountLine(rows)),
      "README count line stale — run `sbt 'runMain graft.cli.OperatorsIndex'`")
  }

  test("PLANS.md is current (regenerate with PlansDump after planner-visible changes)") {
    // the committed plan artifact must track the flagship list at HEAD
    // (VERDICT r12 #3: PLANS.md went one round stale unnoticed) — adding a
    // flagship without re-running `sbt 'runMain graft.cli.PlansDump'` fails
    // here, the same discipline the README count line gets above
    val plans = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("PLANS.md")), "UTF-8")
    val headers = plans.linesIterator.filter(_.startsWith("## ")).map(_.drop(3).trim).toSet
    graft.cli.PlansDump.Flagship.foreach { name =>
      assert(headers(name), s"PLANS.md missing plan for $name — rerun PlansDump")
    }
    assert(headers.size == graft.cli.PlansDump.Flagship.size,
      s"PLANS.md carries stale sections: ${(headers -- graft.cli.PlansDump.Flagship).mkString(",")}")
  }

  test("Flagship is complete: every >2s clean-bench query has a committed plan audit") {
    // VERDICT r13 #2: the PLANS.md gate guarded the list's consistency but
    // not its completeness — the round's heaviest new queries never joined
    // Flagship. Cross-check against the newest committed clean-box bench
    // artifact: any query that costs > 2 s steady-state is exactly the kind
    // whose 100 TB plan a reviewer must be able to read.
    // newest = highest ROUND NUMBER, not lexicographic name (ADVICE r14:
    // "BENCH_r9…" would outrank "BENCH_r14…" under a name sort)
    val round = "BENCH_r(\\d+)_clean_full\\.json".r
    val artifacts = new java.io.File(".").listFiles()
      .filter(f => f.getName.matches("BENCH_r\\d+_clean_full\\.json"))
      .sortBy(f => round.findFirstMatchIn(f.getName).get.group(1).toInt)
    assert(artifacts.nonEmpty, "no clean bench artifact committed")
    val text = new String(java.nio.file.Files.readAllBytes(
      artifacts.last.toPath), "UTF-8")
    // the flat {"name": seconds, ...} "queries" object ONLY — the artifact
    // carries further per-query maps after it (query_load), so the parse
    // must stop at the object's closing brace
    val q = """"([a-z0-9_]+)"\s*:\s*([0-9.]+)""".r
    def objectAfter(key: String): String = {
      val parts = text.split("\"" + key + "\"\\s*:\\s*\\{")
      if (parts.length < 2) "" else parts(1).take(parts(1).indexOf('}'))
    }
    val inQueries = objectAfter("queries")
    // loud-failure guard (ADVICE r14): a key rename or format drift would
    // make objectAfter return "" and the gate pass while checking nothing —
    // pin the parsed per-query count to the artifact's own n_queries field
    val nQueries = """"n_queries"\s*:\s*(\d+)""".r
      .findFirstMatchIn(text).map(_.group(1).toInt)
      .getOrElse(fail(s"${artifacts.last.getName}: no n_queries field — format drift"))
    val parsedCount = q.findAllMatchIn(inQueries).size
    assert(parsedCount == nQueries,
      s"${artifacts.last.getName}: parsed $parsedCount query lines but artifact " +
        s"declares n_queries=$nQueries — queries-object parse went vacuous")
    // a first-pass line recorded under load carries its quiet-box rerun in
    // the artifact's rerun map — judge the line by min(first, rerun), the
    // same rule Bench uses for its own headline
    val rerunOf: Map[String, Double] = {
      val entry = ("\"([a-z0-9_]+)\"\\s*:\\s*\\{[^}]*" +
        "\"rerun\"\\s*:\\s*([0-9.]+)[^}]*\\}").r
      val parts = text.split("\"rerun\"\\s*:\\s*\\{")
      if (parts.length < 2) Map.empty
      else {
        // the rerun object nests per-query objects: scan its full extent by
        // brace balance
        var depth = 1; var i = 0; val body = parts(1)
        while (depth > 0 && i < body.length) {
          if (body(i) == '{') depth += 1 else if (body(i) == '}') depth -= 1
          i += 1
        }
        entry.findAllMatchIn(body.take(i))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    val flagship = graft.cli.PlansDump.Flagship.toSet
    val offenders = q.findAllMatchIn(inQueries)
      .map(m => m.group(1) -> math.min(m.group(2).toDouble,
        rerunOf.getOrElse(m.group(1), Double.MaxValue)))
      .filter { case (name, sec) =>
        sec > 2.0 && SparkEntry.queries.contains(name) && !flagship(name)
      }.map { case (n, s) => s"$n=$s" }.toSeq
    assert(offenders.isEmpty,
      s"${artifacts.last.getName}: >2s queries missing from PlansDump.Flagship: " +
        offenders.mkString(", "))
  }

  test("scale exponents attach to probed methods") {
    // the probe builds that call a SparkEntry-registered method must surface
    // in at least this many rows (several builds cover non-query stages)
    val probed = rows.filter(_.scaleExp.isDefined)
    assert(probed.size >= 15, s"only ${probed.map(_.name)} carry exponents")
    // spot-pins: round-10 batch families the verdict asked to see covered
    val names = probed.map(_.name).toSet
    Seq("docs_rag_chunks", "docs_bootstrap_ci", "events_diff_in_diff",
        "events_forecast_ewma", "text_readability", "events_attribution",
        "dedup_cdc_chunks").foreach { q =>
      assert(names(q), s"$q lost its scale-probe linkage")
    }
  }
}
