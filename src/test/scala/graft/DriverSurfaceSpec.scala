package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-enforced adjudication-surface lint (VERDICT r9 #2): every
  * driver-facing query in [[SparkEntry.queries]] must emit ONLY atomic
  * columns. Array/Map/Struct outputs crash the driver's pandas
  * `sort_values` harness — the round-3 `embedding_quantize_int8` failure
  * mode that the round-9 sketch split silently reintroduced three times.
  * This spec turns the documented lesson into a compile-the-plan gate that
  * fails `sbt test` the moment any registered query regresses, and
  * [[VerifySupport.dumpQueries]] enforces the same rule at verify time.
  *
  * Also pins the ledger discipline from VERDICT r9 #4: every query WITHOUT
  * an oracle entry must be on the explicit rows-only allowlist, each with a
  * one-line justification — so "no_oracle" rows in the driver artifact are
  * deliberate declarations, never accidents.
  */
class DriverSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  /** Queries deliberately registered WITHOUT a DuckDB oracle, with why.
    * Moved to main ([[VerifySupport.rowsOnlyJustified]]) in round 11 so the
    * generated operator index reads the same single source of truth this
    * spec enforces. */
  val rowsOnlyJustified: Map[String, String] = VerifySupport.rowsOnlyJustified

  test("every driver-facing query emits only atomic (pandas-sortable) columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val complex = VerifySupport.complexColumns(q(spark, dir))
      if (complex.isEmpty) None else Some(s"$name -> ${complex.mkString("; ")}")
    }
    assert(offenders.isEmpty,
      s"driver-facing queries with Array/Map/Struct columns (crash the driver harness):\n  " +
        offenders.mkString("\n  "))
  }

  test("every oracle-less query is on the justified rows-only allowlist (and vice versa)") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val unjustified = noOracle -- rowsOnlyJustified.keySet
    val stale = rowsOnlyJustified.keySet -- noOracle
    assert(unjustified.isEmpty,
      s"queries without an oracle AND without a rows-only justification: $unjustified")
    assert(stale.isEmpty,
      s"allowlist entries that now have oracles (drop them): $stale")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries with no query: $orphans")
  }
}
