package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** GLOBAL-WINDOW AUDIT (VERDICT r16 #3): every unpartitioned
  * `Window.orderBy` in src/main moves ALL its input rows to ONE task —
  * fine for a bounded frame, a silent 100 TB killer for a corpus-sized
  * one. This spec PINS the triage: (1) a static scan asserts the exact
  * per-file site counts, so a new unpartitioned window cannot land
  * without being added to the audit table below; (2) dynamic checks
  * assert the bound CLAIM of each category's representative frames at
  * the fixture.
  *
  * ==Audit table (every `Window.orderBy` site in src/main, r17)==
  *
  * Categories: REF = deliberate single-partition semantic reference twin
  * (documented, spec-only shape); TOPK = window runs after `.limit(k)`
  * (≤ k rows by construction); DOMAIN = frame keyed by a value domain or
  * the calendar, independent of corpus row count; REDUCED = frame is a
  * corpus-level aggregate one grouping below the corpus (|users|,
  * |customers|, |purchases|, |docs|/64) — safe at fixture scale, and the
  * sites carry the documented escalation path (two-level prefix / bounded
  * calibration sample) for extreme cardinalities.
  *
  * | file | site (method) | category | bound at fixture |
  * |---|---|---|---|
  * | ProfileQueries | quantityDepthHistogramNtile | REF | lineitem rows (documented spec twin; engine form is quantityDepthHistogram) |
  * | ProfileQueries | giniOf wBucket | DOMAIN | distinct cents div 10000 ≤ ~1100 buckets (price domain) |
  * | ProfileQueries | spearmanRho midranks ×1 (shared helper) | DOMAIN | |quantity| and |discount| value domains (≤ 50 / ≤ 11) |
  * | ProfileQueries | lorenzSources (w + rank) ×2 | REDUCED | |sources| = 20 |
  * | ProfileQueries | weightedPercentilesOf wBucket | DOMAIN | distinct cents div 10000 buckets |
  * | Similarity | centroidTopPc-style top (msd) | TOPK | post-limit(k) |
  * | Similarity | kwLeg / rankVecLeg / fuseRrf | TOPK | post-limit(legK / k) |
  * | EventOps | weekendKs wCdf | DOMAIN | ⌊value⌋ bins |
  * | EventOps | rfmScores ntile ×3 | REDUCED | |purchasing users| (documented: two-level shape at extreme counts) |
  * | EventOps | maxConcurrency wBucket | DOMAIN | calendar hours |
  * | EventOps | userGrowth wDays | DOMAIN | calendar days |
  * | EventOps | busyWindows islands | DOMAIN | calendar hours |
  * | EventOps | reorderProfile wBucket | DOMAIN | calendar hours |
  * | EventOps | conversionLag ntile | REDUCED | |purchases with a converting click| |
  * | TextAnalysis | topVocab rank | TOPK | post-limit(20) |
  * | TextAnalysis | vocabGrowth wBucket | REDUCED | |docs| div 64 (two-level outer frame) |
  * | TextAnalysis | quantileNormalize wBucket | DOMAIN | n_chars div 1024 buckets |
  * | RelationalExt | revenueDeciles ntile | REDUCED | |customers| |
  * | RelationalExt | paretoFrontier wSuffix | DOMAIN | |p_size| value domain |
  */
class GlobalWindowAuditSpec extends AnyFunSuite {

  private val expectedSites: Map[String, Int] = Map(
    "profile/ProfileQueries.scala" -> 6, // ntile twin, gini wBucket, midranks, lorenz ×2, weighted wBucket
    "operators/Similarity.scala" -> 4,
    "operators/EventOps.scala" -> 9,
    "operators/TextAnalysis.scala" -> 3,
    "operators/RelationalExt.scala" -> 2)

  test("static scan: every unpartitioned Window.orderBy site is in the audit table") {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    import scala.jdk.CollectionConverters._
    val found = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .flatMap { p =>
        val src = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        // count CODE occurrences of an unpartitioned window builder
        // (strip line comments and doc comments first)
        val code = src.linesIterator
          .filterNot(l => l.trim.startsWith("//") || l.trim.startsWith("*"))
          .mkString("\n")
        val n = "Window\\.orderBy".r.findAllIn(code).size
        if (n > 0) Some(root.relativize(p).toString.replace('\\', '/') -> n) else None
      }.toMap
    assert(found == expectedSites,
      s"unpartitioned Window.orderBy sites changed — update the audit table. found=$found expected=$expectedSites")
  }

  // ---- dynamic bound checks: the audit's claims, asserted on the fixture

  private lazy val spark = SparkSuite.spark
  private def docs = spark.read.parquet(s"${SparkSuite.Sf001}/documents.parquet")
  private def events = spark.read.parquet(s"${SparkSuite.Sf001}/events.parquet")
  private def lineitem = spark.read.parquet(s"${SparkSuite.Sf001}/lineitem.parquet")

  test("DOMAIN frames are value-domain-sized at the fixture (corpus-independent keys)") {
    // giniOf / weightedPercentilesOf outer frame: cents div 10000 buckets
    val giniBuckets = lineitem
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("bigint").as("cents"))
      .select(expr("cents div 10000").as("b")).distinct().count()
    // price domain tops out ~10^7 cents -> ~1100 buckets of 10^4 cents,
    // corpus-row-count-independent (1041 at sf0.01 AND sf0.001)
    assert(giniBuckets <= 2048, s"gini bucket frame grew: $giniBuckets")
    // calendar frames: hours and days covered by the fixture's event span
    val hours = events.select(expr("unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .distinct().count()
    assert(hours <= 24 * 60, s"calendar-hour frame implausibly large: $hours")
    // spearman midranks: quantity / discount value domains
    val qDom = lineitem.select(col("l_quantity").cast("bigint")).distinct().count()
    assert(qDom <= 60, s"quantity domain grew: $qDom")
  }

  test("REDUCED frames are one aggregation below corpus rows at the fixture") {
    val users = events.filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    val eventRows = events.count()
    assert(users > 0 && users < eventRows / 2,
      s"rfm user frame not reduced: $users of $eventRows")
    val sources = docs.select("source").distinct().count()
    assert(sources <= 32, s"lorenz source frame grew: $sources")
  }

  test("TOPK windows run strictly after a limit: outputs are ≤ k rows") {
    // the public queries whose final rank windows are post-limit
    val top = graft.operators.TextAnalysis.docFrequency(spark, SparkSuite.Sf001)
    assert(top.count() <= 20)
  }
}
