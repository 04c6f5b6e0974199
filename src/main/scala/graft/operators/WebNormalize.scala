package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures.table

/** Web-corpus front-door normalizers (VERDICT r9 #7): URL canonicalization
  * feeding the exact-dedup path, and HTML boilerplate stripping with a
  * tag-density quality score — the two preprocessing steps every
  * crawl-derived LLM corpus runs before any dedup/quality stage
  * (cf. CCNet/RefinedWeb pipelines; full DOM parsing à la trafilatura is
  * out of scope — these are the regex-expressible rules).
  *
  * The fixture tables carry no URL or HTML columns, so each operator first
  * BUILDS a deterministic messy input from fixture columns (same
  * construction in the DuckDB oracle — the construction is scaffolding;
  * the normalizer is what's under test). All transformations are per-row
  * regex/string projections (whole-stage codegen, no shuffle) followed by
  * at most one bounded group-by — the shape that survives 100 TB trivially.
  *
  * Every regex here is written in the COMMON dialect of Java (Spark) and
  * RE2 (DuckDB): no backreferences, no lookaround — script/style/nav/...
  * blocks get one pattern each instead of a backreferenced `</\1>`, and
  * port/slash rules capture their context instead of looking around it.
  */
object WebNormalize {

  /** Messy-URL construction: scheme/host case noise, an explicit default
    * port, duplicate slashes, tracking params out of order, a fragment.
    * `doc_id % 50` gives genuine canonical collisions (docs sharing a
    * source and path slot), so the dedup stage downstream has real work. */
  private def rawUrl(c: Column, src: Column): Column =
    concat(lit("HTTPS://WWW.Example.COM:443//"), src, lit("/page//"),
      (c % 50).cast("string"),
      lit("/?utm_source=feed&z=26&fbclid=abc123&a=1&utm_medium=rss&id="),
      ((c % 50) % 7).cast("string"), lit("&gclid=xyz#section-2"))

  private val rawUrlSql =
    "'HTTPS://WWW.Example.COM:443//' || source || '/page//' || " +
      "CAST(doc_id % 50 AS VARCHAR) || " +
      "'/?utm_source=feed&z=26&fbclid=abc123&a=1&utm_medium=rss&id=' || " +
      "CAST((doc_id % 50) % 7 AS VARCHAR) || '&gclid=xyz#section-2'"

  /** Canonicalize one URL column. Steps (each a codegen'd expression):
    *  1. drop the `#fragment`, split off the query string;
    *  2. lowercase scheme+host, strip a leading `www.` and the default
    *     `:443`/`:80` port;
    *  3. collapse duplicate slashes in the PATH (split from the authority
    *     first, so `://` is never touched), strip one trailing slash
    *     (a lone root `/` survives);
    *  4. drop tracking params (`utm_*`, `fbclid`, `gclid`), SORT the
    *     survivors (param order never distinguishes resources), re-join.
    * The output is the stable dedup key: byte-equal iff the URLs name the
    * same resource under these rules. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val qs = when(noFrag.contains("?"), regexp_extract(noFrag, "\\?(.*)$", 1))
      .otherwise(lit(""))
    val authority = lower(regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    val noWww = regexp_replace(authority, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/:]+):443$", "$1"),
      "^(http://[^/:]+):80$", "$1")
    val path = regexp_extract(base, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    val canonPath =
      regexp_replace(regexp_replace(path, "//+", "/"), "(.)/$", "$1")
    val keptParams = filter(split(qs, "&"),
      p => !(p.rlike("^(utm_[^=]*|fbclid|gclid)=") || p === ""))
    val canonQs = array_join(array_sort(keptParams), "&")
    val hostPath = concat(noPort, canonPath)
    when(canonQs === "", hostPath).otherwise(concat(hostPath, lit("?"), canonQs))
  }

  /** The same canonicalization in portable DuckDB SQL over a column expr. */
  def canonicalUrlSql(urlExpr: String): String = {
    val noFrag = s"regexp_replace($urlExpr, '#.*$$', '')"
    val base = s"regexp_extract($noFrag, '^([^?]*)', 1)"
    val qs = s"CASE WHEN contains($noFrag, '?') THEN regexp_extract($noFrag, '\\?(.*)$$', 1) ELSE '' END"
    val authority = s"lower(regexp_extract($base, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)', 1))"
    val noWww = s"regexp_replace($authority, '^(https?://)www\\.', '\\1')"
    val noPort = s"regexp_replace(regexp_replace($noWww, " +
      s"'^(https://[^/:]+):443$$', '\\1'), '^(http://[^/:]+):80$$', '\\1')"
    val path = s"regexp_extract($base, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$$', 1)"
    val canonPath =
      s"regexp_replace(regexp_replace($path, '//+', '/', 'g'), '(.)/$$', '\\1')"
    val kept = s"list_sort(list_filter(string_split($qs, '&'), " +
      s"p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=') AND p <> ''))"
    s"CASE WHEN len($kept) = 0 THEN $noPort || $canonPath " +
      s"ELSE $noPort || $canonPath || '?' || list_aggregate($kept, 'string_agg', '&') END"
  }

  /** Per-document URL canonicalization: (doc_id, url_canonical) for every
    * document, ordered — the projection that feeds exact dedup. */
  def urlCanonicalize(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        canonicalUrl(rawUrl(col("doc_id"), col("source"))).as("url_canonical"))
      .orderBy("doc_id")

  val urlCanonicalizeOracle: String =
    s"""SELECT doc_id, ${canonicalUrlSql(s"($rawUrlSql)")} AS url_canonical
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact dedup OVER canonical URLs: the production shape — canonicalize
    * (per-row projection), group on the canonical key (ONE shuffle on a
    * short string key, never the raw URL or the document body), keep-first
    * per group. Emits the duplicate-group profile: groups with >1 doc,
    * their size, and the kept (minimum) doc id. */
  def urlDedupGroups(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        canonicalUrl(rawUrl(col("doc_id"), col("source"))).as("url_canonical"))
      .groupBy("url_canonical")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy("url_canonical")

  val urlDedupGroupsOracle: String =
    s"""SELECT ${canonicalUrlSql(s"($rawUrlSql)")} AS url_canonical,
       |  count(*) AS n_docs, min(doc_id) AS keep_doc_id
       |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY url_canonical""".stripMargin

  /** Deterministic HTML wrapper: head with a script, nav/footer/ad
    * boilerplate blocks around the real text — the structure a crawl
    * snapshot has and a training corpus must shed. */
  private def rawHtml(text: Column, src: Column): Column =
    concat(lit("<html><head><title>"), src,
      lit("</title><script>var x=1;track();</script>" +
        "<style>.ad{color:red}</style></head><body>" +
        "<nav>home | about | contact</nav><p>"),
      text,
      lit("</p><div class=\"ad\">BUY NOW!!!</div>" +
        "<footer>&copy; 2024 example.com</footer></body></html>"))

  private val rawHtmlSql =
    "'<html><head><title>' || source || '</title><script>var x=1;track();</script>" +
      "<style>.ad{color:red}</style></head><body>" +
      "<nav>home | about | contact</nav><p>' || text || " +
      "'</p><div class=\"ad\">BUY NOW!!!</div>" +
      "<footer>&copy; 2024 example.com</footer></body></html>'"

  /** Strip one HTML column down to its content text:
    *  1. remove `<script>`/`<style>` elements WITH their contents (one
    *     pattern each — no backreference, so RE2 runs the same rule);
    *  2. remove boilerplate ELEMENTS (`nav`, `footer`, ad-classed `div`)
    *     with their contents — the tag-level boilerplate rule;
    *  3. strip remaining tags to spaces, decode the common entities,
    *     collapse whitespace, trim. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script\\s*>", " "),
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noBoiler = regexp_replace(regexp_replace(regexp_replace(noScript,
      "(?is)<nav\\b[^>]*>.*?</nav\\s*>", " "),
      "(?is)<footer\\b[^>]*>.*?</footer\\s*>", " "),
      "(?is)<div\\s+class=\"ad\"[^>]*>.*?</div\\s*>", " ")
    val noTags = regexp_replace(noBoiler, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags, "&amp;", "&"), "&lt;", "<"), "&gt;", ">"), "&copy;", "(c)")
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The same stripper in portable DuckDB SQL over a column expr. */
  def stripHtmlSql(htmlExpr: String): String = {
    val noScript = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'(?is)<script\\b[^>]*>.*?</script\\s*>', ' ', 'g'), " +
      s"'(?is)<style\\b[^>]*>.*?</style\\s*>', ' ', 'g')"
    val noBoiler = s"regexp_replace(regexp_replace(regexp_replace($noScript, " +
      s"'(?is)<nav\\b[^>]*>.*?</nav\\s*>', ' ', 'g'), " +
      s"'(?is)<footer\\b[^>]*>.*?</footer\\s*>', ' ', 'g'), " +
      s"'(?is)<div\\s+class=\"ad\"[^>]*>.*?</div\\s*>', ' ', 'g')"
    val noTags = s"regexp_replace($noBoiler, '(?s)<[^>]*>', ' ', 'g')"
    val decoded = "regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
      s"$noTags, '&amp;', '&', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&copy;', '(c)', 'g')"
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** Boilerplate-strip profile: per document, the raw/stripped lengths, the
    * permille of characters that were markup+boilerplate (tag density — the
    * quality signal trafilatura-style extractors threshold on), and
    * `roundtrip_ok`: stripping the wrapper recovers EXACTLY the original
    * text (whitespace-normalized) — the end-to-end correctness bit,
    * asserted per-row on both engines. */
  def htmlStripProfile(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(rawHtml(col("text"), col("source"))).as("raw_len"),
        stripHtml(rawHtml(col("text"), col("source"))).as("stripped"))
      .select(col("doc_id"),
        col("raw_len").cast("bigint").as("raw_len"),
        length(col("stripped")).cast("bigint").as("text_len"),
        expr("CAST((raw_len - length(stripped)) * 1000 div raw_len AS BIGINT)")
          .as("boiler_permille"),
        (col("stripped") === trim(regexp_replace(col("text"), "\\s+", " ")))
          .as("roundtrip_ok"))
      .orderBy("doc_id")

  val htmlStripProfileOracle: String = {
    val raw = s"($rawHtmlSql)"
    val stripped = stripHtmlSql(raw)
    s"""SELECT doc_id,
       |  CAST(length($raw) AS BIGINT) AS raw_len,
       |  CAST(length($stripped) AS BIGINT) AS text_len,
       |  CAST((length($raw) - length($stripped)) * 1000 // length($raw) AS BIGINT) AS boiler_permille,
       |  $stripped = trim(regexp_replace(text, '\\s+', ' ', 'g')) AS roundtrip_ok
       |FROM documents ORDER BY doc_id""".stripMargin
  }
}
