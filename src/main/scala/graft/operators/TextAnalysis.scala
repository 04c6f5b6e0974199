package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures.table

/** Text-analysis operators for LLM-data pipelines (BASELINE.json north star):
  * token counting, quality scoring, language ID, and document fingerprinting
  * over the `documents` table. Everything is built from codegen'd built-in
  * functions (split/filter/aggregate/regexp) — no UDFs — so the whole pipe
  * stays inside WholeStageCodegen and scales linearly with a single
  * column-pruned scan per query.
  *
  * Cross-engine determinism: token counts are integers; ratios are a single
  * double division of two integers (bit-identical on any IEEE engine); the
  * rolling fingerprint is pure 64-bit integer math.
  */
object TextAnalysis {

  private val words: Column = split(col("text"), " ")

  /** Count of array elements as BIGINT (DuckDB `len()` returns int64). */
  private def sz(c: Column): Column = size(c).cast("bigint")

  /** Token counting: whitespace tokens, alpha words (regexp), and a BPE-ish
    * segmentation count (`letters+ | digits+ | single punct`). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(
      col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars_calc"),
      sz(words).as("ws_tokens"),
      expr("regexp_count(text, '[a-z]+')").cast("bigint").as("alpha_tokens"),
      expr("regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')").cast("bigint").as("bpe_ish_tokens")
    ).orderBy("doc_id")

  val tokenCountsOracle: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_calc,
      |  len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe_ish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TOKENIZER FERTILITY by (lang, source) — the chars-per-token and
    * tokens-per-doc ratios (exact half-up milli) that convert byte/char
    * budgets into token budgets per language slice: fertility is how a
    * mixture owner discovers that a low-resource language costs 2× the
    * tokens per char under a BPE-ish vocabulary and re-weights before
    * training, and the denominator every per-language token-budget row in
    * [[mixtureBudget]]-style planning divides by. Same whitespace and
    * BPE-ish token definitions as [[tokenCounts]] (one regex dialect,
    * Java∩RE2∩DuckDB). One scan, row-local counting, |lang|×|source|
    * groups with map-side partials — the scan is the cost at any scale. */
  def fertility(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"), col("source"),
        length(col("text")).cast("bigint").as("chars"),
        sz(words).as("ws_toks"),
        expr("regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')")
          .cast("bigint").as("bpe"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars"),
        sum("ws_toks").as("ws_tokens"), sum("bpe").as("bpe_tokens"))
      .withColumn("chars_per_bpe_milli",
        expr("(1000 * chars + bpe_tokens div 2) div bpe_tokens"))
      .withColumn("bpe_per_doc_milli",
        expr("(1000 * bpe_tokens + n_docs div 2) div n_docs"))
      .orderBy("lang", "source")

  val fertilityOracle: String =
    """WITH per AS (
      |  SELECT lang, source, length(text) AS chars,
      |    len(string_split(text, ' ')) AS ws_toks,
      |    len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS bpe
      |  FROM documents
      |)
      |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(chars) AS BIGINT) AS chars,
      |  CAST(sum(ws_toks) AS BIGINT) AS ws_tokens,
      |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
      |  CAST((1000 * CAST(sum(chars) AS BIGINT) + CAST(sum(bpe) AS BIGINT) // 2)
      |    // CAST(sum(bpe) AS BIGINT) AS BIGINT) AS chars_per_bpe_milli,
      |  CAST((1000 * CAST(sum(bpe) AS BIGINT) + CAST(count(*) AS BIGINT) // 2)
      |    // CAST(count(*) AS BIGINT) AS BIGINT) AS bpe_per_doc_milli
      |FROM per GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ------------------------------------------------------------- real BPE
  /** REAL-BPE TOKENIZATION TABLE by (lang, source) — [[fertility]] re-based
    * on actual byte-pair merges ([[graft.functions.Bpe]]) instead of the
    * BPE-ish regex: per slice, document count, chars, real BPE tokens,
    * alpha words, regex-dialect tokens, and the two knobs a mixture owner
    * reads — subwords-per-word (true tokenizer fertility, exact half-up
    * milli) and chars-per-BPE-token. The merge loop runs in ONE codegen'd
    * native expression per row ([[graft.functions.Bpe.BpeTokenCount]],
    * executor-local word cache); the oracle replays the identical merge
    * table as a literal `replace` chain per word. One column-pruned scan,
    * |lang|×|source| groups with map-side partials — the 100 TB cost is
    * the scan. */
  def tokenizeBpe(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"), col("source"),
        length(col("text")).cast("bigint").as("chars"),
        graft.functions.Bpe.bpe_token_count(col("text")).as("bpe"),
        expr("regexp_count(text, '([a-zA-Z]+)')").cast("bigint").as("alpha_w"),
        expr("regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')")
          .cast("bigint").as("seg"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars"),
        sum("bpe").as("bpe_tokens"), sum("alpha_w").as("alpha_words"),
        sum("seg").as("regex_tokens"))
      // alpha-subword tokens = bpe_tokens − non-alpha tokens, and non-alpha
      // tokens = regex_tokens − alpha_words (each non-alpha segment is 1
      // token under both counters)
      .withColumn("subword_per_word_milli",
        expr("""CASE WHEN alpha_words = 0 THEN NULL
               |ELSE (1000 * (bpe_tokens - (regex_tokens - alpha_words))
               |  + alpha_words div 2) div alpha_words END""".stripMargin))
      .withColumn("chars_per_bpe_milli",
        expr("""CASE WHEN bpe_tokens = 0 THEN NULL
               |ELSE (1000 * chars + bpe_tokens div 2) div bpe_tokens END""".stripMargin))
      .orderBy("lang", "source")

  val tokenizeBpeOracle: String =
    s"""WITH ${graft.functions.Bpe.bpePerDocCtes()},
       |per AS (
       |  SELECT d.lang, d.source, length(d.text) AS chars,
       |    COALESCE(b.bpe, 0) AS bpe,
       |    len(regexp_extract_all(d.text, '[a-zA-Z]+')) AS alpha_w,
       |    len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS seg
       |  FROM documents d LEFT JOIN bpe b ON b.doc_id = d.doc_id
       |), g AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(chars) AS BIGINT) AS chars,
       |    CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       |    CAST(sum(alpha_w) AS BIGINT) AS alpha_words,
       |    CAST(sum(seg) AS BIGINT) AS regex_tokens
       |  FROM per GROUP BY lang, source
       |)
       |SELECT *,
       |  CASE WHEN alpha_words = 0 THEN NULL
       |  ELSE (1000 * (bpe_tokens - (regex_tokens - alpha_words))
       |    + alpha_words // 2) // alpha_words END AS subword_per_word_milli,
       |  CASE WHEN bpe_tokens = 0 THEN NULL
       |  ELSE (1000 * chars + bpe_tokens // 2) // bpe_tokens END AS chars_per_bpe_milli
       |FROM g ORDER BY lang, source""".stripMargin

  /** BPE TRAINER — learn `k` merges from the corpus by iterated most-
    * frequent-adjacent-pair counting (Sennrich et al., ACL 2016), fully
    * DISTRIBUTED and fully ORACLE-GATED: the vocabulary lives as a
    * (word-rep, freq) DataFrame (never collected — classic BPE training
    * cost is one corpus→word-frequency aggregation, after which each
    * iteration touches only the vocab table), each iteration explodes
    * adjacent symbol pairs from the `<sym>` delimited rep, sums freq-
    * weighted counts, takes the deterministic argmax (count DESC, then
    * lexicographic pair — the only driver traffic is that 1 row), and
    * applies the merge as a literal `replace` on the rep column. The
    * DuckDB oracle replays training EXACTLY with k unrolled CTE levels
    * (pair-count → 1-row argmax → replace), so the learned table is
    * hash-gated end-to-end, not just spec'd.
    *
    * 100 TB shape: the corpus scan is the cost; vocab is bounded by
    * |distinct words| (≈10⁷ rows, KBs each), so the k iterations are
    * negligible at any corpus size. k is small here to keep the unrolled
    * oracle tractable; production trainers run the same loop to 32k. */
  def bpeTrain(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val (learned, vocab) = bpeTrainRun(spark, dir, k)
    vocab.unpersist()
    learned.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** The shared training loop: returns the k learned merges AND the final
    * trained vocabulary as a (w, rep, cnt) DataFrame — `rep` is the word's
    * `<sym>` segmentation under the learned table, so `w → symbol count`
    * is the trained tokenizer's per-word cost map ([[tokenizeTrained]]
    * reads it; [[bpeTrain]] discards it). Caller owns unpersisting the
    * returned (cached) vocab. */
  /** The corpus→word-frequency vocabulary stage the trainer iterates on:
    * (word, `<sym>` rep, count). This is the ONE corpus scan in BPE
    * training — exposed so [[graft.cli.ScaleProbe]] can time it separately
    * and SCALE.md can attribute the trainer's corpus-axis cost to this
    * scan while showing the k merge rounds are vocab-bounded. */
  private[graft] def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(explode(expr("regexp_extract_all(text, '([a-zA-Z]+)', 1)")).as("w"))
      .groupBy("w").agg(count(lit(1)).cast("bigint").as("cnt"))
      .select(col("w"), expr("regexp_replace(w, '(.)', '<$1>')").as("rep"), col("cnt"))

  private def bpeTrainRun(spark: SparkSession, dir: String, k: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    // localCheckpoint, NOT cache: a cache materializes the data but each
    // round's LOGICAL plan still nests the whole lineage, so analyzer/
    // optimizer cost grows per round and the k axis goes super-linear —
    // the round-13 bpek probe measured exponent 3.6 at k=16 under cache,
    // 1.0 after the lineage cut (the PageRank/recursive-reach precedent)
    var vocab = bpeVocab(spark, dir).localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rank = 1
    while (rank <= k) {
      val best = vocab
        .select(col("cnt"), expr("regexp_extract_all(rep, '<([^<>]+)>', 1)").as("syms"))
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1),
            |  (x, y) -> struct(x AS l, y AS r))""".stripMargin)).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").as("pair_count"))
        .orderBy(desc("pair_count"), asc("l"), asc("r"))
        .limit(1).collect()(0)
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      learned += ((rank.toLong, l, r, l + r, c))
      // eager localCheckpoint materializes AND cuts lineage; the replaced
      // parent's blocks are dropped once unreferenced (ContextCleaner)
      vocab = vocab
        .withColumn("rep", expr(s"replace(rep, '<$l><$r>', '<$l$r>')"))
        .localCheckpoint()
      rank += 1
    }
    (learned.toSeq, vocab)
  }

  /** TRAIN-THEN-TOKENIZE (round 13, VERDICT r12 #4) — the loop from corpus
    * → learned vocabulary → fertility ON THAT VOCABULARY, closed as one
    * gated run: [[bpeTrainRun]] learns k merges, the final trained vocab's
    * per-word symbol counts become the tokenizer cost map, and the corpus
    * is re-tokenized under the TRAINED table (not the fixed
    * [[graft.functions.Bpe.DemoMerges]] demo table [[tokenizeBpe]] uses).
    * Per (lang, source): docs, chars, alpha word occurrences, regex-dialect
    * segments, total trained tokens (alpha subwords + 1 per non-alpha
    * segment), true trained fertility (subwords per word, half-up milli)
    * and chars per trained token. The oracle replays TRAINING ITSELF (the
    * k unrolled argmax+replace CTE levels, word kept through) and then the
    * application join — so a divergence anywhere in train OR apply fails
    * the hash.
    *
    * 100 TB shape: training cost is the one corpus→word-frequency shuffle
    * (vocab-bounded iterations after that); application is a second
    * corpus scan aggregated to (lang, source, word) BEFORE joining the
    * vocab cost map — the join is vocab-sized per slice, never
    * corpus-sized, and the word key is the natural shuffle key both sides
    * already share. */
  def tokenizeTrained(spark: SparkSession, dir: String, k: Int = 8): DataFrame = {
    val (_, vocab) = bpeTrainRun(spark, dir, k)
    val tok = vocab.select(col("w"),
      expr("size(regexp_extract_all(rep, '<([^<>]+)>', 1))").cast("bigint").as("toks"))
    val docs = table(spark, dir, "documents")
    val alpha = docs
      .select(col("lang"), col("source"),
        explode(expr("regexp_extract_all(text, '([a-zA-Z]+)', 1)")).as("w"))
      .groupBy("lang", "source", "w").agg(count(lit(1)).cast("bigint").as("cnt"))
      .join(tok, "w")
      .groupBy("lang", "source")
      .agg(sum(col("cnt") * col("toks")).as("alpha_tokens"),
        sum(col("cnt")).as("alpha_words"))
    docs
      .select(col("lang"), col("source"),
        length(col("text")).cast("bigint").as("chars"),
        expr("regexp_count(text, '([a-zA-Z]+)')").cast("bigint").as("aw"),
        expr("regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')")
          .cast("bigint").as("seg"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("chars"),
        sum("aw").as("aw"), sum("seg").as("regex_tokens"))
      .join(alpha, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), col("n_docs"), col("chars"),
        coalesce(col("alpha_words"), lit(0L)).as("alpha_words"),
        col("regex_tokens"),
        // non-alpha segments are 1 token each under any merge table
        (coalesce(col("alpha_tokens"), lit(0L)) + col("regex_tokens") - col("aw"))
          .as("trained_tokens"),
        expr("""CASE WHEN alpha_tokens IS NULL OR alpha_words = 0 THEN NULL
               |ELSE (1000 * alpha_tokens + alpha_words div 2) div alpha_words
               |END""".stripMargin).as("subword_per_word_milli"))
      .withColumn("chars_per_token_milli",
        expr("""CASE WHEN trained_tokens = 0 THEN NULL
               |ELSE (1000 * chars + trained_tokens div 2) div trained_tokens
               |END""".stripMargin))
      .orderBy("lang", "source")
  }

  def tokenizeTrainedOracle(k: Int = 8): String = {
    val base =
      """v0 AS (
        |  SELECT w, regexp_replace(w, '(.)', '<\1>', 'g') AS rep, cnt FROM (
        |    SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS cnt
        |    FROM documents d,
        |      unnest(regexp_extract_all(d.text, '[a-zA-Z]+')) AS t(tok)
        |    GROUP BY t.tok)
        |)""".stripMargin
    val levels = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS pair_count
         |  FROM (SELECT cnt, regexp_extract_all(rep, '<([^<>]+)>', 1) AS syms
         |        FROM v${i - 1}),
         |    unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS u(pr)
         |  GROUP BY l, r
         |  ORDER BY pair_count DESC, l, r LIMIT 1
         |), v$i AS (
         |  SELECT w, replace(rep, '<'||l||'><'||r||'>', '<'||l||r||'>') AS rep, cnt
         |  FROM v${i - 1}, p$i
         |)""".stripMargin
    }
    s"""WITH $base,
       |${levels.mkString(",\n")},
       |tok AS (
       |  SELECT w, CAST(len(regexp_extract_all(rep, '<([^<>]+)>', 1)) AS BIGINT) AS toks
       |  FROM v$k
       |), wc AS (
       |  SELECT d.lang, d.source, t.tok AS w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents d,
       |    unnest(regexp_extract_all(d.text, '[a-zA-Z]+')) AS t(tok)
       |  GROUP BY d.lang, d.source, t.tok
       |), alpha AS (
       |  SELECT lang, source,
       |    CAST(sum(wc.cnt * tok.toks) AS BIGINT) AS alpha_tokens,
       |    CAST(sum(wc.cnt) AS BIGINT) AS alpha_words
       |  FROM wc JOIN tok USING (w) GROUP BY lang, source
       |), per AS (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(length(text)) AS BIGINT) AS chars,
       |    CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+'))) AS BIGINT) AS aw,
       |    CAST(sum(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
       |      AS regex_tokens
       |  FROM documents GROUP BY lang, source
       |)
       |SELECT p.lang, p.source, p.n_docs, p.chars,
       |  COALESCE(a.alpha_words, 0) AS alpha_words,
       |  p.regex_tokens,
       |  CAST(COALESCE(a.alpha_tokens, 0) + p.regex_tokens - p.aw AS BIGINT)
       |    AS trained_tokens,
       |  CASE WHEN a.alpha_tokens IS NULL OR a.alpha_words = 0 THEN NULL
       |  ELSE CAST((1000 * a.alpha_tokens + a.alpha_words // 2) // a.alpha_words AS BIGINT)
       |  END AS subword_per_word_milli,
       |  CASE WHEN COALESCE(a.alpha_tokens, 0) + p.regex_tokens - p.aw = 0 THEN NULL
       |  ELSE CAST((1000 * p.chars + (COALESCE(a.alpha_tokens, 0) + p.regex_tokens - p.aw) // 2)
       |    // (COALESCE(a.alpha_tokens, 0) + p.regex_tokens - p.aw) AS BIGINT)
       |  END AS chars_per_token_milli
       |FROM per p LEFT JOIN alpha a USING (lang, source)
       |ORDER BY p.lang, p.source""".stripMargin
  }

  def bpeTrainOracle(k: Int = 8): String = {
    val base =
      """w0 AS (
        |  SELECT regexp_replace(w, '(.)', '<\1>', 'g') AS rep, cnt FROM (
        |    SELECT t.tok AS w, CAST(count(*) AS BIGINT) AS cnt
        |    FROM documents d,
        |      unnest(regexp_extract_all(d.text, '[a-zA-Z]+')) AS t(tok)
        |    GROUP BY t.tok)
        |)""".stripMargin
    val levels = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS pair_count
         |  FROM (SELECT cnt, regexp_extract_all(rep, '<([^<>]+)>', 1) AS syms
         |        FROM w${i - 1}),
         |    unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS u(pr)
         |  GROUP BY l, r
         |  ORDER BY pair_count DESC, l, r LIMIT 1
         |), w$i AS (
         |  SELECT replace(rep, '<'||l||'><'||r||'>', '<'||l||r||'>') AS rep, cnt
         |  FROM w${i - 1}, p$i
         |)""".stripMargin
    }
    val rows = (1 to k).map(i =>
      s"SELECT $i AS merge_rank, l AS lhs, r AS rhs, l||r AS merged, pair_count FROM p$i")
    s"""WITH $base,
       |${levels.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY merge_rank""".stripMargin
  }

  /** [[packSequences]] re-based on REAL BPE token counts — the pack-then-
    * chunk window assignment a training pipeline actually runs once a real
    * tokenizer exists (whitespace counts overestimate sequence budget by
    * the fertility factor). Same per-lang partition-local cumsum plan; the
    * only change is the token counter, still one codegen'd expression in
    * the scan projection. */
  def packSequencesBpe(spark: SparkSession, dir: String, window: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.Bpe.bpe_token_count(col("text")).as("tokens"))
      .withColumn("stream_end", sum(col("tokens")).over(w))
      .withColumn("stream_offset", col("stream_end") - col("tokens"))
      .withColumn("window_id", expr(s"stream_offset div $window"))
      .select("doc_id", "lang", "tokens", "stream_offset", "window_id")
      .orderBy("doc_id")
  }

  val packSequencesBpeOracle: String =
    s"""WITH ${graft.functions.Bpe.bpePerDocCtes()}
       |SELECT doc_id, lang, tokens,
       |  CAST(sum(tokens) OVER w - tokens AS BIGINT) AS stream_offset,
       |  CAST((sum(tokens) OVER w - tokens) // 2048 AS BIGINT) AS window_id
       |FROM (
       |  SELECT d.doc_id, d.lang, COALESCE(b.bpe, 0) AS tokens
       |  FROM documents d LEFT JOIN bpe b ON b.doc_id = d.doc_id
       |)
       |WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |ORDER BY doc_id""".stripMargin

  /** READABILITY — integer-exact Flesch-Kincaid grade per document, the
    * classic audience-level filter in corpus curation (alongside Gopher
    * rules and quality scores). Heuristic counts, all from shared-dialect
    * regexes: words = alpha runs, sentences = terminal-punct marks,
    * syllables = vowel-group runs ([aeiouyAEIOUY]+ — deliberately includes
    * uppercase in the class instead of lower()ing, so no engine's Unicode
    * case table is involved). FK grade = 0.39·(w/s) + 11.8·(y/w) − 15.59,
    * held in centi-units with each term floor-divided independently
    * (`(39·w) div s + (1180·y) div w − 1559`) — every division is
    * non-negative, so Spark `div` ≡ DuckDB `//` and the score is
    * bit-identical cross-engine. One scan, per-row projection, codegen'd
    * regex — the 100 TB cost is the scan. */
  def readability(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        greatest(expr("regexp_count(text, '[A-Za-z]+')").cast("bigint"), lit(1L))
          .as("n_words"),
        greatest(expr("regexp_count(text, '[.!?]')").cast("bigint"), lit(1L))
          .as("n_sentences"),
        expr("regexp_count(text, '[aeiouyAEIOUY]+')").cast("bigint").as("n_syllables"))
      .withColumn("fk_centi",
        expr("""CAST((39 * n_words) div n_sentences
               |  + (1180 * n_syllables) div n_words - 1559 AS BIGINT)""".stripMargin))
      .orderBy("doc_id")

  val readabilityOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1) AS n_words,
      |    greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS n_sentences,
      |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS n_syllables
      |  FROM documents)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  CAST((39 * n_words) // n_sentences
      |    + (1180 * n_syllables) // n_words - 1559 AS BIGINT) AS fk_centi
      |FROM m ORDER BY doc_id""".stripMargin

  private val StopEn = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for")

  /** Reusable per-row quality gate (shared by [[qualityScores]] and
    * [[cleanPipeline]]): ≥20 tokens and ≥2% stopwords. */
  private[operators] val passesQualityCol: Column = {
    val nTokens = sz(words)
    val stopCnt = sz(filter(words, w => w.isInCollection(StopEn)))
    nTokens >= 20 && (stopCnt.cast("double") / nTokens) >= 0.02
  }

  /** Quality scoring: length, mean token length, stopword ratio, and a
    * boolean gate — the standard cheap pre-filters for a training corpus. */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = sz(words)
    val stopCnt = sz(filter(words, w => w.isInCollection(StopEn)))
    table(spark, dir, "documents").select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      stopCnt.as("stopword_count"),
      (stopCnt.cast("double") / nTokens).as("stopword_ratio"),
      ((length(col("text")).cast("bigint") - (nTokens - lit(1L))).cast("double") / nTokens).as("mean_token_len"),
      (nTokens >= 20 && (stopCnt.cast("double") / nTokens) >= 0.02).as("passes_quality")
    ).orderBy("doc_id")
  }

  val qualityScoresOracle: String = {
    val stopList = StopEn.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  len(string_split(text, ' ')) AS n_tokens,
       |  len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS stopword_count,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS stopword_ratio,
       |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
       |    / len(string_split(text, ' ')) AS mean_token_len,
       |  len(string_split(text, ' ')) >= 20 AND
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
       |      / len(string_split(text, ' ')) >= 0.02 AS passes_quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------- Gopher-style rule filters
  /** Gopher-style document rule filter (Rae et al. 2021 §A1.1 "quality
    * filtering", RefinedWeb's repetition variant): per-doc word-count band,
    * mean-word-length band, and the two REPETITION rules that matter on a
    * word-stream corpus — the character fraction covered by the most
    * repetitious unigram and bigram. "Most repetitious" is the n-gram
    * maximizing `occurrences × chars` (a numeric max — no argmax tie-break
    * needed, and exactly the "fraction of characters in the most common
    * n-gram" Gopher measures). Bands are Gopher's published [50, 100k]
    * words / [3, 10] mean chars; repetition cuts at 0.15 (unigram) / 0.20
    * (bigram, Gopher's 2-gram threshold).
    *
    * 100 TB shape (r16): the per-doc "most repetitious n-gram" maxima are
    * ROW-LOCAL — one pass over the row's words with a per-row count map
    * ([[graft.functions.VectorExpressions.TopGramChars]], bit-equal to the
    * old explode → groupBy(doc, gram) → groupBy(doc) → LEFT JOIN pipeline,
    * pinned in VectorExpressionsSpec) — so the whole rule filter is ONE
    * corpus scan with zero shuffles before the presentation sort, where
    * the explode form crossed two corpus-sized (doc, gram) exchanges per
    * gram order plus two joins. No all-pairs, no windows — O(words) work,
    * O(distinct grams per doc) transient state. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorExpressions.top_gram_chars
    val docs = table(spark, dir, "documents")
    val n = sz(words)
    val wordChars = length(col("text")).cast("bigint") - (n - lit(1L))
    val base = docs.select(col("doc_id"), n.as("n_words"), wordChars.as("word_chars"),
      top_gram_chars(words, 1).as("top_uni_chars"),
      top_gram_chars(words, 2).as("top_bi_chars"))
    val meanLen = col("word_chars").cast("double") / col("n_words") // n_words ≥ 1 (split of any text)
    // a whitespace-only doc has word_chars = 0: DuckDB's x/0 is NULL while
    // Spark ANSI THROWS — guard to NULL so both engines emit the same row
    // (the NULL then flows identically: flags go NULL, `keep` still
    // resolves via false-AND-null when the word-count band already fails)
    def overChars(c: Column): Column =
      when(col("word_chars") === 0L, lit(null).cast("double"))
        .otherwise(c.cast("double") / col("word_chars"))
    val uniFrac = overChars(coalesce(col("top_uni_chars"), lit(0L)))
    val biFrac = overChars(coalesce(col("top_bi_chars"), lit(0L)))
    val wordsOk = col("n_words").between(50L, 100000L)
    val lenOk = meanLen.between(3.0, 10.0)
    val uniOk = uniFrac <= 0.15
    val biOk = biFrac <= 0.20
    base
      .select(
        col("doc_id"), col("n_words"),
        meanLen.as("mean_word_len"),
        uniFrac.as("top_unigram_char_frac"),
        biFrac.as("top_bigram_char_frac"),
        wordsOk.as("words_ok"), lenOk.as("word_len_ok"),
        uniOk.as("unigram_ok"), biOk.as("bigram_ok"),
        (wordsOk && lenOk && uniOk && biOk).as("keep"))
      .orderBy("doc_id")
  }

  val gopherRulesOracle: String =
    """WITH base AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS n_words,
      |    length(text) - (len(string_split(text, ' ')) - 1) AS word_chars
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), uni AS (
      |  SELECT doc_id, max(cnt * wl) AS top_uni_chars FROM (
      |    SELECT doc_id, word, count(*) AS cnt, length(word) AS wl
      |    FROM w GROUP BY doc_id, word) GROUP BY doc_id
      |), bg AS (
      |  SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bgram
      |  FROM documents
      |), bi AS (
      |  SELECT doc_id, max(cnt * (length(bgram) - 1)) AS top_bi_chars FROM (
      |    SELECT doc_id, bgram, count(*) AS cnt FROM bg GROUP BY doc_id, bgram)
      |  GROUP BY doc_id
      |)
      |SELECT b.doc_id, b.n_words,
      |  CAST(b.word_chars AS DOUBLE) / b.n_words AS mean_word_len,
      |  CAST(COALESCE(u.top_uni_chars, 0) AS DOUBLE) / b.word_chars AS top_unigram_char_frac,
      |  CAST(COALESCE(bi.top_bi_chars, 0) AS DOUBLE) / b.word_chars AS top_bigram_char_frac,
      |  b.n_words BETWEEN 50 AND 100000 AS words_ok,
      |  CAST(b.word_chars AS DOUBLE) / b.n_words BETWEEN 3.0 AND 10.0 AS word_len_ok,
      |  CAST(COALESCE(u.top_uni_chars, 0) AS DOUBLE) / b.word_chars <= 0.15 AS unigram_ok,
      |  CAST(COALESCE(bi.top_bi_chars, 0) AS DOUBLE) / b.word_chars <= 0.20 AS bigram_ok,
      |  (b.n_words BETWEEN 50 AND 100000)
      |    AND (CAST(b.word_chars AS DOUBLE) / b.n_words BETWEEN 3.0 AND 10.0)
      |    AND (CAST(COALESCE(u.top_uni_chars, 0) AS DOUBLE) / b.word_chars <= 0.15)
      |    AND (CAST(COALESCE(bi.top_bi_chars, 0) AS DOUBLE) / b.word_chars <= 0.20) AS keep
      |FROM base b
      |LEFT JOIN uni u ON u.doc_id = b.doc_id
      |LEFT JOIN bi ON bi.doc_id = b.doc_id
      |ORDER BY b.doc_id""".stripMargin

  /** Marker-word lists for the n-gram-free language-ID heuristic. Scores are
    * marker hit counts; prediction is the max score with alphabetical
    * tie-break, `und` when nothing matches. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "and", "of", "is", "to"),
    "es" -> Seq("el", "los", "las", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Reusable argmax-with-tie-break language prediction as a single Column
    * (shared by [[languageId]] and [[cleanPipeline]]); `und` when no marker
    * hits. */
  private[operators] val predLangCol: Column = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> sz(filter(words, w => w.isInCollection(markers)))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), elseCol) =>
      when(s === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Language identification via marker-word counting (a 1-gram heuristic;
    * the classic cheap lang-ID for pipeline bucketing). */
  def languageId(spark: SparkSession, dir: String): DataFrame = {
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> sz(filter(words, w => w.isInCollection(markers)))
    }
    val scoreCols = scores.map { case (lang, c) => c.as(s"score_$lang") }
    val df = table(spark, dir, "documents")
      .select(col("doc_id") +: scoreCols: _*)
    // argmax with alphabetical tie-break: first lang (in sorted order) whose
    // score equals the overall max; all-zero → 'und'.
    val maxScore = greatest(LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = LangMarkers.foldRight(lit("und")) { case ((lang, _), elseCol) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lit(lang)).otherwise(elseCol)
    }
    // foldRight gives de→en→es→fr priority = alphabetical, matching the oracle.
    df.withColumn("pred_lang", pred).orderBy("doc_id")
  }

  val languageIdOracle: String = {
    def listSql(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val scoreExprs = LangMarkers.map { case (lang, ms) =>
      s"len(list_filter(string_split(text, ' '), w -> w IN (${listSql(ms)}))) AS score_$lang"
    }.mkString(",\n  ")
    val langs = LangMarkers.map(_._1)
    val maxExpr = s"GREATEST(${langs.map(l => s"score_$l").mkString(", ")})"
    val caseArms = langs
      .map(l => s"WHEN score_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
      .mkString(" ")
    s"""SELECT doc_id, score_de, score_en, score_es, score_fr,
       |  CASE $caseArms ELSE 'und' END AS pred_lang
       |FROM (SELECT doc_id,
       |  $scoreExprs
       |FROM documents) s ORDER BY doc_id""".stripMargin
  }

  /** Lang-ID confusion matrix (round 9): [[languageId]]'s prediction
    * cross-tabulated against the labeled `lang` column — the
    * classifier-eval table that tells you WHERE the cheap 1-gram heuristic
    * is wrong (which label it mistakes for which) rather than just how
    * often. Composition over the langid projection + one
    * |langs|²-key aggregate. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val preds = languageId(spark, dir).select("doc_id", "pred_lang")
    table(spark, dir, "documents").select("doc_id", "lang")
      .join(preds, "doc_id")
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")
  }

  val langConfusionOracle: String =
    s"""WITH preds AS (
       |${languageIdOracle.linesIterator.map("  " + _).mkString("\n")}
       |)
       |SELECT d.lang, p.pred_lang, count(*) AS n_docs
       |FROM documents d JOIN preds p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin

  /** Document frequency: the corpus-level term table (how many docs and how
    * many total occurrences per word) — the integer-exact half of TF-IDF
    * (the IDF log transform is left to consumers: cross-engine `ln` is not
    * ulp-stable, counts are). Top-20 by document frequency. */
  def docFrequency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // top-20 via TakeOrderedAndProject FIRST (per-partition top-20 then a
    // 20-row merge — never a global sort), so the rank window below only
    // ever sees <= 20 rows regardless of vocabulary size. Ranking the full
    // word table with an ungrouped window (the round-2 form) would funnel
    // every distinct word through one task at corpus scale.
    val top = table(spark, dir, "documents")
      .select(col("doc_id"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(countDistinct(col("doc_id")).as("doc_freq"), count(lit(1)).as("total_freq"))
      .orderBy(col("doc_freq").desc, col("word"))
      .limit(20)
    val w = Window.orderBy(col("doc_freq").desc, col("word"))
    top
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .select("word", "doc_freq", "total_freq", "rnk")
      .orderBy("rnk")
  }

  val docFrequencyOracle: String =
    """SELECT word, doc_freq, total_freq, rnk FROM (
      |  SELECT word, count(DISTINCT doc_id) AS doc_freq, count(*) AS total_freq,
      |         row_number() OVER (ORDER BY count(DISTINCT doc_id) DESC, word) AS rnk
      |  FROM (SELECT doc_id, w.word FROM documents, unnest(string_split(text, ' ')) AS w(word)
      |        WHERE w.word != '')
      |  GROUP BY word) t
      |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** TF-IDF (integer-surrogate form): per (doc, term), the term frequency,
    * document frequency, and `score_micro = (tf · 10⁶ · N) div df` — a
    * monotone surrogate of tf · N/df in exact integer math, so ranking by
    * it IS ranking by unsmoothed tf-idf while staying oracle-exact (a
    * floating `ln(N/df)` would hang parity on libm rounding). Restricted to
    * terms with doc_freq ≥ 50 to bound output; two shuffles (doc-term tf,
    * term df) + a broadcast of the tiny df table — the classic scalable
    * TF-IDF shape.
    *
    * Overflow: the product `tf · 10⁶ · N` is computed in WIDE integers on
    * both engines (DECIMAL(38,0) in Spark, HUGEINT in DuckDB), so the
    * INTERMEDIATE can never wrap (the round-2 int64 form wrapped once
    * tf · N exceeded ~9.2·10¹², i.e. well inside the 10¹⁰-doc scale this
    * operator targets). The final quotient is int64 and exact while
    * `tf · 10⁶ · N / df < 2⁶³` — with df ≥ 50 that is tf · N < 4.6·10¹⁴,
    * comfortably beyond any real corpus; for unfiltered df=1 tails, keep
    * the result in decimal instead. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val docTerm = docs
      .select(col("doc_id"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
    val df = docTerm.groupBy("word")
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= 50)
    docTerm.join(broadcast(df), "word")
      .join(broadcast(n))
      .withColumn("score_micro",
        expr("(CAST(tf AS DECIMAL(38,0)) * 1000000 * n_docs) div doc_freq"))
      .select("doc_id", "word", "tf", "doc_freq", "score_micro")
      .orderBy("doc_id", "word")
  }

  val tfidfOracle: String =
    """WITH dt AS (
      |  SELECT doc_id, w.word, count(*) AS tf
      |  FROM documents, unnest(string_split(text, ' ')) AS w(word)
      |  WHERE w.word != ''
      |  GROUP BY doc_id, w.word
      |), df AS (
      |  SELECT word, count(*) AS doc_freq FROM dt GROUP BY word HAVING count(*) >= 50
      |), n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT dt.doc_id, dt.word, dt.tf, df.doc_freq,
      |  CAST((CAST(dt.tf AS HUGEINT) * 1000000 * n.n_docs) // df.doc_freq AS BIGINT) AS score_micro
      |FROM dt JOIN df ON dt.word = df.word CROSS JOIN n
      |ORDER BY dt.doc_id, dt.word""".stripMargin

  /** Normalized text for fingerprinting: lowercase, whitespace collapsed. */
  private val normText: Column =
    trim(regexp_replace(lower(col("text")), "\\s+", " "))

  /** Rolling polynomial hash (base 31, mod 1e9+7) over the characters of a
    * string column — pure integer math, stable across engines. Native
    * codegen'd expression; [[rollingHashHof]] is the built-ins-only twin it
    * is tested bit-equal against. */
  def rollingHash(c: Column): Column = graft.functions.VectorExpressions.rolling_hash(c)

  /** Built-ins-only rolling hash (interpreted HOF fold over `split`). */
  def rollingHashHof(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000007L)

  /** Document fingerprinting: md5 of normalized text + rolling hash —
    * the exact-dup key and a cheap locality-free signature. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents").select(
      col("doc_id"),
      md5(normText).as("fp_md5"),
      rollingHash(normText).as("fp_roll")
    ).orderBy("doc_id")

  val fingerprintsOracle: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(
      |        list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ''), c -> c != ''),
      |        c -> CAST(unicode(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
      |FROM documents ORDER BY doc_id""".stripMargin

  /** END-TO-END corpus cleaning in ONE pass + one shuffle — the composition
    * the individual operators exist for: every document gets its quality
    * gate, language prediction, and content hash in a single scan; the only
    * shuffle is the keep-first dedup's hash partition (rank window on the
    * 16-byte digest); survivors = quality-passing, language-identified,
    * first-of-their-hash. At 100 TB this shape is exactly the pre-training
    * filter job: per-row predicates cost a scan, dedup costs one shuffle of
    * (hash, doc_id) pairs, and everything stays in whole-stage codegen. */
  def cleanPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("h").orderBy("doc_id")
    table(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"),
        sz(words).as("n_tokens"),
        passesQualityCol.as("passes_quality"),
        predLangCol.as("pred_lang"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("passes_quality") && col("pred_lang") =!= "und")
      .select("doc_id", "pred_lang", "n_tokens")
      .orderBy("doc_id")
  }

  val cleanPipelineOracle: String = {
    val stopList = StopEn.map(s => s"'$s'").mkString(", ")
    def listSql(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")
    val scoreExprs = LangMarkers.map { case (lang, ms) =>
      s"len(list_filter(string_split(text, ' '), w -> w IN (${listSql(ms)}))) AS score_$lang"
    }.mkString(",\n    ")
    val langs = LangMarkers.map(_._1)
    val maxExpr = s"GREATEST(${langs.map(l => s"score_$l").mkString(", ")})"
    val caseArms = langs
      .map(l => s"WHEN score_$l = $maxExpr AND $maxExpr > 0 THEN '$l'")
      .mkString(" ")
    s"""WITH scored AS (
       |  SELECT doc_id, md5(text) AS h,
       |    len(string_split(text, ' ')) AS n_tokens,
       |    len(string_split(text, ' ')) >= 20 AND
       |      CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
       |        / len(string_split(text, ' ')) >= 0.02 AS passes_quality,
       |    $scoreExprs
       |  FROM documents
       |), flagged AS (
       |  SELECT doc_id, h, n_tokens, passes_quality,
       |    CASE $caseArms ELSE 'und' END AS pred_lang,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
       |  FROM scored
       |)
       |SELECT doc_id, pred_lang, n_tokens FROM flagged
       |WHERE rn = 1 AND passes_quality AND pred_lang != 'und'
       |ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ PII masking
  /** PII masking — the redaction pass every training corpus goes through
    * before release. The fixture text is synthetic lowercase prose with no
    * real PII, so each document is first DECORATED with a deterministic
    * synthetic email + phone derived from doc_id; the operator then masks
    * emails (first, so their digits can't half-match as phones) and phone
    * runs, and emits match counts plus an md5 of the redacted text — the
    * full masked string stays pinned without shipping a text column through
    * the comparison harness. Patterns are character-class-only so Java
    * regex and RE2 agree; one codegen'd projection, no shuffle, trivially
    * parallel at 100 TB. */
  // private[graft]: graft.streaming.StreamingPiiGuard applies the SAME
  // patterns at ingest time — one definition, no batch/stream drift
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PhoneRe = "\\+?[0-9][0-9-]{5,}[0-9]"

  def piiMask(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("raw"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).cast("bigint"))
      .withColumn("masked",
        regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("masked"), lit("<PHONE>"), lit(0))).cast("bigint"))
      .select(col("doc_id"), md5(col("masked")).as("masked_md5"),
        length(col("masked")).cast("bigint").as("masked_len"),
        col("n_emails"), col("n_phones"))
      .orderBy("doc_id")

  val piiMaskOracle: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or +1-555-'
      |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      |  FROM documents
      |), masked AS (
      |  SELECT doc_id, raw,
      |    regexp_replace(regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |                   '\+?[0-9][0-9-]{5,}[0-9]', '<PHONE>', 'g') AS m
      |  FROM raw
      |)
      |SELECT doc_id, md5(m) AS masked_md5,
      |  CAST(length(m) AS BIGINT) AS masked_len,
      |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(m, '<PHONE>')) AS BIGINT) AS n_phones
      |FROM masked ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- PII density rates
  /** PII DENSITY BY SOURCE (round 11) — the compliance rollup above
    * [[piiMask]]'s per-document redaction: per source, how many documents
    * carry any PII (exact integer ppm), split by kind, plus total match
    * volumes — the table that decides which sources need the expensive
    * NER-grade pass vs the cheap regex pass, and the per-release trend a
    * privacy owner tracks. The fixture prose is synthetic, so PII is
    * PLANTED selectively (every 3rd doc an email, every 5th a phone) —
    * rates land at ~333k/200k ppm by construction, so a broken regex or a
    * broken rollup both move the table.
    *
    * 100 TB shape: one codegen'd projection (the same char-class-only
    * Java∩RE2 regexes as [[piiMask]]) into a |sources|-row partial+final
    * aggregate — scan-bound, embarrassingly parallel, no shuffle beyond
    * the group-by. */
  def piiRates(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" reach user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call +1-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("raw"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("raw"), lit(EmailRe), lit(0))).cast("bigint"))
      .withColumn("n_phones",
        size(regexp_extract_all(
          regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
          lit(PhoneRe), lit(0))).cast("bigint"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") > 0, 1L).otherwise(0L)).as("docs_email"),
        sum(when(col("n_phones") > 0, 1L).otherwise(0L)).as("docs_phone"),
        sum(when(col("n_emails") > 0 || col("n_phones") > 0, 1L).otherwise(0L)).as("docs_any"),
        sum(col("n_emails")).as("emails_total"),
        sum(col("n_phones")).as("phones_total"))
      .withColumn("pii_ppm", expr("(docs_any * 1000000) div n_docs"))
      .select("source", "n_docs", "docs_email", "docs_phone", "docs_any",
        "pii_ppm", "emails_total", "phones_total")
      .orderBy("source")

  val piiRatesOracle: String =
    """WITH raw AS (
      |  SELECT doc_id, source,
      |    text
      |    || CASE WHEN doc_id % 3 = 0
      |            THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |            ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0
      |            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |            ELSE '' END AS raw
      |  FROM documents
      |), counted AS (
      |  SELECT source,
      |    CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |    CAST(len(regexp_extract_all(
      |      regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9-]{5,}[0-9]')) AS BIGINT) AS n_phones
      |  FROM raw
      |)
      |SELECT source,
      |  count(*) AS n_docs,
      |  CAST(sum(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_email,
      |  CAST(sum(CASE WHEN n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_phone,
      |  CAST(sum(CASE WHEN n_emails > 0 OR n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_any,
      |  CAST((sum(CASE WHEN n_emails > 0 OR n_phones > 0 THEN 1 ELSE 0 END) * 1000000)
      |       // count(*) AS BIGINT) AS pii_ppm,
      |  CAST(sum(n_emails) AS BIGINT) AS emails_total,
      |  CAST(sum(n_phones) AS BIGINT) AS phones_total
      |FROM counted GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------- deterministic hash sampling
  /** WELL-MIXED deterministic bucket hash: the polynomial fold applied to
    * the MD5 HEX of (prefix ‖ doc_id), not to the raw key. The plain fold
    * maps arithmetic-progression ids (every per-source/per-stratum id set
    * in the fixtures) to clustered residues — measured: the 'en' stratum
    * sampled at 40% against a 20% target, a mixture source took 9/25 docs
    * at a 0.69 target. MD5 scrambles first; the fold then just compresses
    * 32 well-mixed hex chars into one integer. Every SELECTION or ORDERING
    * decision below routes through this; the plain [[rollingHash]] remains
    * for fingerprinting, where dispersion quality is irrelevant. */
  private[operators] def mixedHash(prefix: String): Column =
    mixedHashOf(prefix, col("doc_id"))

  /** [[mixedHash]] over an arbitrary key expression — the shard-write
    * content hash folds (doc_id ‖ pos ‖ offset ‖ text) through the same
    * md5-then-fold mix. */
  private[graft] def mixedHashOf(prefix: String, key: Column): Column =
    rollingHash(md5(concat(lit(prefix), key.cast("string"))))

  /** DuckDB twin of [[mixedHash]]. */
  private[operators] def mixedHashSql(prefix: String, idExpr: String = "doc_id"): String =
    s"""list_reduce(
       |      list_prepend(CAST(0 AS BIGINT),
       |        list_transform(
       |          list_filter(string_split(md5('$prefix' || CAST($idExpr AS VARCHAR)), ''), c -> c != ''),
       |          c -> CAST(unicode(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  /** Stratified sampling by content-independent hash — reproducible
    * downsampling for eval splits and ablations. The keep decision is
    * `mixedHash('smp|') % 1000 < rate(lang)` (en kept at 20%, every other
    * stratum at 10%): a pure per-row predicate, so the SAME sample falls
    * out at any partitioning, cluster size, or rerun — unlike `df.sample`,
    * whose output depends on partition layout. At 100 TB this is a filter
    * pushed into the scan; no shuffle, no state. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("bucket", mixedHash("smp|") % 1000)
      .filter(col("bucket") < when(col("lang") === "en", 200L).otherwise(100L))
      .select(col("doc_id"), col("lang"), col("bucket").cast("bigint").as("bucket"))
      .orderBy("doc_id")

  val stratifiedSampleOracle: String =
    s"""WITH hashed AS (
      |  SELECT doc_id, lang,
      |    ${mixedHashSql("smp|").linesIterator.mkString("\n|    ")} % 1000 AS bucket
      |  FROM documents
      |)
      |SELECT doc_id, lang, bucket FROM hashed
      |WHERE bucket < CASE WHEN lang = 'en' THEN 200 ELSE 100 END
      |ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- character n-gram LM
  /** Per-language character-bigram table, top 10 per language — the
    * sufficient statistic of a character-level n-gram language model (the
    * classic language-ID / gibberish-detection feature at corpus scale).
    * Shape: one explode of length-1 positions per doc (rows ≈ total corpus
    * chars), one (lang, bigram) group-by — partial aggregation absorbs the
    * explosion map-side, and the rank window sees only the ≤|Σ|² distinct
    * bigrams per language, never the corpus. */
  def charBigrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("bigram"))
    table(spark, dir, "documents")
      .select(col("lang"), col("text"))
      // ≥2 chars: Spark's sequence(1, len-1) runs DESCENDING for len<2
      // (step is inferred), where DuckDB's generate_series returns empty
      .filter(length(col("text")) >= 2)
      // r16: one codepoint split + row-local pair concat instead of an
      // explode carrying `text` with substring(text, i, 2) per position —
      // substring scans i codepoints to find its start, making the loop
      // O(len²) per doc, and the Generate carried the whole text per row.
      // Java's zero-width regex split advances per CODE POINT, so
      // split(text, '') yields codepoint chars and cs[i]||cs[i+1] is
      // exactly substring(text, i+1, 2) for any unicode input
      // (probe-verified equal bigram counts on the fixture).
      .select(col("lang"), split(col("text"), "").as("cs"))
      .select(col("lang"), explode(expr(
        "transform(sequence(0, size(cs) - 2), i -> concat(cs[i], cs[i + 1]))")).as("bigram"))
      .groupBy("lang", "bigram").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= 10)
      .select("lang", "rank", "bigram", "cnt")
      .orderBy("lang", "rank")
  }

  val charBigramsOracle: String =
    """WITH expanded AS (
      |  SELECT lang, substring(text, CAST(i AS INTEGER), 2) AS bigram
      |  FROM (
      |    SELECT lang, text, unnest(generate_series(1, length(text) - 1)) AS i
      |    FROM documents WHERE length(text) >= 2)
      |), counts AS (
      |  SELECT lang, bigram, count(*) AS cnt FROM expanded GROUP BY lang, bigram
      |), ranked AS (
      |  SELECT lang, bigram, cnt,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, bigram) AS BIGINT) AS rank
      |  FROM counts
      |)
      |SELECT lang, rank, bigram, cnt FROM ranked WHERE rank <= 10
      |ORDER BY lang, rank""".stripMargin

  // -------------------------------------------------------- decontamination
  /** Benchmark DECONTAMINATION: flag training documents sharing any word
    * 5-gram with an evaluation set — the overlap filter every serious
    * pretraining pipeline runs (an eval question leaked into training data
    * invalidates the benchmark). Over [[Dedup.corpusWithNearDups]]: the
    * synthetic eval set is every 97th PERTURBED copy (doc_id ≥ 10⁶), whose
    * original is thereby a planted contamination — exactly the "the
    * benchmark paraphrases a training doc" case n-gram overlap must catch.
    *
    * 100 TB shape: eval sets are benchmark-sized (thousands of docs), so
    * their distinct n-gram table is TINY next to the corpus — it becomes
    * the broadcast side of an inner join against the corpus's exploded
    * n-grams; the corpus pays one scan + map-side explode, and only
    * matching (doc, gram) rows reach the one group-by shuffle. Nothing is
    * ever joined corpus × corpus. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = {
      val ws = split(col("text"), " ")
      df.filter(size(ws) >= 5)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(ws) - 4),
            i => concat_ws(" ", (0 until 5).map(o => element_at(ws, i + o)): _*))).as("gram"))
    }
    val corpus = Dedup.corpusWithNearDups(spark, dir)
    val evalGrams = grams(corpus.filter(col("doc_id") >= Dedup.IdOffset && col("doc_id") % 97 === 0))
      .select("gram").distinct()
    grams(corpus.filter(col("doc_id") < Dedup.IdOffset))
      .join(broadcast(evalGrams), "gram")
      .groupBy("doc_id")
      .agg(countDistinct(col("gram")).as("n_shared_grams"))
      .select(col("doc_id"), col("n_shared_grams"))
      .orderBy("doc_id")
  }

  /** Version-stable DuckDB 5-gram expression: explicit `list_extract`
    * indexing over a pre-split `ws` column, mirroring the Spark
    * `element_at(ws, i + o)` construction exactly. List SLICING
    * (`ws[i:i+4]`) is deliberately avoided everywhere — its bound
    * semantics are DuckDB-version-sensitive (inclusive vs exclusive upper
    * bound changed across releases), which made two driver-gate oracles
    * diverge from the same SQL run on a local DuckDB. */
  private val oracleGramExpr: String =
    (0 until 5).map(o => s"list_extract(ws, i + $o)").mkString(" || ' ' || ")

  /** The matching grams-CTE body: split once in a subquery, index
    * explicitly in the lambda. */
  private def oracleGramsSql(from: String): String =
    s"""SELECT doc_id, unnest(list_transform(
       |    generate_series(1, len(ws) - 4),
       |    i -> $oracleGramExpr)) AS gram
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $from)
       |  WHERE len(ws) >= 5""".stripMargin

  val decontaminateOracle: String =
    s"""WITH corpus AS (
      |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
      |), grams AS (
      |  ${oracleGramsSql("corpus").linesIterator.mkString("\n|  ")}
      |), eval_grams AS (
      |  SELECT DISTINCT gram FROM grams WHERE doc_id >= ${Dedup.IdOffset} AND doc_id % 97 = 0
      |)
      |SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams
      |FROM grams g JOIN eval_grams e USING (gram)
      |WHERE g.doc_id < ${Dedup.IdOffset}
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------------- eval-side burn report
  /** EVAL-SIDE BURN REPORT (round 11) — [[decontaminate]] answers the data
    * owner's question (which TRAINING docs to drop); this is the eval
    * owner's view of the same overlap: per benchmark item, how burned is
    * it — how many training docs share a word 5-gram with it, how many of
    * its own grams leaked, and how many distinct sources carry the leak
    * (one source = a takedown fixes it; many = the item is public text and
    * the benchmark needs a replacement). Items with zero overlap still get
    * their row (left join from the eval spine) — the table doubles as the
    * "still-clean items" list.
    *
    * 100 TB shape: the eval side is benchmark-sized, so its distinct
    * (item, gram) table BROADCASTS against the corpus's exploded grams —
    * the same one-scan posture as [[decontaminate]]; only matching rows
    * reach the source join and the per-item multi-distinct aggregate,
    * whose Expand replicates (id, id, gram, source) rows bounded by the
    * leak volume, never the corpus. */
  def evalBurn(spark: SparkSession, dir: String): DataFrame = {
    def grams(df: DataFrame): DataFrame = {
      val ws = split(col("text"), " ")
      df.filter(size(ws) >= 5)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(ws) - 4),
            i => concat_ws(" ", (0 until 5).map(o => element_at(ws, i + o)): _*))).as("gram"))
    }
    val corpus = Dedup.corpusWithNearDups(spark, dir)
    val isEval = col("doc_id") >= Dedup.IdOffset && col("doc_id") % 97 === 0
    val evalDocs = corpus.filter(isEval)
    val evalGrams = grams(evalDocs)
      .select(col("doc_id").as("eval_id"), col("gram")).distinct()
    val trainGrams = grams(corpus.filter(col("doc_id") < Dedup.IdOffset))
      .select(col("doc_id").as("train_id"), col("gram")).distinct()
    val src = table(spark, dir, "documents")
      .select(col("doc_id").as("train_id"), col("source"))
    val hits = broadcast(evalGrams).join(trainGrams, "gram")
      .join(src, "train_id")
      .groupBy("eval_id")
      .agg(
        countDistinct(col("train_id")).as("n_train_docs"),
        countDistinct(col("gram")).as("n_shared_grams"),
        countDistinct(col("source")).as("n_sources"))
    evalDocs.select(col("doc_id").as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
        coalesce(col("n_sources"), lit(0L)).as("n_sources"))
      .orderBy("eval_id")
  }

  def evalBurnOracle: String =
    s"""WITH corpus AS (
       |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
       |), grams AS (
       |  ${oracleGramsSql("corpus").linesIterator.mkString("\n|  ")}
       |), eval_grams AS (
       |  SELECT DISTINCT doc_id AS eval_id, gram FROM grams
       |  WHERE doc_id >= ${Dedup.IdOffset} AND doc_id % 97 = 0
       |), train_grams AS (
       |  SELECT DISTINCT doc_id AS train_id, gram FROM grams
       |  WHERE doc_id < ${Dedup.IdOffset}
       |), src AS (
       |  SELECT doc_id AS train_id, source FROM documents
       |), hits AS (
       |  SELECT e.eval_id,
       |    count(DISTINCT t.train_id) AS n_train_docs,
       |    count(DISTINCT e.gram) AS n_shared_grams,
       |    count(DISTINCT s.source) AS n_sources
       |  FROM eval_grams e
       |  JOIN train_grams t USING (gram)
       |  JOIN src s USING (train_id)
       |  GROUP BY e.eval_id
       |), spine AS (
       |  SELECT doc_id AS eval_id FROM corpus
       |  WHERE doc_id >= ${Dedup.IdOffset} AND doc_id % 97 = 0
       |)
       |SELECT s.eval_id,
       |  CAST(coalesce(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
       |  CAST(coalesce(h.n_shared_grams, 0) AS BIGINT) AS n_shared_grams,
       |  CAST(coalesce(h.n_sources, 0) AS BIGINT) AS n_sources
       |FROM spine s LEFT JOIN hits h USING (eval_id)
       |ORDER BY s.eval_id""".stripMargin

  // ------------------------------------- substring-level decontamination
  /** SUBSTRING contamination screen — the word-5-gram overlap
    * ([[decontaminate]]) misses leaks that cross token boundaries oddly
    * (markup stripped differently, punctuation re-spaced); the standard
    * second screen is VERBATIM CHARACTER WINDOWS: a fixed-length snippet
    * from each eval doc, flagged wherever it appears verbatim in a
    * training doc. Snippets here are the 60 chars at offset 21 of each
    * eval doc (≥80 chars) — inside the fixture's perturbation (the eval
    * copies drop only the first word), so every planted original must be
    * caught (recall-spec'd).
    *
    * 100 TB shape: eval snippets are benchmark-sized (|eval docs|/97 — a
    * driver-bounded set like every benchmark suite, NOT corpus-bound), so
    * they collect once and compile into ONE Aho-Corasick automaton
    * ([[graft.functions.MultiLiteral.MultiLiteralCount]]) shipped with the
    * expression: the corpus pays a single O(chars + matches) pass per row,
    * INDEPENDENT of the snippet count — at 10⁴–10⁵ snippets the old
    * per-row `filter(snips, contains)` loop is a 10⁴× blowup, the
    * automaton is flat (ScaleProbe `substring_screen_snips` pins the
    * exponent). Row-local, no join at all. */
  def substringContamination(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Dedup.corpusWithNearDups(spark, dir)
    val snips: Seq[String] = corpus
      .filter(col("doc_id") >= Dedup.IdOffset && col("doc_id") % 97 === 0 &&
        length(col("text")) >= 80)
      .select(substring(col("text"), 21, 60).as("snippet")).distinct()
      .orderBy("snippet").collect().map(_.getString(0)).toSeq
    corpus.filter(col("doc_id") < Dedup.IdOffset)
      .select(col("doc_id"),
        graft.functions.MultiLiteral.multi_literal_count(col("text"), snips)
          .cast("bigint").as("n_matched_snippets"))
      .filter(col("n_matched_snippets") > 0L)
      .orderBy("doc_id")
  }

  val substringContaminationOracle: String =
    s"""WITH corpus AS (
       |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
       |), snips AS (
       |  SELECT DISTINCT substring(text, 21, 60) AS snippet FROM corpus
       |  WHERE doc_id >= ${Dedup.IdOffset} AND doc_id % 97 = 0 AND length(text) >= 80
       |)
       |SELECT c.doc_id, count(*) AS n_matched_snippets
       |FROM corpus c JOIN snips s ON contains(c.text, s.snippet)
       |WHERE c.doc_id < ${Dedup.IdOffset}
       |GROUP BY c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  // ------------------------------------------------------- repetition ratio
  /** Intra-document REPETITION: fraction of duplicated word 3-grams per doc
    * (Gopher/RefinedWeb-style quality rule — machine-generated and spammy
    * text repeats itself; high-rep docs get filtered or down-weighted
    * before training). Pure per-row projection over one scan: no shuffle,
    * no join, fully codegen'd — the cheapest possible corpus pass at any
    * scale.
    *
    * Grams are keyed by HASH, not by string, and the whole
    * split → word-hash → window-fold → distinct-count loop runs inside ONE
    * codegen'd native expression
    * ([[graft.functions.VectorExpressions.TrigramDistinctCount]]) —
    * O(chars) per doc, zero array materialization. A declarative HOF form
    * was tried first and is a trap worth recording: referencing the
    * word-hash array inside the key lambda re-evaluates it once PER GRAM
    * (O(words²), 14 s at sf0.1), and even the careful single-reference
    * version re-materializes interpreted arrays per row. The native pass
    * runs in ~1 s. The SAME key fold runs in the DuckDB oracle, so hash
    * collisions (~2⁻³⁰/pair, within-doc) are IDENTICAL cross-engine and
    * the gate stays exact. Ratio is one double division of two integers. */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    table(spark, dir, "documents")
      .filter(size(ws) >= 3)
      .select(
        col("doc_id"),
        (size(ws) - 2).cast("bigint").as("n_grams"),
        graft.functions.VectorExpressions.trigram_distinct(col("text")).as("n_distinct"))
      .withColumn("rep_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
      .orderBy("doc_id")
  }

  val repetitionRatioOracle: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    list_transform(string_split(text, ' '),
      |      w -> list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(list_filter(string_split(w, ''), c -> c != ''),
      |            c -> CAST(unicode(c) AS BIGINT))),
      |        (a, b) -> (a * 31 + b) % 1000000007)) AS wh
      |  FROM documents WHERE len(string_split(text, ' ')) >= 3
      |), k AS (
      |  SELECT doc_id, len(wh) - 2 AS n_grams,
      |    list_transform(generate_series(1, len(wh) - 2),
      |      i -> (((wh[i] * 131 + wh[i+1]) % 1000000007) * 131 + wh[i+2]) % 1000000007) AS keys
      |  FROM h
      |)
      |SELECT doc_id,
      |  n_grams,
      |  len(list_distinct(keys)) AS n_distinct,
      |  CAST(n_grams - len(list_distinct(keys)) AS DOUBLE) / n_grams AS rep_ratio
      |FROM k ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- sequence packing
  /** SEQUENCE PACKING for training: concatenate each language's documents
    * in doc_id order and split the token stream into fixed 2048-token
    * windows — the standard "pack then chunk" step that turns a ragged
    * corpus into dense training sequences (documents straddle window
    * boundaries by design; the attention mask handles the seams).
    *
    * Distribution: the running offset is a window-function cumsum
    * PARTITIONED BY lang — each language's stream packs independently, so
    * the sort is per-partition, never global. At 100 TB the partition key
    * is (lang, shard) and the same plan holds; what must NOT happen is a
    * single unpartitioned cumsum over the corpus. Output: each doc's window
    * id and offset — the shuffle-free recipe for the actual byte packing. */
  def packSequences(spark: SparkSession, dir: String, window: Int = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("bigint").as("tokens"))
      .withColumn("stream_end", sum(col("tokens")).over(w))
      .withColumn("stream_offset", col("stream_end") - col("tokens"))
      .withColumn("window_id", expr(s"stream_offset div $window"))
      .select("doc_id", "lang", "tokens", "stream_offset", "window_id")
      .orderBy("doc_id")
  }

  val packSequencesOracle: String =
    """SELECT doc_id, lang, tokens,
      |  CAST(sum(tokens) OVER w - tokens AS BIGINT) AS stream_offset,
      |  CAST((sum(tokens) OVER w - tokens) // 2048 AS BIGINT) AS window_id
      |FROM (
      |  SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens FROM documents
      |)
      |WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- packing-length sweep
  /** SEQUENCE-LENGTH SWEEP (round 11) — the max-seq-len knob table behind
    * [[packSequences]]: per candidate window length L ∈ {512 … 8192}, what
    * the pack-then-chunk regime costs — window count (GPU-step budget),
    * tail padding (the only pad this regime pays, one partial window per
    * language stream), and the SEAM damage: documents whose token span
    * straddles a window boundary (their attention is severed mid-doc) and
    * the token volume inside those documents. Larger L → fewer, cleaner
    * sequences but quadratic attention cost; this table is what a data
    * owner reads to pick L.
    *
    * 100 TB shape: ONE corpus scan projected to (8 B id, lang, 2 longs)
    * before the ×|L| explode, so the explode replicates narrow rows, never
    * text, and partial-aggregates map-side into |L| groups; the per-lang
    * cumsum is [[packSequences]]' partition-local sort (key (lang, shard)
    * at scale — never a global sort); the stream-total branch is a
    * |langs|-row frame crossed with the |L|-row spine. All columns exact
    * integers — `(a + L − 1) div L` ceilings, no floats anywhere. */
  def packingSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = Seq(512L, 1024L, 2048L, 4096L, 8192L)
    val spine = explode(array(lens.map(lit): _*))
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), sz(words).as("tokens"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seams = toks
      .withColumn("stream_offset", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("window_len", spine)
      .withColumn("straddles", expr(
        "(stream_offset div window_len) != ((stream_offset + tokens - 1) div window_len)"))
      .groupBy("window_len")
      .agg(
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_docs_straddle"),
        sum(when(col("straddles"), col("tokens")).otherwise(0L)).as("straddle_tokens"))
    val windows = toks.groupBy("lang").agg(sum("tokens").as("stream_tokens"))
      .withColumn("window_len", spine)
      .withColumn("n_win", expr("(stream_tokens + window_len - 1) div window_len"))
      .groupBy("window_len")
      .agg(
        sum(col("n_win")).as("n_windows"),
        sum(expr("n_win * window_len - stream_tokens")).as("tail_pad_tokens"))
    windows.join(seams, "window_len")
      .select("window_len", "n_windows", "tail_pad_tokens",
        "n_docs_straddle", "straddle_tokens")
      .orderBy("window_len")
  }

  val packingSweepOracle: String =
    """WITH docs AS (
      |  SELECT doc_id, lang,
      |    CAST(tokens AS BIGINT) AS tokens,
      |    CAST(sum(tokens) OVER w - tokens AS BIGINT) AS stream_offset
      |  FROM (SELECT doc_id, lang, len(string_split(text, ' ')) AS tokens FROM documents)
      |  WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |), lens AS (
      |  SELECT CAST(unnest([512, 1024, 2048, 4096, 8192]) AS BIGINT) AS window_len
      |), seams AS (
      |  SELECT l.window_len,
      |    CAST(sum(CASE WHEN (d.stream_offset // l.window_len)
      |                     != ((d.stream_offset + d.tokens - 1) // l.window_len)
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_straddle,
      |    CAST(sum(CASE WHEN (d.stream_offset // l.window_len)
      |                     != ((d.stream_offset + d.tokens - 1) // l.window_len)
      |             THEN d.tokens ELSE 0 END) AS BIGINT) AS straddle_tokens
      |  FROM docs d CROSS JOIN lens l GROUP BY l.window_len
      |), streams AS (
      |  SELECT lang, CAST(sum(tokens) AS BIGINT) AS stream_tokens FROM docs GROUP BY lang
      |), wins AS (
      |  SELECT l.window_len,
      |    CAST(sum((s.stream_tokens + l.window_len - 1) // l.window_len) AS BIGINT) AS n_windows,
      |    CAST(sum(((s.stream_tokens + l.window_len - 1) // l.window_len) * l.window_len
      |             - s.stream_tokens) AS BIGINT) AS tail_pad_tokens
      |  FROM streams s CROSS JOIN lens l GROUP BY l.window_len
      |)
      |SELECT w.window_len, w.n_windows, w.tail_pad_tokens,
      |  s.n_docs_straddle, s.straddle_tokens
      |FROM wins w JOIN seams s USING (window_len)
      |ORDER BY w.window_len""".stripMargin

  // ------------------------------------------------------ repeated spans
  /** CROSS-DOCUMENT repeated-span detection — the diagnostic behind exact
    * substring deduplication (Lee et al. 2022, arXiv:2107.06499: training
    * corpora are riddled with verbatim repeated passages; dedup improves
    * the model). For every doc: how many of its distinct word 5-gram spans
    * also appear in ANOTHER doc, and what fraction of the doc that is.
    * Over [[Dedup.corpusWithNearDups]], where each planted near-dup shares
    * almost all spans with its source.
    *
    * 100 TB shape: spans are keyed by md5 (16 B) so the two shuffles — the
    * distinct-(doc, span) group and the span-frequency group — move hashes,
    * never span text; the frequency table joins back by hash equi-join.
    * This is the MapReduce factorization of the paper's suffix array: same
    * duplicated-span set, no global suffix sort. */
  /** Distinct (doc_id, md5-of-5-gram) span table — DERIVED per use (one
    * scan + codegen'd split/explode; the arrays are the corpus over again,
    * so checkpointing them costs more than the scan they save — the same
    * trade [[Dedup.sharedSignatures]] documents for shingle sets). */
  private def spanTable(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    // row-local distinct BEFORE the explode: a doc's duplicate 5-grams
    // dedup inside array_distinct, so every emitted (doc_id, g) row is
    // already unique and the former global .distinct() — a full shuffle +
    // two HashAggregates over the span family's largest intermediate — is
    // gone (guide §2.4; the [[Dedup.shingleSets]]/rankedShingleToks shape)
    Dedup.corpusWithNearDups(spark, dir)
      .filter(size(ws) >= 5)
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), size(ws) - 4),
          i => md5(concat_ws(" ", (0 until 5).map(o => element_at(ws, i + o)): _*))))).as("g"))
  }

  /** The distinct (doc, 5-gram-hash) SPAN TABLE, materialized once per
    * (session, dir): three gated consumers (dup spans, span mask's dup
    * join, novelty) re-derive from it, and [[ngramNovelty]] alone would
    * otherwise run the explode+distinct TWICE (both sides of its
    * first-owner self-join — measured 4.0 s instead of ~1.5 s at sf0.1).
    * ~25 B/row (id + 16 B hash), no text. At 100 TB this is the span
    * family's one corpus-token-scale artifact — the materialized
    * intermediate exact-substring dedup keeps anyway (Lee et al.'s
    * pipelines persist far larger suffix structures) — built on the
    * [[buildSpanStage]] bench line like the dedup pair graph. */
  private[operators] def sharedSpanTable(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "span5grams")(spanTable(spark, dir))

  /** The DUPLICATED-gram set — 5-grams appearing in ≥2 docs — materialized
    * once per (session, dir): the expensive gram-frequency aggregate that
    * both [[dupSpans]] and [[spanMask]] consume (16 B hashes only, a
    * fraction of the distinct-gram table). */
  private[operators] def sharedDupGrams(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "dup5grams") {
      sharedSpanTable(spark, dir)
        .groupBy("g").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .select("g")
    }

  /** Materializes the span family's shared stage and reports
    * (n_span_docs, n_dup_grams) — named to sort BEFORE text_dup_spans and
    * text_span_mask in the bench so the one-time gram-frequency build
    * lands on THIS line and each consumer times only its own work (the
    * dedup_build_pipeline pattern). */
  def buildSpanStage(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    Dedup.corpusWithNearDups(spark, dir).filter(size(ws) >= 5)
      .agg(count(lit(1)).as("n_span_docs"))
      .crossJoin(sharedDupGrams(spark, dir).agg(count(lit(1)).as("n_dup_grams")))
  }

  val buildSpanStageOracle: String =
    s"""WITH corpus AS (
      |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
      |), spans AS (
      |  SELECT DISTINCT doc_id, md5(gram) AS g FROM (
      |    ${oracleGramsSql("corpus").linesIterator.mkString("\n|    ")})
      |)
      |SELECT
      |  (SELECT count(*) FROM corpus WHERE len(string_split(text, ' ')) >= 5) AS n_span_docs,
      |  (SELECT count(*) FROM (SELECT g FROM spans GROUP BY g HAVING count(*) >= 2) d) AS n_dup_grams""".stripMargin

  private def dupSpansFrom(spans: DataFrame, dupGrams: DataFrame): DataFrame =
    spans
      .join(dupGrams.withColumn("dup", lit(1L)), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"))
      .withColumn("dup_frac", col("n_dup").cast("double") / col("n_spans"))
      .select("doc_id", "n_spans", "n_dup", "dup_frac")
      .orderBy("doc_id")

  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansFrom(sharedSpanTable(spark, dir), sharedDupGrams(spark, dir))

  /** Un-memoized twin of [[dupSpans]] for plan audits: the gated form
    * reads materialized (checkpoint-scan) stages, which would make the
    * shuffle/aggregate assertions vacuous. */
  private[graft] def dupSpansPlan(spark: SparkSession, dir: String): DataFrame = {
    val spans = spanTable(spark, dir)
    dupSpansFrom(spans,
      spans.groupBy("g").agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 2).select("g"))
  }

  val dupSpansOracle: String =
    s"""WITH corpus AS (
      |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
      |), spans AS (
      |  SELECT DISTINCT doc_id, md5(gram) AS g FROM (
      |    ${oracleGramsSql("corpus").linesIterator.mkString("\n|    ")})
      |), freq AS (
      |  SELECT g, count(*) AS n_docs FROM spans GROUP BY g
      |)
      |SELECT s.doc_id, count(*) AS n_spans,
      |  CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
      |FROM spans s JOIN freq f USING (g)
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------------- paragraph-level dedup
  /** PARAGRAPH-GRANULARITY DEDUP (RefinedWeb / Penedo et al. 2023 §3.3
    * dedup unit; MassiveText's repetition cuts work at the same grain) —
    * between doc-level exact/near dedup and [[dupSpans]]' 5-gram spans:
    * segment each document into paragraphs, fingerprint each paragraph,
    * and report per doc how much of it is boilerplate shared with OTHER
    * documents, plus the keep/cut manifest row (cut when more than half
    * the paragraphs are cross-doc duplicates). The fixture corpus carries
    * no explicit separators, so the segmenter is the deterministic
    * [[ParaWords]]-word block (full blocks only — a trailing fragment is
    * not a paragraph); a newline split is the same MapReduce shape with a
    * different one-expression segmenter.
    *
    * 100 TB shape: segmentation and fingerprinting are row-local
    * expressions (no explode of text past the 16 B md5 per block); the
    * duplicate screen is ONE shuffle keyed on the block hash (distinct-doc
    * count over hash-sized rows), one keyed join back, one per-doc
    * aggregate. Full text never crosses the wire — the [[Dedup]] funnel
    * discipline. Alignment caveat (spec-pinned): a boilerplate block
    * shifted off the W-word grid is NOT matched — the shingled
    * [[dupSpans]] path is the shift-robust complement. */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    sharedParagraphVerdicts(spark, dir).orderBy("doc_id")

  /** The per-doc paragraph verdict, MATERIALIZED once per (session, dir):
    * round 15 wires the keep/cut verdict into [[trainingManifest]] as keep
    * gate #5, so the gated `text_paragraph_dedup` row and the manifest
    * family read ONE build instead of re-segmenting the corpus each
    * (VERDICT r14 #4). Tiny: five ints per doc. */
  private[operators] def sharedParagraphVerdicts(spark: SparkSession,
      dir: String): DataFrame =
    StageMemo(spark, dir, "para_dedup")(paragraphDedupPlan(spark, dir))

  /** Un-memoized twin for plan audits, and the single-segmentation form
    * (VERDICT r14 #4: the r14 shape fed one `paras` projection into BOTH
    * the hash-frequency aggregate and the join-back, so the transform/
    * slice/md5 projection over every document ran in two jobs). Here the
    * corpus segments ONCE: per-(phash, doc_id) instance counts first (the
    * only aggregate that touches exploded rows), then the cross-doc
    * screen as a count over the phash partition of that GROUPED frame —
    * grouped rows are bounded by docs-containing-the-hash, so the window
    * is per-key work, never a per-language/global sort. */
  private[graft] def paragraphDedupPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val paras = table(spark, dir, "documents")
      .filter(size(words) >= ParaWords)
      .selectExpr("doc_id",
        s"""explode(transform(sequence(0, CAST(size(split(text, ' ')) / $ParaWords AS INT) - 1),
           |  i -> md5(array_join(slice(split(text, ' '), i * $ParaWords + 1, $ParaWords), ' '))))
           |  AS phash"""
          .stripMargin.replace("\n", ""))
    paras.groupBy("phash", "doc_id").agg(count(lit(1)).as("k"))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("phash")))
      .groupBy("doc_id")
      .agg(sum("k").as("n_paras"),
        sum(when(col("n_docs") >= 2, col("k")).otherwise(0L)).as("n_dup_paras"))
      .withColumn("dup_micro",
        expr("(CAST(n_dup_paras AS DECIMAL(38,0)) * 1000000) div n_paras"))
      .withColumn("keep", col("dup_micro") <= 500000L)
      .select("doc_id", "n_paras", "n_dup_paras", "dup_micro", "keep")
  }

  /** Paragraph block width (words). */
  private[operators] val ParaWords = 8

  val paragraphDedupOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
       |), paras AS (
       |  SELECT doc_id,
       |    md5(array_to_string(ts[(i * $ParaWords + 1):(i * $ParaWords + $ParaWords)], ' ')) AS phash
       |  FROM (SELECT doc_id, ts, unnest(range(0, len(ts) // $ParaWords)) AS i FROM d)
       |), freq AS (
       |  SELECT phash, count(DISTINCT doc_id) AS n_docs FROM paras GROUP BY phash
       |), per AS (
       |  SELECT p.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_paras,
       |    CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras
       |  FROM paras p JOIN freq f USING (phash)
       |  GROUP BY p.doc_id
       |)
       |SELECT doc_id, n_paras, n_dup_paras,
       |  CAST((CAST(n_dup_paras AS HUGEINT) * 1000000) // n_paras AS BIGINT) AS dup_micro,
       |  (CAST(n_dup_paras AS HUGEINT) * 1000000) // n_paras <= 500000 AS keep
       |FROM per ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------- span masking
  /** POSITIONAL mask for exact substring dedup — the step after
    * [[dupSpans]] detection: for each doc, how many token POSITIONS are
    * covered by some cross-document duplicated 5-gram (those are the
    * tokens Lee et al.'s dedup would cut), and the fraction that survives.
    * A planted suffix copy is fully covered (keep_frac 0); its source
    * keeps at most its first token (the only one a unique leading span can
    * protect) — both pinned in the spec.
    *
    * 100 TB shape: same md5-keyed shuffles as [[dupSpans]] plus one
    * explode of dup-span positions — per-doc bounded (≤5× tokens), and
    * the positional distinct aggregates partial+final per doc_id. */
  def spanMask(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val corpus = Dedup.corpusWithNearDups(spark, dir).filter(size(ws) >= 5)
    val spansPos = corpus
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(1), size(ws) - 4),
          i => md5(concat_ws(" ", (0 until 5).map(o => element_at(ws, i + o)): _*)))))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("pos"), col("col").as("g"))
    // covered positions = union length of the dup spans' [p, p+4] intervals:
    // an O(spans)-per-doc fold over the SORTED span starts, with the
    // (count, last_covered) accumulator packed into one BIGINT (count·10⁶ +
    // last) so the fold is pure integer math on both engines. The rejected
    // alternative — explode all 5 positions per span, distinct, count —
    // multiplies the dup-span rows 5× through an extra shuffle.
    val covered = spansPos.join(sharedDupGrams(spark, dir), "g")
      .groupBy("doc_id").agg(array_sort(collect_list(col("pos"))).as("ps"))
      .select(col("doc_id"), expr(
        """aggregate(ps, CAST(0 AS BIGINT),
          |  (a, p) -> ((a div 1000000) + greatest(CAST(0 AS BIGINT), p + 4 - greatest(a % 1000000, p - 1))) * 1000000
          |            + greatest(a % 1000000, p + 4),
          |  a -> a div 1000000)""".stripMargin).as("n_covered"))
    corpus.select(col("doc_id"), sz(ws).as("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("n_covered", coalesce(col("n_covered"), lit(0L)))
      .withColumn("keep_frac",
        (col("n_tokens") - col("n_covered")).cast("double") / col("n_tokens"))
      .select("doc_id", "n_tokens", "n_covered", "keep_frac")
      .orderBy("doc_id")
  }

  val spanMaskOracle: String =
    s"""WITH corpus AS (
      |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
      |), sized AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n_tokens
      |  FROM corpus WHERE len(string_split(text, ' ')) >= 5
      |), spans_pos AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    md5($oracleGramExpr) AS g
      |  FROM (SELECT doc_id, ws, unnest(generate_series(1, n_tokens - 4)) AS i FROM sized)
      |), dup_grams AS (
      |  SELECT g FROM (SELECT DISTINCT doc_id, g FROM spans_pos)
      |  GROUP BY g HAVING count(*) >= 2
      |), covered AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(CAST(0 AS BIGINT), list_sort(list(pos))),
      |      (a, p) -> ((a // 1000000) + greatest(CAST(0 AS BIGINT), p + 4 - greatest(a % 1000000, p - 1))) * 1000000
      |                + greatest(a % 1000000, p + 4)
      |    ) // 1000000 AS n_covered
      |  FROM spans_pos JOIN dup_grams USING (g)
      |  GROUP BY doc_id
      |)
      |SELECT z.doc_id, CAST(z.n_tokens AS BIGINT) AS n_tokens,
      |  CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
      |  CAST(z.n_tokens - coalesce(c.n_covered, 0) AS DOUBLE) / z.n_tokens AS keep_frac
      |FROM sized z LEFT JOIN covered c USING (doc_id)
      |ORDER BY z.doc_id""".stripMargin

  // ------------------------------------------------------- n-gram novelty
  /** N-GRAM NOVELTY scoring — the curriculum/diversity signal: what
    * fraction of a doc's distinct 5-gram spans appear HERE FIRST
    * (ownership = smallest doc_id)? Boilerplate and near-copies score ~0;
    * genuinely new content scores ~1. Over [[Dedup.corpusWithNearDups]] a
    * planted suffix copy owns none of its spans (its source, with the
    * smaller id, owns them all) — novelty exactly 0, pinned in the spec.
    *
    * Same md5-keyed shuffle shape as [[dupSpans]]: one first-owner
    * aggregate over the span table, one join back, one per-doc rollup —
    * hashes move, never span text. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val spans = sharedSpanTable(spark, dir)
    val firstOwner = spans.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    spans.join(firstOwner, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .orderBy("doc_id")
  }

  val ngramNoveltyOracle: String =
    s"""WITH corpus AS (
      |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
      |), spans AS (
      |  SELECT DISTINCT doc_id, md5(gram) AS g FROM (
      |    ${oracleGramsSql("corpus").linesIterator.mkString("\n|    ")})
      |), first_owner AS (
      |  SELECT g, min(doc_id) AS first_doc FROM spans GROUP BY g
      |)
      |SELECT s.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
      |FROM spans s JOIN first_owner f USING (g)
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  // ----------------------------------------------------- shuffle + shard
  /** Deterministic GLOBAL SHUFFLE + SHARDING — the "shuffle the corpus,
    * write N training shards" step. Order key is a content-independent
    * rolling hash of the doc id, shard is `key mod N`, and the position
    * within a shard is a rank over (key, doc_id) — so the permutation is
    * identical at any partitioning, cluster size, or rerun (unlike
    * `orderBy(rand())`).
    *
    * 100 TB shape: shard assignment is a pure projection; the rank is a
    * window PARTITIONED BY shard — N independent per-shard sorts (each
    * 1/Nth of the corpus, the same sort the shard write itself needs),
    * never one global sort. */
  /** THE shard-assignment policy — skey/shard/pos derivation shared by
    * [[shuffleShards]] (the gated assignment query) and [[trainingSet]]
    * (the written artifact), so the two can never silently de-synchronize
    * (they duplicated this line-for-line until round 8's review).
    * mixedHash, not the plain fold: the order key IS the permutation, and
    * the plain fold is near-affine in sequential ids — a "shuffle" that
    * left crawl-adjacent docs adjacent (the exact correlation a training
    * shuffle exists to break). */
  private def shardKeyed(docs: DataFrame, nShards: Int,
      orderCols: Seq[Column] = Seq(col("skey"), col("doc_id"))): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(orderCols: _*)
    docs
      .withColumn("skey", mixedHash("shuf|"))
      .withColumn("shard", col("skey") % nShards)
      .withColumn("pos", row_number().over(w).cast("bigint"))
  }

  def shuffleShards(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame =
    shardKeyed(table(spark, dir, "documents"), nShards)
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")

  /** QUALITY-ANNEALED curriculum order over the kept training set — the
    * "end training on the best data" recipe (data annealing / curriculum
    * schedules): within each shard, docs are ordered tail → middle → head
    * by their CCNet-style quality bucket, hash-shuffled WITHIN each
    * quality class (the [[shardKeyed]] skey breaks crawl adjacency), so a
    * consumer reading shards in pos order finishes every epoch slice on
    * head-quality documents. Pure composition over the materialized
    * manifest — no new corpus scan; one window per shard partition.
    *
    * 100 TB shape: identical to [[shuffleShards]] (8 B keys, per-shard
    * partitioned rank windows, never a global sort) plus a 3-way CASE. */
  def curriculumOrder(spark: SparkSession, dir: String, nShards: Int = 8): DataFrame = {
    val kept = sharedManifest(spark, dir)
      .filter(col("final_keep")).select("doc_id", "bucket")
    val anneal = when(col("bucket") === "tail", 0)
      .when(col("bucket") === "middle", 1).otherwise(lit(2))
    shardKeyed(table(spark, dir, "documents").join(kept, "doc_id"), nShards,
        orderCols = Seq(anneal, col("skey"), col("doc_id")))
      .select("doc_id", "shard", "pos", "bucket")
      .orderBy("shard", "pos")
  }

  // def: composes trainingManifestOracle (itself a def)
  def curriculumOrderOracle(nShards: Int = 8): String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), kept AS (
       |  SELECT doc_id, bucket FROM manifest WHERE final_keep
       |), hashed AS (
       |  SELECT doc_id, bucket,
       |    ${mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
       |  FROM kept
       |)
       |SELECT doc_id, skey % $nShards AS shard,
       |  CAST(row_number() OVER (PARTITION BY skey % $nShards
       |    ORDER BY CASE bucket WHEN 'tail' THEN 0 WHEN 'middle' THEN 1 ELSE 2 END,
       |             skey, doc_id) AS BIGINT) AS pos,
       |  bucket
       |FROM hashed
       |ORDER BY shard, pos""".stripMargin

  def shuffleShardsOracle(nShards: Int = 8): String =
    s"""WITH hashed AS (
      |  SELECT doc_id,
      |    ${mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
      |  FROM documents
      |)
      |SELECT doc_id, skey % $nShards AS shard,
      |  CAST(row_number() OVER (PARTITION BY skey % $nShards ORDER BY skey, doc_id) AS BIGINT) AS pos
      |FROM hashed
      |ORDER BY shard, pos""".stripMargin

  // ------------------------------------------------------- corpus report
  /** One-row CORPUS HEALTH REPORT — the nightly composition a pipeline
    * operator actually schedules: volume (docs, tokens), diversity
    * (languages, sources, dominant language and its share), and hygiene
    * (short-doc count, exact-duplicate groups). Each distinct count is its
    * own single-distinct aggregate recombined by broadcast cross join —
    * the Expand-free shape (`ProfileQueries.ndvFrame` lesson: two
    * countDistinct in one agg replicate every row 3× through the
    * exchange). The dominant language comes from a 5-row aggregate with a
    * deterministic (count desc, lang) tie-break.
    *
    * 100 TB: three column-pruned scans (algebraic pass + two distincts)
    * and a 5-row language rollup — every piece partial+final, output one
    * row. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val base = d.select(sz(words).as("toks"), col("text"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("total_tokens"),
        sum(when(col("toks") < 10, 1L).otherwise(0L)).as("n_short_docs"),
        // the q1 recipe: cast the DECIMAL sum to double BEFORE dividing —
        // dividing the decimal by the count makes Spark round the quotient
        // to the decimal scale while DuckDB runs full double division, and
        // the two differ whenever the quotient doesn't terminate in 6
        // decimal digits
        (sum(col("toks").cast("decimal(28,6)")).cast("double") / count(lit(1))).as("avg_tokens"))
    val nLangs = d.agg(countDistinct(col("lang")).as("n_langs"))
    val nSources = d.agg(countDistinct(col("source")).as("n_sources"))
    val dupGroups = d.groupBy(md5(col("text"))).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).agg(count(lit(1)).as("n_exact_dup_groups"))
    val top = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("lang")).limit(1)
      .select(col("lang").as("top_lang"), col("cnt").as("top_lang_docs"))
    base.crossJoin(broadcast(nLangs)).crossJoin(broadcast(nSources))
      .crossJoin(broadcast(dupGroups)).crossJoin(broadcast(top))
      .withColumn("top_lang_share",
        col("top_lang_docs").cast("double") / col("n_docs"))
  }

  val corpusReportOracle: String =
    """WITH top AS (
      |  SELECT lang AS top_lang, count(*) AS top_lang_docs FROM documents
      |  GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1
      |)
      |SELECT count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(sum(CASE WHEN len(string_split(text, ' ')) < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_short_docs,
      |  CAST(sum(CAST(len(string_split(text, ' ')) AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_tokens,
      |  (SELECT count(DISTINCT lang) FROM documents) AS n_langs,
      |  (SELECT count(DISTINCT source) FROM documents) AS n_sources,
      |  (SELECT count(*) FROM (
      |     SELECT md5(text) FROM documents GROUP BY md5(text) HAVING count(*) > 1) g
      |  ) AS n_exact_dup_groups,
      |  (SELECT top_lang FROM top) AS top_lang,
      |  (SELECT top_lang_docs FROM top) AS top_lang_docs,
      |  CAST((SELECT top_lang_docs FROM top) AS DOUBLE) / count(*) AS top_lang_share
      |FROM documents""".stripMargin

  // ---------------------------------------------------- mixture budgeting
  /** DATA-MIXTURE budgeting: given target sampling weights per source,
    * compute each source's repeat factor (epochs over that source) so the
    * mixed training stream hits the target shares by token count — the
    * arithmetic behind every "books × 3 epochs, web × 0.8" pretraining mix
    * (cf. DoReMi / Llama data recipes). Sources src0-src2 are upweighted
    * to 10% each; the rest share the remaining 70% uniformly.
    *
    * 100 TB shape: one column-pruned scan, per-source partial aggregation
    * (source cardinality is tiny), scalar total broadcast back — no data
    * movement beyond the 20-row summary. */
  def mixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    val per = table(spark, dir, "documents")
      .select(col("source"), sz(words).as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    // tail share derived from the DATA's source cardinality (a hardcoded
    // divisor would silently break the sum-to-1 invariant on any corpus
    // that doesn't have exactly 20 sources)
    val total = per.agg(sum("n_tokens").as("total_tokens"),
      count(lit(1)).as("n_sources"))
    // the 0.7 tail splits uniformly over the NON-head sources, so a corpus
    // with <= 3 sources has no tail to budget: fail loudly at runtime
    // instead of emitting NULL/Inf/negative repeat factors (ADVICE r6)
    val tailShare = when(col("n_sources") <= 3,
      raise_error(concat(lit("mixtureBudget: tail share needs > 3 sources, corpus has "),
        col("n_sources")))).otherwise(lit(0.7) / (col("n_sources") - 3))
    per.crossJoin(broadcast(total))
      .withColumn("target_share",
        when(col("source").isin("src0", "src1", "src2"), 0.1)
          .otherwise(tailShare))
      .withColumn("repeat_factor",
        (col("target_share") * col("total_tokens").cast("double")) / col("n_tokens").cast("double"))
      .withColumn("n_epochs", ceil(col("repeat_factor")).cast("bigint"))
      .select("source", "n_docs", "n_tokens", "target_share", "repeat_factor", "n_epochs")
      .orderBy("source")
  }

  val mixtureBudgetOracle: String =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source
      |), tot AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |         count(*) AS n_sources FROM per
      |), shares AS (
      |  SELECT source, n_docs, n_tokens,
      |    CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0.1 ELSE 0.7 / (n_sources - 3) END AS target_share,
      |    (CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0.1 ELSE 0.7 / (n_sources - 3) END
      |      * CAST(total_tokens AS DOUBLE)) / CAST(n_tokens AS DOUBLE) AS repeat_factor
      |  FROM per CROSS JOIN tot
      |)
      |SELECT source, n_docs, n_tokens, CAST(target_share AS DOUBLE) AS target_share,
      |  repeat_factor, CAST(ceil(repeat_factor) AS BIGINT) AS n_epochs
      |FROM shares ORDER BY source""".stripMargin

  // ------------------------------------------------- mixture materialization
  /** MIXTURE EXPANSION — [[mixtureBudget]]'s repeat factors turned into the
    * actual training list: each doc appears ⌊rf⌋ times plus one more for a
    * deterministic hash-selected `rf − ⌊rf⌋` fraction of its source's docs,
    * so each source's expanded token count hits its target share in
    * expectation with NO randomness (rerun-identical, partitioning-
    * independent — the property epoch-sampling with `rand()` lacks).
    * Output is (doc_id, copy_idx): exactly the list a shard writer zips
    * with [[shuffleShards]].
    *
    * 100 TB shape: a 20-row broadcast of per-source factors, one scan, and
    * a per-row `sequence` explode bounded by the repeat factor (single-digit
    * for real mixtures) — linear in OUTPUT tokens, which is the size of the
    * training set being built anyway. No shuffle at all. */
  def mixtureExpand(spark: SparkSession, dir: String): DataFrame = {
    val rf = mixtureBudget(spark, dir).select(col("source"), col("repeat_factor"))
    table(spark, dir, "documents")
      .join(broadcast(rf), "source")
      .withColumn("full_copies", floor(col("repeat_factor")).cast("bigint"))
      // fractional remainder: take one extra copy when the doc's hash
      // permille falls below the remainder's permille — same IEEE double
      // comparison on both engines, zero RNG. The fold runs over the MD5
      // HEX of the key, not the key itself: a source's doc_ids stride by
      // the source count, and the plain polynomial fold maps that
      // arithmetic progression to clustered permilles (measured 9/25
      // selected at a 0.69 target); md5 scrambles first, the fold then
      // just compresses 32 well-mixed hex chars to an integer
      .withColumn("extra",
        (mixedHash("mix|") % 1000).cast("double")
          < (col("repeat_factor") - col("full_copies")) * 1000)
      .withColumn("n_copies", col("full_copies") + when(col("extra"), 1L).otherwise(0L))
      .filter(col("n_copies") >= 1) // sequence(1,0) would run DESCENDING in Spark
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  lazy val mixtureExpandOracle: String =
    s"""WITH budget AS (
       |  SELECT source, repeat_factor FROM (
       |${mixtureBudgetOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) b
       |), expanded AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(floor(b.repeat_factor) AS BIGINT)
       |      + CASE WHEN CAST((${mixedHashSql("mix|", "d.doc_id").linesIterator.mkString("\n|          ")} % 1000) AS DOUBLE)
       |          < (b.repeat_factor - floor(b.repeat_factor)) * 1000
       |        THEN 1 ELSE 0 END AS n_copies
       |  FROM documents d JOIN budget b USING (source)
       |)
       |SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy_idx
       |FROM expanded
       |WHERE n_copies >= 1
       |ORDER BY doc_id, copy_idx""".stripMargin

  // --------------------------------------------- per-source quality pruning
  /** PER-SOURCE quality-quantile pruning (the FineWeb/DCLM recipe): rank
    * each source's docs by a cheap quality score and keep the top
    * `keepPermille`/1000 — thresholds are per-source, because an absolute
    * cutoff lets a high-quality source drown out a scarce one. The keep
    * rule is PURE INTEGER (`rnk·1000 ≤ n_src·keepPermille` ⇔
    * rnk ≤ ⌊0.7·n⌋): no float boundary can disagree between engines, and
    * the (score DESC, doc_id) rank is fully deterministic.
    *
    * 100 TB shape: one scan + one rank window PARTITIONED BY source — N
    * independent per-source sorts of 1/Nth of the corpus each (the same
    * sort a per-source output write needs), never a global order. */
  def qualityPrune(spark: SparkSession, dir: String, keepPermille: Int = 700): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTokens = sz(words)
    val stopCnt = sz(filter(words, w => w.isInCollection(StopEn)))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (stopCnt.cast("double") / nTokens).as("score"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy("source")))
      .withColumn("keep", col("rnk") * 1000 <= col("n_src") * keepPermille)
      .select("doc_id", "source", "score", "rnk", "keep")
      .orderBy("doc_id")
  }

  def qualityPruneOracle(keepPermille: Int = 700): String = {
    val stopList = StopEn.map(s => s"'$s'").mkString(", ")
    s"""WITH scored AS (
       |  SELECT doc_id, source,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ($stopList))) AS DOUBLE)
       |      / len(string_split(text, ' ')) AS score
       |  FROM documents
       |), ranked AS (
       |  SELECT doc_id, source, score,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS BIGINT) AS rnk,
       |    count(*) OVER (PARTITION BY source) AS n_src
       |  FROM scored
       |)
       |SELECT doc_id, source, score, rnk, rnk * 1000 <= n_src * $keepPermille AS keep
       |FROM ranked ORDER BY doc_id""".stripMargin
  }

  // --------------------------------------------- filter agreement (kappa)
  /** The four per-doc keep decisions the curation surface already gates,
    * as one boolean per filter: Gopher rule bands, the stopword quality
    * screen, the CCNet surprisal bucket (keep = not `tail`), and the
    * per-source quality prune. One row per doc — the frame every
    * agreement/ablation question reads. */
  private def filterFlags(spark: SparkSession, dir: String): DataFrame =
    gopherRules(spark, dir).select(col("doc_id"), col("keep").as("gopher"))
      .join(qualityScores(spark, dir)
        .select(col("doc_id"), col("passes_quality").as("quality")), "doc_id")
      .join(unigramSurprisal(spark, dir)
        .select(col("doc_id"), (col("bucket") =!= "tail").as("ccnet")), "doc_id")
      .join(qualityPrune(spark, dir)
        .select(col("doc_id"), col("keep").as("prune")), "doc_id")
      // the LEARNED filter joins the stack (round 13): the trained NB
      // model's admit flag, so its redundancy against the hand-built
      // filters is measured like any other pair (expect high kappa vs
      // ccnet — it was distilled FROM those labels; the kappa says how
      // faithfully)
      .join(QualityClassifier.perDocScores(spark, dir)
        .select(col("doc_id"), (col("score_micro") > QualityClassifier.DecisionMicro).as("nbc")), "doc_id")

  private val filterNames = Seq("gopher", "quality", "ccnet", "prune", "nbc")
  private val filterPairs: Seq[(String, String)] =
    for { i <- filterNames.indices; j <- (i + 1) until filterNames.size }
      yield (filterNames(i), filterNames(j))

  /** FILTER-AGREEMENT MATRIX — for every pair of quality filters, the 2×2
    * confusion counts, exact half-up agreement permille, and COHEN'S KAPPA
    * (chance-corrected agreement, Cohen 1960): κ = (p_o − p_e)/(1 − p_e)
    * with p_e from the marginal keep rates. This is the redundancy read a
    * curation owner takes before stacking filters: κ ≈ 1 means the second
    * filter adds nothing; κ ≈ 0 means it cuts an independent dimension
    * (and the union will over-prune); negative κ means the filters
    * actively disagree and one of them is probably mis-calibrated for
    * this corpus. Kappa is emitted as the IEEE quotient of two exact
    * int64 counts (n·agree − E over n² − E, products ≤ n² — int64-safe to
    * ~3·10⁹ docs, the 100 TB regime; beyond that the counts widen to
    * DECIMAL like the tfidf path), so both engines compute bit-identical
    * doubles; NULL when a degenerate pair leaves no chance variation.
    *
    * Scale shape: ONE pass builds the four flags (each filter's own
    * sub-linear pipeline), ONE count-only aggregate folds all 24
    * conditional sums map-side into a single row, and the 6 output rows
    * are projections of that broadcast-sized row — nothing after the
    * flags frame is corpus-sized. */
  def filterAgreement(spark: SparkSession, dir: String): DataFrame = {
    val aggs = filterPairs.flatMap { case (a, b) =>
      Seq(
        sum(when(col(a) && col(b), 1L).otherwise(0L)).as(s"${a}_${b}_bk"),
        sum(when(!col(a) && !col(b), 1L).otherwise(0L)).as(s"${a}_${b}_bd"),
        sum(when(col(a) && !col(b), 1L).otherwise(0L)).as(s"${a}_${b}_oa"),
        sum(when(!col(a) && col(b), 1L).otherwise(0L)).as(s"${a}_${b}_ob"))
    }
    val one = filterFlags(spark, dir)
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .localCheckpoint(false) // 1 row; its 6 consumers must not refold the corpus
    filterPairs.map { case (a, b) =>
      one.select(lit(a).as("filter_a"), lit(b).as("filter_b"), col("n_docs"),
        col(s"${a}_${b}_bk").as("both_keep"), col(s"${a}_${b}_bd").as("both_drop"),
        col(s"${a}_${b}_oa").as("only_a"), col(s"${a}_${b}_ob").as("only_b"))
    }.reduce(_ unionAll _)
      .withColumn("agree_permille",
        expr("(1000 * (both_keep + both_drop) + n_docs div 2) div n_docs"))
      .withColumn("kappa", expr(
        """CASE WHEN n_docs * n_docs =
          |  (both_keep + only_a) * (both_keep + only_b)
          |    + (both_drop + only_b) * (both_drop + only_a) THEN NULL
          |ELSE CAST(n_docs * (both_keep + both_drop)
          |    - ((both_keep + only_a) * (both_keep + only_b)
          |       + (both_drop + only_b) * (both_drop + only_a)) AS DOUBLE)
          |  / (n_docs * n_docs
          |     - ((both_keep + only_a) * (both_keep + only_b)
          |        + (both_drop + only_b) * (both_drop + only_a))) END""".stripMargin))
      .orderBy("filter_a", "filter_b")
  }

  def filterAgreementOracle: String = {
    val aggs = filterPairs.flatMap { case (a, b) => Seq(
      s"CAST(sum(CASE WHEN $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS ${a}_${b}_bk",
      s"CAST(sum(CASE WHEN NOT $a AND NOT $b THEN 1 ELSE 0 END) AS BIGINT) AS ${a}_${b}_bd",
      s"CAST(sum(CASE WHEN $a AND NOT $b THEN 1 ELSE 0 END) AS BIGINT) AS ${a}_${b}_oa",
      s"CAST(sum(CASE WHEN NOT $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS ${a}_${b}_ob")
    }.mkString(",\n    ")
    val branches = filterPairs.map { case (a, b) =>
      s"""SELECT '$a' AS filter_a, '$b' AS filter_b, n_docs,
         |    ${a}_${b}_bk AS both_keep, ${a}_${b}_bd AS both_drop,
         |    ${a}_${b}_oa AS only_a, ${a}_${b}_ob AS only_b FROM one""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH g AS (SELECT doc_id, keep AS gopher FROM ($gopherRulesOracle) t),
       |q AS (SELECT doc_id, passes_quality AS quality FROM ($qualityScoresOracle) t),
       |c AS (SELECT doc_id, bucket != 'tail' AS ccnet FROM ($unigramSurprisalOracle) t),
       |p AS (SELECT doc_id, keep AS prune FROM (${qualityPruneOracle()}) t),
       |nb AS (SELECT doc_id, score_micro > ${QualityClassifier.DecisionMicro} AS nbc
       |       FROM (${QualityClassifier.perDocScoresOracle}) t),
       |wide AS (
       |  SELECT g.doc_id, gopher, quality, ccnet, prune, nbc
       |  FROM g JOIN q USING (doc_id) JOIN c USING (doc_id) JOIN p USING (doc_id)
       |    JOIN nb USING (doc_id)
       |), one AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    $aggs
       |  FROM wide
       |), rows_ AS (
       |$branches
       |)
       |SELECT filter_a, filter_b, n_docs, both_keep, both_drop, only_a, only_b,
       |  (1000 * (both_keep + both_drop) + n_docs // 2) // n_docs AS agree_permille,
       |  CASE WHEN n_docs * n_docs =
       |    (both_keep + only_a) * (both_keep + only_b)
       |      + (both_drop + only_b) * (both_drop + only_a) THEN NULL
       |  ELSE CAST(n_docs * (both_keep + both_drop)
       |      - ((both_keep + only_a) * (both_keep + only_b)
       |         + (both_drop + only_b) * (both_drop + only_a)) AS DOUBLE)
       |    / (n_docs * n_docs
       |       - ((both_keep + only_a) * (both_keep + only_b)
       |          + (both_drop + only_b) * (both_drop + only_a))) END AS kappa
       |FROM rows_ ORDER BY filter_a, filter_b""".stripMargin
  }

  // ----------------------------------------------- boilerplate prefixes
  /** Deterministic boilerplate plant for the prefix screen (the
    * [[codeRenderSql]] pattern): every doc_id % 5 == 0 doc gains a
    * template header, the rest pass through. One expression string shared
    * by both engines. */
  private val boilerRenderSql: String =
    """CASE WHEN doc_id % 5 = 0
      |     THEN 'breaking news update follow us ' || text
      |     ELSE text END""".stripMargin

  /** BOILERPLATE-PREFIX DETECTOR — per source, the most common 5-word
    * document PREFIX and its exact coverage permille: templated headers
    * ("subscribe to...", scraper banners, licence preambles) shared by a
    * large fraction of a source's docs are the classic near-dup mass that
    * slips past document-level dedup (the prefix is identical, the body
    * differs) and should be STRIPPED, not deduped. A coverage spike is
    * the signal to add the prefix to the [[graft.operators.WebNormalize]]
    * strip rules. Argmax is (count desc, gram asc) — deterministic.
    * Scale shape: one row-local prefix projection, a (source, gram)
    * partial-agg shuffle whose output is distinct-prefix-sized, then a
    * |sources|-partition window — nothing after the first fold is
    * corpus-sized. */
  def boilerplatePrefix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = table(spark, dir, "documents")
      .withColumn("r", expr(boilerRenderSql))
      .select(col("source"),
        array_join(slice(split(col("r"), " "), 1, 5), " ").as("prefix"))
      .groupBy("source", "prefix").agg(count(lit(1)).as("gram_docs"))
    val w = Window.partitionBy("source")
      .orderBy(col("gram_docs").desc, col("prefix"))
    grams
      .withColumn("n_docs", sum(col("gram_docs")).over(Window.partitionBy("source")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("prefix").as("top_prefix"), col("n_docs"),
        col("gram_docs"),
        expr("(gram_docs * 1000 + n_docs div 2) div n_docs").as("coverage_permille"))
      .orderBy("source")
  }

  val boilerplatePrefixOracle: String = {
    val render = boilerRenderSql.replace("\n", "\n  ")
    s"""WITH rendered AS (
       |  SELECT doc_id, source, $render AS r FROM documents
       |), grams AS (
       |  SELECT source,
       |    array_to_string(string_split(r, ' ')[1:5], ' ') AS prefix,
       |    CAST(count(*) AS BIGINT) AS gram_docs
       |  FROM rendered GROUP BY source, prefix
       |), ranked AS (
       |  SELECT source, prefix, gram_docs,
       |    CAST(sum(gram_docs) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY gram_docs DESC, prefix) AS rn
       |  FROM grams
       |)
       |SELECT source, prefix AS top_prefix, n_docs, gram_docs,
       |  (gram_docs * 1000 + n_docs // 2) // n_docs AS coverage_permille
       |FROM ranked WHERE rn = 1 ORDER BY source""".stripMargin
  }

  // --------------------------------------------- deterministic data splits
  /** Deterministic TRAIN/VAL/TEST assignment — hash of the doc IDENTITY
    * (never the text: editing a doc must not move it across splits), 100
    * buckets, 80/10/10. Identical at any partitioning, cluster size, or
    * rerun, and a doc's split never depends on which other docs exist —
    * the property random-number splits lack and every leakage audit needs.
    * Pure projection: no shuffle at all. */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("bucket", mixedHash("split|") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

  private def splitHashSql(idExpr: String): String =
    s"""${mixedHashSql("split|", idExpr)} % 100""".stripMargin

  val trainSplitOracle: String =
    s"""WITH hashed AS (
      |  SELECT doc_id,
      |    ${splitHashSql("doc_id").linesIterator.mkString("\n|    ")} AS bucket
      |  FROM documents
      |)
      |SELECT doc_id, bucket,
      |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
      |FROM hashed ORDER BY doc_id""".stripMargin

  /** CLUSTER-SAFE train/val/test split: the split key is the doc's near-dup
    * CLUSTER representative (min-label connected component over the
    * verified-pair graph), falling back to the doc's own id when it has no
    * near-dups. Hashing the cluster rep instead of the doc id makes
    * leakage structurally impossible — every member of a near-dup cluster
    * lands in the SAME split, so no verified pair can straddle train/test
    * (what [[splitLeakage]] merely DETECTS for the per-doc split, this
    * PREVENTS; `ClusterSafeSplitSpec` asserts the zero-straddle property).
    *
    * 100 TB shape: cluster labels come from the shared materialized pair
    * graph (log-diameter pointer-jumping propagation over 16 B edges); the
    * rest is one 8-byte-key left join plus a pure hash projection — no new
    * corpus scan, no state beyond the label table. */
  def clusterSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Dedup.corpusWithNearDups(spark, dir).select("doc_id")
    val clusters = Dedup.dedupClusters(spark, dir)
    corpus.join(clusters, Seq("doc_id"), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", mixedHashOf("csplit|", col("split_key")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .select("doc_id", "split_key", "bucket", "split")
      .orderBy("doc_id")
  }

  lazy val clusterSafeSplitOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT id_a, id_b FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) q
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b, id_a FROM pairs
       |), reach(a, b) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
       |), clusters AS (
       |  SELECT a AS doc_id, CAST(min(b) AS BIGINT) AS cluster_id FROM reach GROUP BY a
       |), corpus AS (
       |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
       |), keyed AS (
       |  SELECT c.doc_id, COALESCE(cl.cluster_id, c.doc_id) AS split_key
       |  FROM corpus c LEFT JOIN clusters cl ON cl.doc_id = c.doc_id
       |), hashed AS (
       |  SELECT doc_id, split_key,
       |    ${mixedHashSql("csplit|", "split_key").linesIterator.mkString("\n|    ")} % 100 AS bucket
       |  FROM keyed
       |)
       |SELECT doc_id, split_key, bucket,
       |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
       |FROM hashed ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------- OOV / vocab coverage
  /** OUT-OF-VOCABULARY rate against a corpus-derived reference vocabulary —
    * the tokenizer-coverage screen: a doc whose tokens mostly miss the
    * vocabulary will fragment into byte-fallback pieces (wasted sequence
    * length) or signal the corpus drifted from the tokenizer's training
    * mix. Vocabulary = the top-`vocabSize` words by document frequency
    * (deterministic `(df desc, word)` tie-break); the OOV fraction is an
    * exact integer micro-unit ratio.
    *
    * 100 TB shape: the vocabulary is TakeOrdered-bounded (per-partition
    * top-V heads + a V-row merge — never a global word sort) and
    * broadcast; scoring is one explode pass + a broadcast left join +
    * per-doc regroup. A real tokenizer vocab would simply replace the
    * derived table — the scoring pass is unchanged. */
  def oovRate(spark: SparkSession, dir: String, vocabSize: Int = 50): DataFrame = {
    // (doc, word, tf) rollup materialized ONCE: the vocab fit and the
    // scoring join both read it, and without the checkpoint Spark executes
    // the corpus explode twice as separate physical subtrees — the exact
    // double-scan docTermTf's localCheckpoint exists to avoid (ADVICE r7).
    // The rollup (distinct words per doc) is strictly smaller than the raw
    // token stream, so this is also the cheaper artifact to materialize.
    val tf = table(spark, dir, "documents")
      .select(col("doc_id"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    // rollup rows are unique per (doc, word), so count(*) IS the df
    val vocab = tf
      .groupBy("word").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("word"))
      .limit(vocabSize)
      .select("word")
    oovScore(tf, vocab)
  }

  /** Scoring side shared by the derived-vocab gate and the file-vocab
    * path: broadcast the vocabulary, one left join over the (doc, word,
    * tf) rollup, per-doc regroup weighting by tf. */
  private def oovScore(tf: DataFrame, vocab: DataFrame): DataFrame =
    tf.join(broadcast(vocab).withColumn("iv", lit(1L)), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("iv").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_micro", expr("(n_oov * 1000000) div n_tokens"))
      .select("doc_id", "n_tokens", "n_oov", "oov_micro")
      .orderBy("doc_id")

  /** OOV rate against an EXTERNAL vocabulary file — the operator's real
    * production use: tokenizer-coverage screening against a fixed BPE/
    * WordPiece vocab shipped as a plain one-word-per-line text file (the
    * format `vocab.txt` tokenizers publish). The gated [[oovRate]] derives
    * a top-df stand-in instead because the driver's DuckDB oracle can't
    * read a repo fixture; this path swaps ONLY the vocab source — the
    * scoring pass is byte-identical. A real vocab is ≤ a few hundred
    * thousand rows (GPT-2 50k, mT5 250k), far under broadcast range at
    * any corpus size. */
  def oovRateFromFile(spark: SparkSession, dir: String, vocabPath: String): DataFrame = {
    val tf = table(spark, dir, "documents")
      .select(col("doc_id"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
    val vocab = spark.read.textFile(vocabPath).toDF("word")
      .filter(col("word") =!= "").distinct()
    // no checkpoint here: the vocab is file-sourced, so the corpus explode
    // runs exactly once — only the derived-vocab form reads tf twice
    oovScore(tf, vocab)
  }

  def oovRateOracle(vocabSize: Int = 50): String =
    s"""WITH toks AS (
       |  SELECT doc_id, w.word
       |  FROM documents, unnest(string_split(text, ' ')) AS w(word)
       |  WHERE w.word != ''
       |), vocab AS (
       |  SELECT word FROM (
       |    SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
       |  ) ORDER BY df DESC, word LIMIT $vocabSize
       |)
       |SELECT t.doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST((sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS oov_micro
       |FROM toks t LEFT JOIN vocab v ON v.word = t.word
       |GROUP BY t.doc_id
       |ORDER BY t.doc_id""".stripMargin

  // ------------------------------------- unigram LM quality buckets (CCNet)
  /** CCNet-style MODEL-QUALITY bucketing (Wenzek et al. 2020,
    * arXiv:1911.00359): score each document against a per-language corpus
    * language model and cut each language into head/middle/tail terciles —
    * "head" reads like the bulk of the language's corpus, "tail" is the
    * outlier band that gets dropped or down-weighted before training. The
    * published pipeline scores with a 5-gram KenLM; the engine keeps the
    * same SHAPE (per-language LM → per-doc mean score → per-language
    * percentile buckets) with a unigram inverse-probability surrogate in
    * exact integer micro-units so the whole policy sits under the DuckDB
    * oracle: `rarity_micro(w) = (10⁶ · lang_tokens) div lang_freq(w)` is
    * 10⁶/p(w), the doc score is the tf-weighted mean rarity, and bucket
    * cuts are the pure-integer rank rule (rnk·10 ≤ n·3 → head, ≤ 7 →
    * middle) from [[qualityPrune]]. The log transform between this and
    * true surprisal is monotone per ranking — left to consumers, the
    * [[tfidf]] precedent.
    *
    * 100 TB shape: ONE (doc, word) tf shuffle materialized once (the
    * "tokenize once" artifact, shared by the fit and scoring sides), one
    * (lang, word) frequency aggregate JOINED back on (lang, word) — the
    * frequency table is vocabulary-sized (Zipf-bounded, shuffled not
    * broadcast) — then one per-doc sum and a per-LANGUAGE rank window
    * (never a global one; at scale each language ranks independently,
    * and within a language the rank is range-partitionable exactly like
    * [[packSequences]]' prefix sums). */
  def unigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    // the memoized tokenize-once + bucket artifact (round 13: the stage is
    // shared with the bigram LM and the trained classifier family — see
    // [[sharedUnigramBuckets]]); at scale this IS the persisted artifact
    // every LM fit reads, and its consumers must not re-tokenize per query
    sharedUnigramBuckets(spark, dir).orderBy("doc_id")

  /** Un-checkpointed twin for plan audits ([[dupSpansPlan]] pattern):
    * the gated form's checkpoint collapses the upstream to an RDD scan. */
  private[graft] def unigramSurprisalPlan(spark: SparkSession, dir: String): DataFrame =
    unigramSurprisalFrom(docTermTf(spark, dir))

  private[operators] def docTermTf(spark: SparkSession, dir: String): DataFrame =
    // spread (r16): the single-split fixture scan otherwise runs the
    // tokenize AND the per-row counting on one core.
    // row-local tf (r17, guide §2.3/§2.4): a document's term frequencies
    // are a fact of ONE row, so the explode → groupBy(doc, word) corpus
    // shuffle computed something each row already knew — gram_tfs emits
    // the distinct (word, tf) pairs in-row and the exchange disappears
    // from the plan (same rows: see [[graft.functions.VectorExpressions.GramTfs]]).
    graft.Fixtures.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.VectorExpressions.gram_tfs(words, 1)).as("g"))
      .select(col("doc_id"), col("lang"), col("g.w1").as("word"), col("g.tf").as("tf"))
      .filter(col("word") =!= "")

  /** Per-(lang, word) inverse-probability rarity in exact integer micro
    * units — the unigram LM itself, shared by the batch scorer and the
    * frozen-model builders ([[lmModelRow]]). Vocab-sized (Zipf-bounded);
    * per-language totals as a window over the freq table, so the corpus
    * explode is not recomputed for a totals broadcast (the targetAffinity
    * lesson; the window is partitioned by lang over vocabulary rows, never
    * corpus rows). */
  private[operators] def langRarityFrom(docTerm: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docTerm.groupBy("lang", "word")
      .agg(sum("tf").as("lang_freq"))
      .withColumn("lang_tokens", sum("lang_freq").over(Window.partitionBy("lang")))
      // widen the inverse-probability products: 10⁶ · lang_tokens wraps
      // int64 once a language passes ~9·10¹² tokens (a 100 TB corpus is
      // ~10¹³), so both the rarity and the tf-weighted sum run in
      // DECIMAL(38,0)/HUGEINT — the tfidf precedent; the final mean stays
      // int64-exact while a doc's mean inverse-probability < 2⁶³ micro
      // (violated only by a doc of pure hapaxes in a 10¹³-token language)
      .withColumn("rarity_micro",
        expr("(CAST(1000000 AS DECIMAL(38,0)) * lang_tokens) div lang_freq"))
  }

  private[operators] def unigramSurprisalFrom(docTerm: DataFrame): DataFrame = {
    val scored = docTerm
      .join(langRarityFrom(docTerm).select("lang", "word", "rarity_micro"),
        Seq("lang", "word"))
      .groupBy("doc_id", "lang")
      .agg(expr("sum(CAST(tf AS DECIMAL(38,0)) * rarity_micro)").as("sum_rarity"),
        sum("tf").as("n_tokens"))
      .withColumn("score_micro", expr("sum_rarity div n_tokens"))
      .select("doc_id", "lang", "n_tokens", "score_micro")
    tercileBucketsOf(scored).orderBy("doc_id")
  }

  /** The per-language integer tercile cut shared by every LM bucketer
    * ([[unigramSurprisal]], [[bigramSurprisal]]): rank within language by
    * (score, doc_id), rnk·10 ≤ n·3 → head, ≤ 7 → middle. This rank window
    * is the CALIBRATION side of the policy — at 100 TB it runs once over a
    * bounded calibration sample to freeze the per-language score
    * boundaries; the production scan classifies with
    * [[classifyByThreshold]] (broadcast boundaries, no window), and
    * [[lmDeployedFrom]] GATES the two forms' equivalence cross-engine. */
  private def tercileBucketsOf(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("score_micro"), col("doc_id"))
    val outCols = scored.columns :+ "bucket"
    scored
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .withColumn("n_lang", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rnk") * 10 <= col("n_lang") * 3, "head")
          .when(col("rnk") * 10 <= col("n_lang") * 7, "middle")
          .otherwise("tail"))
      .select(outCols.head, outCols.tail: _*)
  }

  val unigramSurprisalOracle: String =
    """WITH dt AS (
      |  SELECT doc_id, lang, w.word, count(*) AS tf
      |  FROM documents, unnest(string_split(text, ' ')) AS w(word)
      |  WHERE w.word != ''
      |  GROUP BY doc_id, lang, w.word
      |), lf AS (
      |  SELECT lang, word, CAST(sum(tf) AS BIGINT) AS lang_freq FROM dt GROUP BY lang, word
      |), lt AS (
      |  SELECT lang, CAST(sum(lang_freq) AS BIGINT) AS lang_tokens FROM lf GROUP BY lang
      |), scored AS (
      |  SELECT dt.doc_id, dt.lang,
      |    CAST(sum(dt.tf) AS BIGINT) AS n_tokens,
      |    CAST(sum(CAST(dt.tf AS HUGEINT) * ((CAST(1000000 AS HUGEINT) * lt.lang_tokens) // lf.lang_freq)) // sum(dt.tf) AS BIGINT) AS score_micro
      |  FROM dt
      |  JOIN lf ON lf.lang = dt.lang AND lf.word = dt.word
      |  JOIN lt ON lt.lang = dt.lang
      |  GROUP BY dt.doc_id, dt.lang
      |), ranked AS (
      |  SELECT doc_id, lang, n_tokens, score_micro,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score_micro, doc_id) AS BIGINT) AS rnk,
      |    count(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM scored
      |)
      |SELECT doc_id, lang, n_tokens, score_micro,
      |  CASE WHEN rnk * 10 <= n_lang * 3 THEN 'head'
      |       WHEN rnk * 10 <= n_lang * 7 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM ranked ORDER BY doc_id""".stripMargin

  // ------------------------------------- bigram LM quality buckets (order-2)
  /** BIGRAM (order-2) MODEL-QUALITY bucketing — the step from
    * [[unigramSurprisal]]'s bag-of-words scorer toward the n-gram KenLM the
    * published CCNet pipeline actually runs (Wenzek et al. 2020;
    * Heafield 2011 for the model family): each document is scored against a
    * per-language CONDITIONAL model p(w₂|w₁) fit on the corpus itself, so
    * word-order damage (shuffled text, boilerplate splices, spun content)
    * that a unigram model cannot see lands in the tail. Same exact-integer
    * discipline: add-1-smoothed inverse conditional probability in
    * micro-units, `inv_micro(w₁,w₂) = 10⁶·(c(w₁·)+V_lang) div (c(w₁,w₂)+1)`
    * with prefix counts c(w₁·) and the language's second-word vocabulary
    * V_lang as the smoothing mass; a doc's score is its pair-frequency-
    * weighted mean (integral `div`), and terciles cut per language with the
    * same integer rank rule. Single-word docs have no pairs and are
    * excluded on both engines (the conditional model says nothing about
    * them — [[unigramSurprisal]] still covers them).
    *
    * 100 TB shape: ONE (doc, pair) tf shuffle (the pair-tokenize-once
    * artifact, checkpoint-shared between fit and scoring); the bigram
    * frequency table is pair-vocabulary-sized (Zipf-bounded, shuffled on
    * (lang, w₁, w₂) — never broadcast), prefix counts reduce from it, and
    * the per-language tercile windows are partitioned exactly like the
    * unigram form. */
  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "lm_bi_buckets")(
      bigramSurprisalFrom(docPairTf(spark, dir).localCheckpoint(false)))

  /** The unigram tercile frame MATERIALIZED once per (session, dir) —
    * shared by [[lmOrderAgreement]] and the classifier family
    * ([[QualityClassifier]] uses the same stage keys, so the whole
    * LM/classifier stack reads ONE tokenize-once + bucket artifact). */
  private[operators] def sharedUnigramBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docTerm = StageMemo(spark, dir, "nb_docterm")(docTermTf(spark, dir))
    StageMemo(spark, dir, "nb_buckets")(unigramSurprisalFrom(docTerm))
  }

  /** Un-checkpointed twin for plan audits ([[unigramSurprisalPlan]]). */
  private[graft] def bigramSurprisalPlan(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisalFrom(docPairTf(spark, dir))

  private[operators] def docPairTf(spark: SparkSession, dir: String): DataFrame =
    // row-local pair tf (r17, guide §2.3/§2.4 — the [[docTermTf]] move at
    // order 2): the per-doc distinct (w1, w2, tf) triples come out of ONE
    // row via gram_tfs, so the explode → groupBy(doc, w1, w2) corpus
    // exchange is gone from the plan. spread (r16): single-split scan ⇒
    // one-core tokenize otherwise.
    graft.Fixtures.spread(table(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), words.as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.VectorExpressions.gram_tfs(col("ts"), 2)).as("g"))
      .select(col("doc_id"), col("lang"), col("g.w1").as("w1"),
        col("g.w2").as("w2"), col("g.tf").as("tf"))
      .filter(col("w1") =!= "" && col("w2") =!= "")

  private[operators] def bigramSurprisalFrom(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bigFreq = pairs.groupBy("lang", "w1", "w2").agg(sum("tf").as("c12"))
      .withColumn("c1", sum("c12").over(Window.partitionBy("lang", "w1")))
    val vlang = bigFreq.select(col("lang"), col("w2")).distinct()
      .groupBy("lang").agg(count(lit(1)).as("v_lang"))
    val scored = pairs
      .join(bigFreq, Seq("lang", "w1", "w2"))
      .join(broadcast(vlang), Seq("lang"))
      .withColumn("inv_micro", expr(
        "(CAST(1000000 AS DECIMAL(38,0)) * (c1 + v_lang)) div (c12 + 1)"))
      .groupBy("doc_id", "lang")
      .agg(expr("sum(CAST(tf AS DECIMAL(38,0)) * inv_micro)").as("sum_inv"),
        sum("tf").as("n_pairs"))
      .withColumn("score_micro", expr("CAST(sum_inv div n_pairs AS BIGINT)"))
      .select("doc_id", "lang", "n_pairs", "score_micro")
    tercileBucketsOf(scored).orderBy("doc_id")
  }

  val bigramSurprisalOracle: String =
    """WITH dp AS (
      |  SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS tf FROM (
      |    SELECT doc_id, lang, ts[i] AS w1, ts[i + 1] AS w2
      |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS ts,
      |            unnest(range(1, len(string_split(text, ' ')))) AS i
      |          FROM documents))
      |  WHERE w1 <> '' AND w2 <> ''
      |  GROUP BY doc_id, lang, w1, w2
      |), bf AS (
      |  SELECT lang, w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM dp
      |  GROUP BY lang, w1, w2
      |), pf AS (
      |  SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bf GROUP BY lang, w1
      |), vl AS (
      |  SELECT lang, CAST(count(DISTINCT w2) AS BIGINT) AS v_lang FROM bf GROUP BY lang
      |), scored AS (
      |  SELECT dp.doc_id, dp.lang,
      |    CAST(sum(dp.tf) AS BIGINT) AS n_pairs,
      |    CAST(sum(CAST(dp.tf AS HUGEINT) *
      |        ((CAST(1000000 AS HUGEINT) * (pf.c1 + vl.v_lang)) // (bf.c12 + 1)))
      |      // sum(dp.tf) AS BIGINT) AS score_micro
      |  FROM dp
      |  JOIN bf ON bf.lang = dp.lang AND bf.w1 = dp.w1 AND bf.w2 = dp.w2
      |  JOIN pf ON pf.lang = dp.lang AND pf.w1 = dp.w1
      |  JOIN vl ON vl.lang = dp.lang
      |  GROUP BY dp.doc_id, dp.lang
      |), ranked AS (
      |  SELECT doc_id, lang, n_pairs, score_micro,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score_micro, doc_id) AS BIGINT) AS rnk,
      |    count(*) OVER (PARTITION BY lang) AS n_lang
      |  FROM scored
      |)
      |SELECT doc_id, lang, n_pairs, score_micro,
      |  CASE WHEN rnk * 10 <= n_lang * 3 THEN 'head'
      |       WHEN rnk * 10 <= n_lang * 7 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM ranked ORDER BY doc_id""".stripMargin

  /** MODEL-ORDER AGREEMENT — the 3×3 confusion between the unigram and
    * bigram LM terciles: which documents the order-2 model re-ranks, with
    * both mean scores per cell. A doc in (head, tail) reads fluent
    * word-by-word but incoherent in sequence — the band a unigram-only
    * pipeline ships by mistake; the off-diagonal mass is the measured
    * value of upgrading the model order. Covers docs with ≥1 pair (the
    * conditional model's domain). */
  def lmOrderAgreement(spark: SparkSession, dir: String): DataFrame = {
    val uni = sharedUnigramBuckets(spark, dir)
      .select(col("doc_id"), col("bucket").as("bucket_uni"),
        col("score_micro").as("uni_micro"))
    val bi = bigramSurprisal(spark, dir)
      .select(col("doc_id"), col("bucket").as("bucket_bi"),
        col("score_micro").as("bi_micro"))
    uni.join(bi, "doc_id")
      .groupBy("bucket_uni", "bucket_bi")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(CAST(uni_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_uni_micro"),
        expr("CAST(sum(CAST(bi_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_bi_micro"))
      .orderBy("bucket_uni", "bucket_bi")
  }

  val lmOrderAgreementOracle: String =
    s"""WITH uni AS (
       |  SELECT doc_id, bucket AS bucket_uni, score_micro AS uni_micro
       |  FROM ($unigramSurprisalOracle) t
       |), bi AS (
       |  SELECT doc_id, bucket AS bucket_bi, score_micro AS bi_micro
       |  FROM ($bigramSurprisalOracle) t
       |)
       |SELECT bucket_uni, bucket_bi,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(uni_micro AS HUGEINT)) // count(*) AS BIGINT) AS mean_uni_micro,
       |  CAST(sum(CAST(bi_micro AS HUGEINT)) // count(*) AS BIGINT) AS mean_bi_micro
       |FROM uni JOIN bi USING (doc_id)
       |GROUP BY bucket_uni, bucket_bi
       |ORDER BY bucket_uni, bucket_bi""".stripMargin

  // ------------------------------------- LM tercile DEPLOYED threshold form
  /** Per-language tercile score BOUNDARIES frozen from a bucketed LM frame:
    * the max score inside the rank-assigned head (head/middle cut) and
    * inside head∪middle (middle/tail cut), plus the rank-side counts the
    * consistency gate compares against. |languages| rows — trivially
    * broadcastable, the LM analog of [[DataSelection.selectionThresholds]]. */
  private def lmThresholds(buckets: DataFrame): DataFrame =
    buckets.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("score_micro"))).as("head_thr_micro"),
      max(when(col("bucket") =!= "tail", col("score_micro"))).as("mid_thr_micro"),
      sum(when(col("bucket") === "head", 1L).otherwise(0L)).as("n_head_rank"),
      sum(when(col("bucket") =!= "tail", 1L).otherwise(0L)).as("n_headmid_rank"))

  /** The DEPLOYED classification path: scan + broadcast boundary join +
    * CASE — the form a 1000-executor pass over 10¹³ documents actually
    * runs. No window, no per-language sort, no shuffle of the corpus at
    * all beyond the scan itself (the boundary table is |languages| rows).
    * A language with no head docs (1-doc stratum) carries NULL boundaries;
    * NULL comparisons fall through to the next CASE arm on both engines,
    * so such docs classify tail — exactly what the rank rule assigned. */
  private[operators] def classifyByThreshold(scored: DataFrame, thr: DataFrame): DataFrame =
    scored.join(broadcast(thr), Seq("lang"))
      .withColumn("bucket_thr",
        when(col("score_micro") <= col("head_thr_micro"), "head")
          .when(col("score_micro") <= col("mid_thr_micro"), "middle")
          .otherwise("tail"))

  /** DEPLOYMENT-CONSISTENCY table for an LM tercile family
    * ([[DataSelection.dsirDeployed]]'s discipline, the
    * `profile_histogram_depth` boundary-broadcast precedent): per language,
    * the frozen score boundaries side by side with the rank policy they
    * were calibrated from — rank-side vs threshold-side head and
    * head∪middle counts, boundary-tie mass at each cut, the per-doc
    * agreement count, and the `consistent` gate (threshold admits ⊇ rank
    * picks at each cut, excess bounded by ties−1; ties are docs sharing
    * the boundary score, which the deterministic doc_id tie-break may
    * split across the rank cut but a score threshold never can).
    *
    * WHY this exists: the rank window in [[tercileBucketsOf]] is a
    * per-language global sort — correct, but with realistic language skew
    * (~2 dominant languages) it is a single-task bottleneck at 100×. The
    * deployed form this table gates is the production plan: calibrate the
    * two boundary scores per language (on a bounded sample at scale),
    * broadcast them, classify in a pure scan. A drift between the rank
    * policy and its threshold form fails this row cross-engine. */
  private def lmDeployedFrom(buckets: DataFrame): DataFrame = {
    val cls = classifyByThreshold(buckets, lmThresholds(buckets))
    cls.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        first("head_thr_micro").as("head_thr_micro"),
        first("mid_thr_micro").as("mid_thr_micro"),
        first("n_head_rank").as("n_head_rank"),
        sum(when(col("bucket_thr") === "head", 1L).otherwise(0L)).as("n_head_thr"),
        sum(when(col("score_micro") === col("head_thr_micro"), 1L).otherwise(0L))
          .as("head_ties"),
        first("n_headmid_rank").as("n_headmid_rank"),
        sum(when(col("bucket_thr") =!= "tail", 1L).otherwise(0L)).as("n_headmid_thr"),
        sum(when(col("score_micro") === col("mid_thr_micro"), 1L).otherwise(0L))
          .as("mid_ties"),
        sum(when(col("bucket") === col("bucket_thr"), 1L).otherwise(0L)).as("n_agree"))
      .withColumn("consistent", expr(
        "n_head_thr >= n_head_rank AND n_head_thr - n_head_rank <= greatest(head_ties - 1, 0)" +
          " AND n_headmid_thr >= n_headmid_rank" +
          " AND n_headmid_thr - n_headmid_rank <= greatest(mid_ties - 1, 0)"))
      .select("lang", "n_docs", "head_thr_micro", "mid_thr_micro",
        "n_head_rank", "n_head_thr", "head_ties",
        "n_headmid_rank", "n_headmid_thr", "mid_ties", "n_agree", "consistent")
      .orderBy("lang")
  }

  /** [[unigramSurprisal]]'s (CCNet tercile) deployed-threshold gate. Reads
    * the memoized bucket artifact twice (boundary calibration + the
    * threshold re-classification) — never re-tokenizes. */
  def ccnetDeployed(spark: SparkSession, dir: String): DataFrame =
    lmDeployedFrom(sharedUnigramBuckets(spark, dir))

  /** [[bigramSurprisal]]'s deployed-threshold gate. */
  def bigramDeployed(spark: SparkSession, dir: String): DataFrame =
    lmDeployedFrom(bigramSurprisal(spark, dir))

  /** [[trigramSurprisal]]'s deployed-threshold gate — the order-3 bucketer
    * carries the same calibration-side rank window as its lower-order
    * siblings, so it ships with the same certified threshold form from
    * day one (defined with the trigram family below). */
  def trigramDeployed(spark: SparkSession, dir: String): DataFrame =
    lmDeployedFrom(trigramSurprisal(spark, dir))

  /** The deployed CLASSIFY lineage alone, for plan audits: built from the
    * materialized bucket artifact, so its explain must show scan +
    * broadcast join only — any Window/Sort-per-language here would mean
    * the production path regressed to the calibration plan. */
  private[graft] def ccnetDeployedClassifyPlan(spark: SparkSession, dir: String): DataFrame = {
    val buckets = sharedUnigramBuckets(spark, dir)
    classifyByThreshold(buckets, lmThresholds(buckets))
  }

  /** The unigram LM FROZEN as one broadcastable row: a struct(lang, word) →
    * rarity_micro map ([[QualityClassifier.modelRow]]'s discipline —
    * vocab-bounded by Zipf, never corpus-sized). The side input the
    * streaming tercile gate scores against. The key is a STRUCT, not a
    * `lang|word` concat (ADVICE r14): the concat encoding was only
    * injective while `lang` never contained '|' — a collision would abort
    * `map_from_entries` (duplicate key) or silently mis-score under
    * LAST_WIN; the struct key is injective for any alphabet. */
  def lmModelRow(spark: SparkSession, dir: String): DataFrame = {
    val docTerm = StageMemo(spark, dir, "nb_docterm")(docTermTf(spark, dir))
    langRarityFrom(docTerm)
      .agg(map_from_entries(collect_list(struct(
        struct(col("lang"), col("word")).as("k"), col("rarity_micro")))).as("model"))
  }

  /** Per-language DEPLOYMENT side-table: the two frozen tercile boundaries
    * ([[lmThresholds]]'s cuts, calibrated from the rank policy) plus the
    * language's token total (the hapax-equivalent fallback mass a scorer
    * assigns to a word the model never saw: rarity = 10⁶·lang_tokens div 1,
    * i.e. frequency-1 treatment — the add-0 analog of the classifier's
    * unseen ratio). |languages| rows, broadcast. */
  def lmBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val docTerm = StageMemo(spark, dir, "nb_docterm")(docTermTf(spark, dir))
    val toks = docTerm.groupBy("lang").agg(sum("tf").as("lang_tokens"))
    lmThresholds(sharedUnigramBuckets(spark, dir))
      .join(toks, Seq("lang"))
      .select("lang", "head_thr_micro", "mid_thr_micro", "lang_tokens")
  }

  private def lmDeployedOracleFrom(surprisalOracle: String): String =
    s"""WITH b AS (
       |  SELECT lang, doc_id, score_micro, bucket FROM ($surprisalOracle) t
       |), thr AS (
       |  SELECT lang,
       |    max(CASE WHEN bucket = 'head' THEN score_micro END) AS head_thr_micro,
       |    max(CASE WHEN bucket != 'tail' THEN score_micro END) AS mid_thr_micro,
       |    CAST(sum(CASE WHEN bucket = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS n_head_rank,
       |    CAST(sum(CASE WHEN bucket != 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_headmid_rank
       |  FROM b GROUP BY lang
       |), cls AS (
       |  SELECT b.lang, b.score_micro, b.bucket,
       |    CASE WHEN b.score_micro <= t.head_thr_micro THEN 'head'
       |         WHEN b.score_micro <= t.mid_thr_micro THEN 'middle'
       |         ELSE 'tail' END AS bucket_thr,
       |    t.head_thr_micro, t.mid_thr_micro, t.n_head_rank, t.n_headmid_rank
       |  FROM b JOIN thr t USING (lang)
       |), agg AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    head_thr_micro, mid_thr_micro, n_head_rank,
       |    CAST(sum(CASE WHEN bucket_thr = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS n_head_thr,
       |    CAST(sum(CASE WHEN score_micro = head_thr_micro THEN 1 ELSE 0 END) AS BIGINT) AS head_ties,
       |    n_headmid_rank,
       |    CAST(sum(CASE WHEN bucket_thr != 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS n_headmid_thr,
       |    CAST(sum(CASE WHEN score_micro = mid_thr_micro THEN 1 ELSE 0 END) AS BIGINT) AS mid_ties,
       |    CAST(sum(CASE WHEN bucket = bucket_thr THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM cls
       |  GROUP BY lang, head_thr_micro, mid_thr_micro, n_head_rank, n_headmid_rank
       |)
       |SELECT lang, n_docs, head_thr_micro, mid_thr_micro,
       |  n_head_rank, n_head_thr, head_ties,
       |  n_headmid_rank, n_headmid_thr, mid_ties, n_agree,
       |  (n_head_thr >= n_head_rank
       |   AND n_head_thr - n_head_rank <= greatest(head_ties - 1, 0)
       |   AND n_headmid_thr >= n_headmid_rank
       |   AND n_headmid_thr - n_headmid_rank <= greatest(mid_ties - 1, 0)) AS consistent
       |FROM agg ORDER BY lang""".stripMargin

  val ccnetDeployedOracle: String = lmDeployedOracleFrom(unigramSurprisalOracle)
  val bigramDeployedOracle: String = lmDeployedOracleFrom(bigramSurprisalOracle)

  // --------------------------- trigram LM with stupid backoff (order-3)
  /** TRIGRAM (order-3) MODEL-QUALITY bucketing with STUPID BACKOFF
    * (Brants et al. 2007, "Large Language Models in Machine Translation"
    * §4; the model family CCNet's KenLM approximates at order 5) — the
    * next rung of the model-order ladder after [[bigramSurprisal]].
    * Backoff only means anything when the scorer can meet n-grams the
    * model never saw, so unlike the self-scored unigram/bigram forms this
    * one fits on the deterministic [[trainSplit]] 80% and scores the
    * HELD-OUT 20%: unseen trigrams in eval text genuinely fall through the
    * backoff chain. Score per trigram occurrence, exact integer micro
    * units (inv = 10⁶/S, α = 0.4 at each backoff step):
    *   level 0  c₁₂₃ > 0:  S = c₁₂₃/c₁₂        → inv = (10⁶·c₁₂) div c₁₂₃
    *   level 1  c₂₃ > 0:   S = 0.4·c₂₃/c₂      → inv = (25·10⁵·c₂) div c₂₃
    *   level 2  c₃ > 0:    S = 0.16·c₃/N_lang  → inv = (625·10⁴·N) div c₃
    *   level 3  unseen:    S = 0.064/N_lang    → inv = 15625·10³·N
    * All context counts derive from the ONE trigram count table
    * (c₁₂ = Σ_w₃ c₁₂₃, c₂₃ = Σ_w₁ c₁₂₃, …) so fit is a single corpus
    * pass; a doc's score is the tf-weighted mean inv (integral `div`) and
    * terciles cut per language with [[tercileBucketsOf]]. Docs in a
    * language with zero train docs are outside the model's domain and
    * excluded (inner join on the per-language total), as are docs with
    * fewer than 3 tokens.
    *
    * 100 TB shape: ONE (doc, trigram) tf shuffle memoized for fit and
    * scoring; every model table is n-gram-vocabulary-sized and joined
    * KEYED on its gram (never broadcast — the trigram vocab grows with
    * the corpus, the `lm` probe family's stress axis); only the
    * |languages|-row totals broadcast. The tercile window carries the
    * same calibration-side caveat as the other LM bucketers. */
  def trigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "lm_tri_buckets")(
      tercileBucketsOf(trigramDocScores(trigramScoredMemo(spark, dir))))
      .orderBy("doc_id")

  /** Un-checkpointed twin for plan audits ([[bigramSurprisalPlan]]). */
  private[graft] def trigramSurprisalPlan(spark: SparkSession, dir: String): DataFrame =
    tercileBucketsOf(trigramDocScores(trigramScoredOcc(docTriTf(spark, dir))))
      .orderBy("doc_id")

  private def docTriTf(spark: SparkSession, dir: String): DataFrame =
    // row-local trigram tf (r17, guide §2.3/§2.4 — the [[docTermTf]] move
    // at order 3): per-doc distinct (w1, w2, w3, tf) out of one row via
    // gram_tfs; the explode → groupBy(doc, w1, w2, w3) corpus exchange is
    // gone. spread (r16): single-split scan ⇒ one-core tokenize otherwise.
    graft.Fixtures.spread(table(spark, dir, "documents"))
      .withColumn("is_train", mixedHash("split|") % 100 < 80)
      .select(col("doc_id"), col("lang"), col("is_train"), words.as("ts"))
      .filter(size(col("ts")) >= 3)
      .select(col("doc_id"), col("lang"), col("is_train"),
        explode(graft.functions.VectorExpressions.gram_tfs(col("ts"), 3)).as("g"))
      .select(col("doc_id"), col("lang"), col("is_train"),
        col("g.w1").as("w1"), col("g.w2").as("w2"), col("g.w3").as("w3"),
        col("g.tf").as("tf"))
      .filter(col("w1") =!= "" && col("w2") =!= "" && col("w3") =!= "")

  /** Eval-side trigram occurrences with their backoff level and integer
    * inverse score attached — the memoized stage [[trigramSurprisal]] (doc
    * aggregate) and [[trigramBackoff]] (level mass) both read. */
  private def trigramScoredMemo(spark: SparkSession, dir: String): DataFrame = {
    val occ = StageMemo(spark, dir, "lm_tri_occ")(docTriTf(spark, dir))
    StageMemo(spark, dir, "lm_tri_scored")(trigramScoredOcc(occ))
  }

  // ProbeR16 accessors (dev-only): expose the lm_tri sub-builds for the
  // stage-charge decomposition probe without widening real visibility.
  private[operators] def docTriTfProbe(spark: SparkSession, dir: String): DataFrame =
    docTriTf(spark, dir)
  private[operators] def lmTriOccStage(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "lm_tri_occ")(docTriTf(spark, dir))
  private[operators] def lmTriScoredStage(spark: SparkSession, dir: String): DataFrame =
    trigramScoredMemo(spark, dir)

  private[operators] def trigramScoredOcc(triOcc: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // fit side: every context count reduces from the one trigram table
    // (prefix counts as windows over gram-vocab rows — the bigram c1
    // pattern; no second corpus pass)
    val t3 = triOcc.filter(col("is_train"))
      .groupBy("lang", "w1", "w2", "w3").agg(sum("tf").as("c123"))
      .withColumn("c12", sum("c123").over(Window.partitionBy("lang", "w1", "w2")))
    val b23 = t3.groupBy("lang", "w2", "w3").agg(sum("c123").as("c23"))
      .withColumn("c2", sum("c23").over(Window.partitionBy("lang", "w2")))
    val u3 = t3.groupBy("lang", "w3").agg(sum("c123").as("c3"))
    val nl = t3.groupBy("lang").agg(sum("c123").as("n_lang"))
    triOcc.filter(!col("is_train"))
      .join(t3, Seq("lang", "w1", "w2", "w3"), "left")
      .join(b23, Seq("lang", "w2", "w3"), "left")
      .join(u3, Seq("lang", "w3"), "left")
      .join(broadcast(nl), Seq("lang"))
      .withColumn("backoff_level",
        when(col("c123").isNotNull, 0L).when(col("c23").isNotNull, 1L)
          .when(col("c3").isNotNull, 2L).otherwise(3L))
      // level 0 implies c12 non-null (c12 = Σ_w3 c123 >= c123); widen every
      // product through DECIMAL(38,0) (10⁶·N_lang wraps int64 past ~9·10¹²
      // train tokens — the unigramSurprisal precedent)
      .withColumn("inv_micro",
        when(col("c123").isNotNull,
          expr("(CAST(1000000 AS DECIMAL(38,0)) * c12) div c123"))
          .when(col("c23").isNotNull,
            expr("(CAST(2500000 AS DECIMAL(38,0)) * c2) div c23"))
          .when(col("c3").isNotNull,
            expr("(CAST(6250000 AS DECIMAL(38,0)) * n_lang) div c3"))
          .otherwise(expr("CAST(CAST(15625000 AS DECIMAL(38,0)) * n_lang AS BIGINT)")))
      .select("doc_id", "lang", "tf", "backoff_level", "inv_micro")
  }

  private[operators] def trigramDocScores(scoredOcc: DataFrame): DataFrame =
    scoredOcc.groupBy("doc_id", "lang")
      .agg(sum("tf").as("n_trigrams"),
        expr("CAST(sum(CAST(tf AS DECIMAL(38,0)) * inv_micro) div sum(tf) AS BIGINT)")
          .as("score_micro"))
      .select("doc_id", "lang", "n_trigrams", "score_micro")

  /** BACKOFF-LEVEL MASS per language — how much of the held-out trigram
    * volume the order-3 model answered directly (level 0) vs handed down
    * the chain: the direct observable of whether the model order is
    * earning its vocabulary cost (a corpus where level 0 carries ~no mass
    * is telling you to ship the bigram model). Occurrence-weighted, exact
    * integer micro shares. */
  def trigramBackoff(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    trigramScoredMemo(spark, dir)
      .groupBy("lang", "backoff_level")
      .agg(sum("tf").as("n_occ"))
      // per-language totals over the ≤ 4·|languages|-row level table
      .withColumn("lang_occ", sum("n_occ").over(Window.partitionBy("lang")))
      .withColumn("share_micro",
        expr("(CAST(n_occ AS DECIMAL(38,0)) * 1000000) div lang_occ"))
      .select("lang", "backoff_level", "n_occ", "share_micro")
      .orderBy("lang", "backoff_level")
  }

  /** MODEL-ORDER AGREEMENT, order 2 vs 3 — [[lmOrderAgreement]] one rung
    * up: the 3×3 confusion between bigram and trigram terciles over the
    * trigram model's domain (held-out docs with ≥1 trigram in a language
    * the model saw). The off-diagonal mass is what the order upgrade
    * re-ranks — the measured case for (or against) the next order. */
  def lmOrderAgreement3(spark: SparkSession, dir: String): DataFrame = {
    val bi = bigramSurprisal(spark, dir)
      .select(col("doc_id"), col("bucket").as("bucket_bi"),
        col("score_micro").as("bi_micro"))
    val tri = trigramSurprisal(spark, dir)
      .select(col("doc_id"), col("bucket").as("bucket_tri"),
        col("score_micro").as("tri_micro"))
    bi.join(tri, "doc_id")
      .groupBy("bucket_bi", "bucket_tri")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(CAST(bi_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_bi_micro"),
        expr("CAST(sum(CAST(tri_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_tri_micro"))
      .orderBy("bucket_bi", "bucket_tri")
  }

  /** Shared oracle chain: split-tagged trigram occurrences → train-side
    * count tables → held-out occurrences scored down the backoff chain.
    * Mirrors the Spark side operation-for-operation (same hash split,
    * same α = 0.4 integer constants, same `//`). */
  private def trigramOracleChain: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS ts,
       |    (${splitHashSql("doc_id").linesIterator.mkString("\n|    ")}) < 80 AS is_train
       |  FROM documents
       |), tri AS (
       |  SELECT doc_id, lang, is_train, w1, w2, w3, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, lang, is_train, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |    FROM (SELECT doc_id, lang, is_train, ts,
       |            unnest(range(1, len(ts) - 1)) AS i FROM d))
       |  WHERE w1 <> '' AND w2 <> '' AND w3 <> ''
       |  GROUP BY doc_id, lang, is_train, w1, w2, w3
       |), t3 AS (
       |  SELECT lang, w1, w2, w3, CAST(sum(tf) AS BIGINT) AS c123
       |  FROM tri WHERE is_train GROUP BY lang, w1, w2, w3
       |), p12 AS (
       |  SELECT lang, w1, w2, CAST(sum(c123) AS BIGINT) AS c12 FROM t3 GROUP BY lang, w1, w2
       |), b23 AS (
       |  SELECT lang, w2, w3, CAST(sum(c123) AS BIGINT) AS c23 FROM t3 GROUP BY lang, w2, w3
       |), p2 AS (
       |  SELECT lang, w2, CAST(sum(c23) AS BIGINT) AS c2 FROM b23 GROUP BY lang, w2
       |), u3 AS (
       |  SELECT lang, w3, CAST(sum(c123) AS BIGINT) AS c3 FROM t3 GROUP BY lang, w3
       |), nl AS (
       |  SELECT lang, CAST(sum(c123) AS BIGINT) AS n_lang FROM t3 GROUP BY lang
       |), scored_occ AS (
       |  SELECT e.doc_id, e.lang, e.tf,
       |    CASE WHEN t3.c123 IS NOT NULL THEN 0
       |         WHEN b23.c23 IS NOT NULL THEN 1
       |         WHEN u3.c3 IS NOT NULL THEN 2
       |         ELSE 3 END AS backoff_level,
       |    CASE WHEN t3.c123 IS NOT NULL
       |           THEN (CAST(1000000 AS HUGEINT) * p12.c12) // t3.c123
       |         WHEN b23.c23 IS NOT NULL
       |           THEN (CAST(2500000 AS HUGEINT) * p2.c2) // b23.c23
       |         WHEN u3.c3 IS NOT NULL
       |           THEN (CAST(6250000 AS HUGEINT) * nl.n_lang) // u3.c3
       |         ELSE CAST(15625000 AS HUGEINT) * nl.n_lang
       |    END AS inv_micro
       |  FROM (SELECT * FROM tri WHERE NOT is_train) e
       |  JOIN nl ON nl.lang = e.lang
       |  LEFT JOIN t3 ON t3.lang = e.lang AND t3.w1 = e.w1 AND t3.w2 = e.w2 AND t3.w3 = e.w3
       |  LEFT JOIN p12 ON p12.lang = e.lang AND p12.w1 = e.w1 AND p12.w2 = e.w2
       |  LEFT JOIN b23 ON b23.lang = e.lang AND b23.w2 = e.w2 AND b23.w3 = e.w3
       |  LEFT JOIN p2 ON p2.lang = e.lang AND p2.w2 = e.w2
       |  LEFT JOIN u3 ON u3.lang = e.lang AND u3.w3 = e.w3
       |), tri_scored AS (
       |  SELECT doc_id, lang, CAST(sum(tf) AS BIGINT) AS n_trigrams,
       |    CAST(sum(CAST(tf AS HUGEINT) * inv_micro) // sum(tf) AS BIGINT) AS score_micro
       |  FROM scored_occ GROUP BY doc_id, lang
       |)""".stripMargin

  // def: composes trigramOracleChain (itself built from mixedHashSql)
  def trigramSurprisalOracle: String =
    s"""$trigramOracleChain, ranked AS (
       |  SELECT doc_id, lang, n_trigrams, score_micro,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY score_micro, doc_id) AS BIGINT) AS rnk,
       |    count(*) OVER (PARTITION BY lang) AS n_lang
       |  FROM tri_scored
       |)
       |SELECT doc_id, lang, n_trigrams, score_micro,
       |  CASE WHEN rnk * 10 <= n_lang * 3 THEN 'head'
       |       WHEN rnk * 10 <= n_lang * 7 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM ranked ORDER BY doc_id""".stripMargin

  // def: composes trigramSurprisalOracle (itself a def)
  def trigramDeployedOracle: String = lmDeployedOracleFrom(trigramSurprisalOracle)

  def trigramBackoffOracle: String =
    s"""$trigramOracleChain, lvl AS (
       |  SELECT lang, CAST(backoff_level AS BIGINT) AS backoff_level,
       |    CAST(sum(tf) AS BIGINT) AS n_occ
       |  FROM scored_occ GROUP BY lang, backoff_level
       |)
       |SELECT lang, backoff_level, n_occ,
       |  CAST((CAST(n_occ AS HUGEINT) * 1000000)
       |    // (sum(n_occ) OVER (PARTITION BY lang)) AS BIGINT) AS share_micro
       |FROM lvl ORDER BY lang, backoff_level""".stripMargin

  def lmOrderAgreement3Oracle: String =
    s"""WITH bi AS (
       |  SELECT doc_id, bucket AS bucket_bi, score_micro AS bi_micro
       |  FROM ($bigramSurprisalOracle) t
       |), tri3 AS (
       |  SELECT doc_id, bucket AS bucket_tri, score_micro AS tri_micro
       |  FROM ($trigramSurprisalOracle) t
       |)
       |SELECT bucket_bi, bucket_tri,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(bi_micro AS HUGEINT)) // count(*) AS BIGINT) AS mean_bi_micro,
       |  CAST(sum(CAST(tri_micro AS HUGEINT)) // count(*) AS BIGINT) AS mean_tri_micro
       |FROM bi JOIN tri3 USING (doc_id)
       |GROUP BY bucket_bi, bucket_tri
       |ORDER BY bucket_bi, bucket_tri""".stripMargin

  // ----------------------------------- target-domain affinity (DSIR-shaped)
  /** DSIR-shaped TARGET-DOMAIN data selection (Xie et al. 2023,
    * arXiv:2302.03169): score every raw document by how much its hashed
    * n-gram feature distribution looks like a curated TARGET sample, the
    * step that picks "Wikipedia-like" documents out of a web crawl. Here
    * the target is the `src0` source, features are character bigrams, and
    * the importance signal is feature LIFT in exact integer micro-units:
    * `lift_micro(f) = ((tgt(f)+1) · 10⁶ · (raw_total+V)) div
    * ((raw(f)+1) · (tgt_total+V))` (add-one smoothing over the V observed
    * features; wide-integer product so the intermediate never wraps). A
    * raw doc's affinity is the micro-fraction of its bigram OCCURRENCES
    * that land in the over-represented feature set (lift > 10⁶) — the
    * integer-exact stand-in for DSIR's summed log-ratios, monotone in the
    * same direction.
    *
    * 100 TB shape: the feature space is BOUNDED (char bigrams ≤ charset²;
    * DSIR itself hashes into 10⁴ buckets), so the per-feature count/lift
    * table broadcasts at ANY corpus scale — two linear scans, the DSIR
    * minimum (fit the lift table, then score), zero corpus-sized shuffles
    * beyond the per-doc regroup. The corpus-side explode is compressed to
    * a (doc, bigram) tf table before anything joins it, and the fit
    * side's totals come from a WINDOW over the feature-bounded counts
    * table — same lineage, so the explode is NOT recomputed a third time
    * for a totals broadcast (measured: 5.2 s → the 2-pass form below at
    * sf0.1; the unpartitioned window is safe HERE precisely because its
    * input is ≤ charset² rows, never corpus-sized). */
  def targetAffinity(spark: SparkSession, dir: String): DataFrame =
    targetAffinityImpl(spark, dir, materialize = true)

  /** Un-materialized twin for the PLANS.md audit (full tf lineage). */
  private[graft] def targetAffinityPlan(spark: SparkSession, dir: String): DataFrame =
    targetAffinityImpl(spark, dir, materialize = false)

  private def targetAffinityImpl(spark: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // spread (r16): single-split scan ⇒ one-core explode otherwise; lazy
    // checkpoint because the fit branch (counts) AND the scoring branch
    // both read the tf table — Spark has no cross-branch CSE, so the
    // corpus explode+group otherwise runs twice (the batch-4 finding)
    val docTf0 = graft.Fixtures.spread(table(spark, dir, "documents"))
      .filter(length(col("text")) >= 2)
      // codepoint split + row-local pair concat (r16) — the
      // [[charBigrams]] rewrite: kills the O(len²) substring scans and
      // the text column carried through the Generate
      .select(col("doc_id"), col("source"), split(col("text"), "").as("cs"))
      // row-local char-bigram tf (r17 — the [[docTermTf]] gram_tfs move):
      // per-doc counts out of one row, no corpus (doc, bigram) exchange.
      // (w1, w2) ↔ concat(w1, w2) is bijective here because split('') emits
      // exactly one codepoint per element, so the counts are identical.
      .select(col("doc_id"), col("source"),
        explode(graft.functions.VectorExpressions.gram_tfs(col("cs"), 2)).as("g"))
      .select(col("doc_id"), col("source"),
        concat(col("g.w1"), col("g.w2")).as("bigram"), col("g.tf").as("tf"))
    val docTf = if (materialize) docTf0.localCheckpoint(false) else docTf0
    val counts = docTf
      .groupBy("bigram")
      .agg(
        sum(when(col("source") === "src0", col("tf")).otherwise(0L)).as("tgt_cnt"),
        sum(when(col("source") =!= "src0", col("tf")).otherwise(0L)).as("raw_cnt"))
    val w = Window.partitionBy() // bounded: the counts table, not the corpus
    val highLift = counts
      .withColumn("tgt_total", sum("tgt_cnt").over(w))
      .withColumn("raw_total", sum("raw_cnt").over(w))
      .withColumn("v", count(lit(1)).over(w))
      .withColumn("lift_micro",
        expr("""CAST((CAST(tgt_cnt + 1 AS DECIMAL(38,0)) * 1000000 * (raw_total + v))
               | div (CAST(raw_cnt + 1 AS DECIMAL(38,0)) * (tgt_total + v)) AS BIGINT)""".stripMargin))
      .filter(col("lift_micro") > 1000000L)
      .select("bigram")
    docTf.filter(col("source") =!= "src0")
      .join(broadcast(highLift).withColumn("hl", lit(1L)), Seq("bigram"), "left")
      .groupBy("doc_id", "source")
      .agg(sum("tf").as("n_bigrams"),
        sum(when(col("hl").isNotNull, col("tf")).otherwise(0L)).as("n_high_lift"))
      .withColumn("affinity_micro", expr("(n_high_lift * 1000000) div n_bigrams"))
      .select("doc_id", "source", "n_bigrams", "n_high_lift", "affinity_micro")
      .orderBy("doc_id")
  }

  val targetAffinityOracle: String =
    """WITH grams AS (
      |  SELECT doc_id, source, substring(text, CAST(i AS INTEGER), 2) AS bigram
      |  FROM (SELECT doc_id, source, text, unnest(generate_series(1, length(text) - 1)) AS i
      |        FROM documents WHERE length(text) >= 2)
      |), counts AS (
      |  SELECT bigram,
      |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS tgt_cnt,
      |    CAST(sum(CASE WHEN source != 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS raw_cnt
      |  FROM grams GROUP BY bigram
      |), totals AS (
      |  SELECT CAST(sum(tgt_cnt) AS BIGINT) AS tgt_total,
      |         CAST(sum(raw_cnt) AS BIGINT) AS raw_total,
      |         count(*) AS v
      |  FROM counts
      |), hl AS (
      |  SELECT bigram FROM counts CROSS JOIN totals
      |  WHERE CAST((CAST(tgt_cnt + 1 AS HUGEINT) * 1000000 * (raw_total + v))
      |        // (CAST(raw_cnt + 1 AS HUGEINT) * (tgt_total + v)) AS BIGINT) > 1000000
      |)
      |SELECT g.doc_id, g.source,
      |  count(*) AS n_bigrams,
      |  CAST(sum(CASE WHEN h.bigram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_high_lift,
      |  CAST((sum(CASE WHEN h.bigram IS NOT NULL THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS affinity_micro
      |FROM grams g LEFT JOIN hl h ON h.bigram = g.bigram
      |WHERE g.source != 'src0'
      |GROUP BY g.doc_id, g.source
      |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------------- training manifest
  /** The FINAL TRAINING MANIFEST — the text-side analog of
    * [[Dedup.dedupFunnel]]: one row per raw document with every keep/drop
    * decision the pipeline made about it, composed from the SAME gated
    * operators a user runs piecemeal — near-dup keep-list survivor
    * ([[Dedup.dedupKeepList]]), per-source quality pruning
    * ([[qualityPrune]]), CCNet tercile ([[unigramSurprisal]], tail
    * dropped), the TRAINED classifier's verdict
    * ([[QualityClassifier.perDocScores]] under the engine's decision rule
    * `score_micro > [[QualityClassifier.DecisionMicro]]` — the
    * distill-then-deploy loop closed: the model the terciles trained now
    * votes on admission alongside them), and (round 15, gate #5) the
    * PARAGRAPH boilerplate screen ([[paragraphDedup]]'s keep — cut when
    * more than half a doc's blocks are cross-document duplicates) — and
    * the conjunction `final_keep`. This is the table the actual
    * training-shard write filters on, and the audit trail for "why is
    * doc X (not) in the run".
    *
    * 100 TB shape: five equi-joins of per-doc decision tables (8-16 B
    * keys + flags) onto the corpus projection — each input is itself
    * scale-audited, the classifier score reads the SAME memoized
    * tokenize-once artifact the tercile side built, and the paragraph
    * verdict is the memoized [[sharedParagraphVerdicts]] stage the gated
    * `text_paragraph_dedup` row also reads (ONE segmentation pass serves
    * both). The manifest
    * MATERIALIZES once per (session, dir) via [[StageMemo]] — it is the
    * table a production run writes to disk, and both gated consumers
    * (this query and [[manifestRollup]]) read the same build instead of
    * re-running the quality/surprisal corpus scans. */
  private def buildTrainingManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents").select("doc_id", "lang", "source")
    val dedupKeep = Dedup.dedupKeepList(spark, dir)
      .select(col("doc_id"), (col("keep") === 1L).as("keep_dedup"))
    val quality = qualityPrune(spark, dir)
      .select(col("doc_id"), col("keep").as("keep_quality"))
    val buckets = unigramSurprisal(spark, dir)
      .select(col("doc_id"), col("bucket"))
    val classifier = QualityClassifier.perDocScores(spark, dir)
      .select(col("doc_id"), (col("score_micro") > QualityClassifier.DecisionMicro).as("keep_classifier"))
    val paragraph = sharedParagraphVerdicts(spark, dir)
      .select(col("doc_id"), col("keep").as("keep_paragraph"))
    docs
      .join(dedupKeep, "doc_id")
      .join(quality, "doc_id")
      // LEFT: a token-less doc produces no surprisal row (its words all
      // filter out) but must still get a manifest row — it lands in tail
      // (dropped WITH an audit trail, never silently vanished)
      .join(buckets, Seq("doc_id"), "left")
      // LEFT for the same reason: no tokens → no classifier score → the
      // model abstains and the gate is a drop vote
      .join(classifier, Seq("doc_id"), "left")
      // LEFT, but abstain-to-KEEP (round 15, gate #5): a doc shorter than
      // one full block yields no paragraph row — the boilerplate screen
      // has NO duplication evidence against it, so it must not vote to
      // drop (contrast the classifier above: having no tokens IS a
      // quality signal; having no full 8-word block is not a duplication
      // signal — short docs are already the bucket/classifier gates' job)
      .join(paragraph, Seq("doc_id"), "left")
      .withColumn("bucket", coalesce(col("bucket"), lit("tail")))
      .withColumn("keep_bucket", col("bucket") =!= "tail")
      .withColumn("keep_classifier", coalesce(col("keep_classifier"), lit(false)))
      .withColumn("keep_paragraph", coalesce(col("keep_paragraph"), lit(true)))
      .withColumn("final_keep",
        col("keep_dedup") && col("keep_quality") && col("keep_bucket") &&
          col("keep_classifier") && col("keep_paragraph"))
      .select("doc_id", "lang", "source", "keep_dedup", "keep_quality",
        "bucket", "keep_bucket", "keep_classifier", "keep_paragraph", "final_keep")
  }

  private def sharedManifest(spark: SparkSession, dir: String): DataFrame =
    StageMemo(spark, dir, "training_manifest")(buildTrainingManifest(spark, dir))

  def trainingManifest(spark: SparkSession, dir: String): DataFrame =
    sharedManifest(spark, dir).orderBy("doc_id")

  // def: composes Dedup.dedupKeepListOracle (itself a def)
  def trainingManifestOracle: String =
    s"""WITH keep_list AS (
       |  SELECT * FROM (
       |${Dedup.dedupKeepListOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) kl
       |), quality AS (
       |  SELECT * FROM (
       |${qualityPruneOracle().linesIterator.map("    " + _).mkString("\n")}
       |  ) qp
       |), buckets AS (
       |  SELECT * FROM (
       |${unigramSurprisalOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) bk
       |), nbsc AS (
       |  SELECT * FROM (
       |${QualityClassifier.perDocScoresOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) sc
       |), para AS (
       |  SELECT * FROM (
       |${paragraphDedupOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) pg
       |)
       |SELECT d.doc_id, d.lang, d.source,
       |  k.keep = 1 AS keep_dedup,
       |  q.keep AS keep_quality,
       |  coalesce(b.bucket, 'tail') AS bucket,
       |  coalesce(b.bucket, 'tail') != 'tail' AS keep_bucket,
       |  coalesce(n.score_micro > ${QualityClassifier.DecisionMicro}, FALSE) AS keep_classifier,
       |  coalesce(p.keep, TRUE) AS keep_paragraph,
       |  (k.keep = 1 AND q.keep AND coalesce(b.bucket, 'tail') != 'tail'
       |   AND coalesce(n.score_micro > ${QualityClassifier.DecisionMicro}, FALSE)
       |   AND coalesce(p.keep, TRUE)) AS final_keep
       |FROM documents d
       |JOIN keep_list k ON k.doc_id = d.doc_id
       |JOIN quality q ON q.doc_id = d.doc_id
       |LEFT JOIN buckets b ON b.doc_id = d.doc_id
       |LEFT JOIN nbsc n ON n.doc_id = d.doc_id
       |LEFT JOIN para p ON p.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------- manifest per-source rollup
  /** PER-SOURCE rollup of the [[trainingManifest]] with token accounting —
    * the first report an operator reads after a pipeline run ("what did
    * cleaning cut, and from whom"), and the cleaned-corpus totals that
    * [[mixtureBudget]] should be fed at the next stage. Exact integer
    * micro-share of tokens surviving per source.
    *
    * 100 TB shape: one join of the manifest (flags + 8 B keys) to a
    * (doc, token-count) projection, then a |sources|-row aggregate —
    * partial+final, four long accumulators per group. The micro-share
    * product widens through DECIMAL(38,0) before the floor division:
    * a dominant source passes ~10¹³ tokens and `tokens_kept · 10⁶`
    * would wrap int64 (the tfidf/pagerank widening precedent). */
  def manifestRollup(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), sz(words).as("n_tokens"))
    sharedManifest(spark, dir)
      .select("doc_id", "source", "final_keep")
      .join(toks, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("final_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum("n_tokens").as("tokens_total"),
        sum(when(col("final_keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
      .withColumn("kept_micro",
        expr("(CAST(tokens_kept AS DECIMAL(38,0)) * 1000000) div tokens_total"))
      .select("source", "n_docs", "n_kept", "tokens_total", "tokens_kept", "kept_micro")
      .orderBy("source")
  }

  // def: composes trainingManifestOracle (itself a def)
  def manifestRollupOracle: String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
       |)
       |SELECT m.source,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN m.final_keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(t.n_tokens) AS BIGINT) AS tokens_total,
       |  CAST(sum(CASE WHEN m.final_keep THEN t.n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept,
       |  CAST((sum(CASE WHEN m.final_keep THEN t.n_tokens ELSE 0 END) * 1000000)
       |       // sum(t.n_tokens) AS BIGINT) AS kept_micro
       |FROM manifest m JOIN toks t ON t.doc_id = m.doc_id
       |GROUP BY m.source
       |ORDER BY m.source""".stripMargin

  // ------------------------------------------- training shard WRITE (e2e)
  /** END-TO-END TRAINING-SET MATERIALIZATION — the pipeline's product
    * artifact, actually WRITTEN (VERDICT r7 #2): [[trainingManifest]] →
    * keep only `final_keep` docs → deterministic shuffle-shard
    * ([[shuffleShards]]' mixedHash permutation, ranked over the KEPT set)
    * → per-shard sequence packing ([[packSequences]]' running offsets, per
    * shard in shuffled order — the order a trainer reads) → Hive-
    * partitioned parquet under `shard=N/` directories
    * ([[graft.sources.TableSources.writePartitioned]]).
    *
    * 100 TB shape: the text payload crosses exactly ONE shuffle — the
    * per-shard window partitioning, which IS the partitioning the
    * directory-per-shard write needs; rank and running offset share a
    * single window spec (one Exchange + one Sort). Everything upstream
    * (manifest flags, shard keys) moves 8-16 B keys. The write is an
    * EAGER action at DataFrame-construction time by design — the gated
    * query's line owns the write cost, the [[Dedup]] build-attribution
    * precedent. */
  private def trainingSet(spark: SparkSession, dir: String,
      nShards: Int, window: Int): DataFrame =
    trainingSetOf(spark, dir,
      sharedManifest(spark, dir).filter(col("final_keep")).select("doc_id"),
      nShards, window)

  /** [[trainingSet]] over an arbitrary keep set — the release-candidate
    * write ([[pipelineReleaseDiffE2e]]) ships a different keep rule
    * through the IDENTICAL shard/pack path. */
  private def trainingSetOf(spark: SparkSession, dir: String, kept: DataFrame,
      nShards: Int, window: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shard/pos come from the SHARED [[shardKeyed]] policy (the same
    // derivation the gated docs_shuffle_shards row checks); the running
    // token sum rides the same (skey, doc_id) window order, so pos and
    // stream_end fold into a single Exchange + Sort
    val w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    shardKeyed(table(spark, dir, "documents").join(kept, "doc_id"), nShards)
      .withColumn("tokens", sz(words))
      .withColumn("stream_end",
        sum(col("tokens")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("stream_offset", col("stream_end") - col("tokens"))
      .withColumn("window_id", expr(s"stream_offset div $window"))
      .select("doc_id", "lang", "source", "text", "shard", "pos",
        "tokens", "stream_offset", "window_id")
  }

  /** Deterministic per-corpus output path (tmpdir-keyed by the data dir,
    * so concurrent SFs never collide and a rerun overwrites in place). */
  def shardWritePath(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_train_shards_$h"
  }

  /** Runs the write; returns the output path. Overwrite-mode, so reruns
    * replace the artifact — [[TrainShardWriteSpec]] pins bit-identical
    * rerun content. Since round 11 the write also emits the PER-SHARD
    * MANIFEST beside the data ([[shardManifestPath]]) — see
    * [[shardManifest]]. */
  def shardWrite(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): String = {
    val out = shardWritePath(dir)
    graft.sources.TableSources.writePartitioned(
      trainingSet(spark, dir, nShards, window), out, Seq("shard"))
    shardSummary(spark, out, window).coalesce(1)
      .write.mode("overwrite").parquet(shardManifestPath(dir))
    out
  }

  /** Manifest sidecar path (beside the shard artifact). */
  def shardManifestPath(dir: String): String = shardWritePath(dir) + "_manifest"

  /** The per-shard summary the write emits, computed from the files AS
    * WRITTEN (read-back, not the pre-write plan): docs / tokens / packed
    * windows, lang+source cardinalities, the shortest doc, residual exact
    * text duplicates (0 if upstream dedup held), and the order+content
    * hash. Texts are md5'd to 16 B BEFORE the multi-distinct aggregate so
    * the Expand the three count-distincts need replicates narrow rows,
    * never the payload. */
  private def shardSummary(spark: SparkSession, out: String, window: Int): DataFrame =
    spark.read.parquet(out)
      .select(col("shard").cast("bigint").as("shard"),
        col("tokens"), col("lang"), col("source"),
        md5(col("text")).as("th"),
        mixedHashOf("sw|", concat_ws("|",
          col("doc_id"), col("pos"), col("stream_offset"), col("text"))).as("h"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("n_tokens"),
        expr(s"(sum(tokens) + ${window - 1}) div $window").as("n_windows"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("tokens")).as("min_tokens"),
        (count(lit(1)) - countDistinct(col("th"))).as("n_dup_texts"),
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 1000000007 AS BIGINT)").as("content_hash"))

  /** PER-SHARD MANIFEST, GATED (VERDICT r10 #7): runs the write, then
    * returns the manifest parquet the write left beside the artifact —
    * the summary a downstream trainer/loader reads INSTEAD of scanning the
    * shards (doc/token/window counts for scheduling, lang/source
    * cardinalities and residual-duplicate count for sanity, the content
    * hash for change detection). The oracle recomputes every column from
    * the raw tables through the full keep→shard→pack composition, so a
    * manifest that disagrees with its own artifact cannot pass.
    *
    * 100 TB shape: one extra pass over the just-written artifact (narrow
    * projection: the text contributes only its md5 and row hash), output
    * is nShards rows — the standard write-then-validate tax, and the
    * manifest is exactly what makes later pipeline stages NOT re-scan the
    * data to answer "what's in shard 5". */
  def shardManifest(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame = {
    shardWrite(spark, dir, nShards, window)
    spark.read.parquet(shardManifestPath(dir)).orderBy("shard")
  }

  // def: composes trainingManifestOracle (itself a def)
  def shardManifestOracle(nShards: Int = 8, window: Int = 2048): String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), kept AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source FROM documents d
       |  JOIN manifest mm ON mm.doc_id = d.doc_id WHERE mm.final_keep
       |), hashed AS (
       |  SELECT doc_id, text, lang, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    ${mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
       |  FROM kept
       |), sharded AS (
       |  SELECT *, skey % $nShards AS shard,
       |    CAST(row_number() OVER (PARTITION BY skey % $nShards ORDER BY skey, doc_id) AS BIGINT) AS pos
       |  FROM hashed
       |), packed AS (
       |  SELECT *, CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
       |    ROWS UNBOUNDED PRECEDING) - tokens AS BIGINT) AS stream_offset
       |  FROM sharded
       |), rows_h AS (
       |  SELECT shard, tokens, lang, source, text,
       |    ${mixedHashSql("sw|",
             "CAST(doc_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR) || '|' || " +
             "CAST(stream_offset AS VARCHAR) || '|' || text").linesIterator.mkString("\n|    ")} AS h
       |  FROM packed
       |)
       |SELECT shard, count(*) AS n_docs,
       |  CAST(sum(tokens) AS BIGINT) AS n_tokens,
       |  CAST((sum(tokens) + ${window - 1}) // $window AS BIGINT) AS n_windows,
       |  count(DISTINCT lang) AS n_langs,
       |  count(DISTINCT source) AS n_sources,
       |  CAST(min(tokens) AS BIGINT) AS min_tokens,
       |  count(*) - count(DISTINCT text) AS n_dup_texts,
       |  CAST(sum(h) % 1000000007 AS BIGINT) AS content_hash
       |FROM rows_h GROUP BY shard ORDER BY shard""".stripMargin

  // ----------------------------------------------- shard balance report
  /** SHARD-BALANCE rollup (round 11) — the straggler predictor a trainer
    * reads off the [[shardManifest]] sidecar before launching a run: a
    * data-parallel epoch's step count is gated by the HEAVIEST shard, so
    * the permille ratios `max·n_shards·1000 / total` for tokens and packed
    * windows (1000 = perfectly balanced) price the idle time every other
    * rank pays. `windows_imbalance_permille` is the operative one — steps
    * are windows — and crossing ~1100 is the standard re-shard trigger.
    *
    * 100 TB shape: reads the n_shards-row manifest the write already
    * emitted — NOT the shards — so the report is O(n_shards) regardless of
    * corpus size; the ratio products widen through DECIMAL(38,0) before
    * the floor division (10¹³ tokens × 10⁴ shards × 10³ would wrap
    * int64). The write itself is owned by the gated manifest line. */
  def shardBalance(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame =
    shardManifest(spark, dir, nShards, window)
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n_docs")).as("docs_total"),
        sum(col("n_tokens")).as("tokens_total"),
        min(col("n_tokens")).as("tokens_min_shard"),
        max(col("n_tokens")).as("tokens_max_shard"),
        sum(col("n_windows")).as("windows_total"),
        max(col("n_windows")).as("windows_max_shard"))
      .selectExpr(
        """stack(8,
          |  'n_shards', n_shards,
          |  'docs_total', docs_total,
          |  'tokens_total', tokens_total,
          |  'tokens_min_shard', tokens_min_shard,
          |  'tokens_max_shard', tokens_max_shard,
          |  'tokens_imbalance_permille',
          |  CAST((CAST(tokens_max_shard AS DECIMAL(38,0)) * n_shards * 1000)
          |       div tokens_total AS BIGINT),
          |  'windows_total', windows_total,
          |  'windows_imbalance_permille',
          |  CAST((CAST(windows_max_shard AS DECIMAL(38,0)) * n_shards * 1000)
          |       div windows_total AS BIGINT)
          |) AS (metric, value)""".stripMargin)
      .orderBy("metric")

  // def: composes shardManifestOracle (itself a def)
  def shardBalanceOracle(nShards: Int = 8, window: Int = 2048): String =
    s"""WITH shards AS (
       |  SELECT * FROM (
       |${shardManifestOracle(nShards, window).linesIterator.map("    " + _).mkString("\n")}
       |  ) s
       |), t AS (
       |  SELECT count(*) AS n_shards,
       |    CAST(sum(n_docs) AS BIGINT) AS docs_total,
       |    CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       |    CAST(min(n_tokens) AS BIGINT) AS tokens_min_shard,
       |    CAST(max(n_tokens) AS BIGINT) AS tokens_max_shard,
       |    CAST(sum(n_windows) AS BIGINT) AS windows_total,
       |    CAST(max(n_windows) AS BIGINT) AS windows_max_shard
       |  FROM shards
       |)
       |SELECT metric, value FROM (
       |  SELECT 'n_shards' AS metric, n_shards AS value FROM t
       |  UNION ALL SELECT 'docs_total', docs_total FROM t
       |  UNION ALL SELECT 'tokens_total', tokens_total FROM t
       |  UNION ALL SELECT 'tokens_min_shard', tokens_min_shard FROM t
       |  UNION ALL SELECT 'tokens_max_shard', tokens_max_shard FROM t
       |  UNION ALL SELECT 'tokens_imbalance_permille',
       |    CAST((CAST(tokens_max_shard AS HUGEINT) * n_shards * 1000)
       |         // tokens_total AS BIGINT) FROM t
       |  UNION ALL SELECT 'windows_total', windows_total FROM t
       |  UNION ALL SELECT 'windows_imbalance_permille',
       |    CAST((CAST(windows_max_shard AS HUGEINT) * n_shards * 1000)
       |         // windows_total AS BIGINT) FROM t
       |) ORDER BY metric""".stripMargin

  // ----------------------------------------------- shard rebalance plan
  /** SHARD REBALANCE PLAN (round 11) — the actionable follow-on to
    * [[shardBalance]]'s diagnosis: per shard, its token share as an exact
    * permille of the balanced mean and the ACTION the rewrite job takes —
    * `split` past 1.2× the mean (the straggler), `merge` below 0.8× (the
    * under-filled rank), `ok` otherwise. Thresholds compare as pure
    * integer cross-products (`tokens·n·5 ≷ total·6 / total·4`), so the
    * plan is bit-identical on any engine and idempotent run-to-run — the
    * property a scheduled compaction job needs.
    *
    * 100 TB shape: O(n_shards) like the balance report — the 1-row totals
    * aggregate broadcasts back over the n_shards-row manifest; products
    * widen through DECIMAL(38,0) before comparison (10¹³ tokens × 10⁴
    * shards × 5 nears int64). */
  def shardRebalance(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame = {
    val m = shardManifest(spark, dir, nShards, window).select("shard", "n_tokens")
    val totals = m.agg(count(lit(1)).as("n_shards"),
      sum(col("n_tokens")).as("tokens_total"))
    m.crossJoin(broadcast(totals))
      .withColumn("tokens_ratio_permille",
        expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) * n_shards * 1000) div tokens_total AS BIGINT)"))
      .withColumn("action",
        when(expr("CAST(n_tokens AS DECIMAL(38,0)) * n_shards * 5 > CAST(tokens_total AS DECIMAL(38,0)) * 6"), "split")
          .when(expr("CAST(n_tokens AS DECIMAL(38,0)) * n_shards * 5 < CAST(tokens_total AS DECIMAL(38,0)) * 4"), "merge")
          .otherwise("ok"))
      .select("shard", "n_tokens", "tokens_ratio_permille", "action")
      .orderBy("shard")
  }

  // def: composes shardManifestOracle (itself a def)
  def shardRebalanceOracle(nShards: Int = 8, window: Int = 2048): String =
    s"""WITH shards AS (
       |  SELECT * FROM (
       |${shardManifestOracle(nShards, window).linesIterator.map("    " + _).mkString("\n")}
       |  ) s
       |), t AS (
       |  SELECT count(*) AS n_shards, CAST(sum(n_tokens) AS BIGINT) AS tokens_total
       |  FROM shards
       |)
       |SELECT s.shard, s.n_tokens,
       |  CAST((CAST(s.n_tokens AS HUGEINT) * t.n_shards * 1000) // t.tokens_total AS BIGINT)
       |    AS tokens_ratio_permille,
       |  CASE WHEN CAST(s.n_tokens AS HUGEINT) * t.n_shards * 5 > CAST(t.tokens_total AS HUGEINT) * 6
       |       THEN 'split'
       |       WHEN CAST(s.n_tokens AS HUGEINT) * t.n_shards * 5 < CAST(t.tokens_total AS HUGEINT) * 4
       |       THEN 'merge'
       |       ELSE 'ok' END AS action
       |FROM shards s CROSS JOIN t
       |ORDER BY s.shard""".stripMargin

  /** The GATE on the written artifact: write, then READ BACK the parquet
    * and report per-shard docs / packed windows / tokens / an order- and
    * content-sensitive hash — compared against DuckDB recomputing the
    * same composition from the raw tables. A dropped row, a wrong shard
    * assignment, a scrambled pack order, or a corrupted text all move the
    * hash; the artifact itself is what's checked, not the plan that
    * produced it. */
  def shardWriteGate(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame = {
    val out = shardWrite(spark, dir, nShards, window)
    spark.read.parquet(out)
      // partition-column inference reads `shard=N` paths back as int
      .select(col("shard").cast("bigint").as("shard"), col("doc_id"),
        col("pos"), col("tokens"), col("stream_offset"), col("window_id"), col("text"))
      .withColumn("h", mixedHashOf("sw|",
        concat_ws("|", col("doc_id"), col("pos"), col("stream_offset"), col("text"))))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        // offsets are contiguous prefix sums from 0, so the packed stream
        // covers exactly [0, Σtokens) and the window count is
        // ceil(Σtokens/window). (NOT max(window_id)+1: window_id is the
        // window holding the doc's START, so a final doc that crosses a
        // boundary — any doc longer than `window` can cross several —
        // under-counts the tail windows it spills into.)
        expr(s"(sum(tokens) + ${window - 1}) div $window").as("n_windows"),
        sum(col("tokens")).as("n_tokens"),
        // per-row hashes < 1e9 but a 100 TB shard holds ~1e12 rows — widen
        // the sum through DECIMAL(38,0) before the modulus (tfidf precedent)
        expr("CAST(sum(CAST(h AS DECIMAL(38,0))) % 1000000007 AS BIGINT)").as("content_hash"))
      .orderBy("shard")
  }

  // def: composes trainingManifestOracle (itself a def)
  def shardWriteOracle(nShards: Int = 8, window: Int = 2048): String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), kept AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN manifest mm ON mm.doc_id = d.doc_id WHERE mm.final_keep
       |), hashed AS (
       |  SELECT doc_id, text,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    ${mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
       |  FROM kept
       |), sharded AS (
       |  SELECT *, skey % $nShards AS shard,
       |    CAST(row_number() OVER (PARTITION BY skey % $nShards ORDER BY skey, doc_id) AS BIGINT) AS pos
       |  FROM hashed
       |), packed AS (
       |  SELECT *, CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
       |    ROWS UNBOUNDED PRECEDING) - tokens AS BIGINT) AS stream_offset
       |  FROM sharded
       |), rows_h AS (
       |  SELECT shard, tokens, stream_offset // $window AS window_id,
       |    ${mixedHashSql("sw|",
             "CAST(doc_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR) || '|' || " +
             "CAST(stream_offset AS VARCHAR) || '|' || text").linesIterator.mkString("\n|    ")} AS h
       |  FROM packed
       |)
       |SELECT shard, count(*) AS n_docs,
       |  CAST((sum(tokens) + ${window - 1}) // $window AS BIGINT) AS n_windows,
       |  CAST(sum(tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(h) % 1000000007 AS BIGINT) AS content_hash
       |FROM rows_h GROUP BY shard ORDER BY shard""".stripMargin

  // --------------------------------------------- cross-split leakage audit
  /** SPLIT-LEAKAGE audit: verified near-dup pairs whose endpoints landed in
    * DIFFERENT splits — an eval doc with a train-side near-duplicate is a
    * contaminated benchmark, the exact failure [[decontaminate]] guards
    * against but measured on the pipeline's OWN split assignment. Composes
    * the materialized near-dup pair graph (built once, shared by the whole
    * dedup family) with the deterministic hash split over the same corpus:
    * two equi-joins on doc_id, a filter, no re-hashing of any text.
    *
    * 100 TB shape: the pair graph is orders of magnitude smaller than the
    * corpus, and the split table is a pure projection of it — both joins
    * shuffle 8-16 B keys. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val splits = Dedup.corpusWithNearDups(spark, dir)
      .withColumn("bucket", mixedHash("split|") % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .select("doc_id", "split")
    Dedup.sharedVerifiedPairs(spark, dir)
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "split_a", "split_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  lazy val splitLeakageOracle: String =
    s"""WITH pairs AS (
       |  SELECT * FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), corpus AS (
       |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
       |), splits AS (
       |  SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |    ${splitHashSql("doc_id").linesIterator.mkString("\n|    ")} AS b
       |    FROM corpus)
       |)
       |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b, p.jaccard
       |FROM pairs p
       |JOIN splits sa ON sa.doc_id = p.id_a
       |JOIN splits sb ON sb.doc_id = p.id_b
       |WHERE sa.split != sb.split
       |ORDER BY p.id_a, p.id_b""".stripMargin

  // ----------------------------------------------- keep-rule ablation
  /** KEEP-RULE ABLATION (round 11) — the question right after "what did
    * cleaning cut" ([[manifestRollup]]) is "WHICH rule cut it, and what
    * would relaxing it buy": per manifest keep-rule (dedup / quality /
    * bucket / classifier / paragraph), how many docs it blocks at all,
    * how many it is the SOLE blocker of (exactly the docs recovered if
    * that one rule were dropped), and the resulting keep count without
    * it. One conditional aggregate over the shared manifest — flags
    * only, no corpus re-scan; output is 5 rows regardless of scale. */
  def keepAblation(spark: SparkSession, dir: String): DataFrame =
    sharedManifest(spark, dir)
      .agg(
        sum(when(col("final_keep"), 1L).otherwise(0L)).as("kept"),
        sum(when(!col("keep_dedup"), 1L).otherwise(0L)).as("dedup_blocked"),
        sum(when(!col("keep_dedup") && col("keep_quality") && col("keep_bucket") &&
          col("keep_classifier") && col("keep_paragraph"), 1L).otherwise(0L)).as("dedup_sole"),
        sum(when(!col("keep_quality"), 1L).otherwise(0L)).as("quality_blocked"),
        sum(when(!col("keep_quality") && col("keep_dedup") && col("keep_bucket") &&
          col("keep_classifier") && col("keep_paragraph"), 1L).otherwise(0L)).as("quality_sole"),
        sum(when(!col("keep_bucket"), 1L).otherwise(0L)).as("bucket_blocked"),
        sum(when(!col("keep_bucket") && col("keep_dedup") && col("keep_quality") &&
          col("keep_classifier") && col("keep_paragraph"), 1L).otherwise(0L)).as("bucket_sole"),
        sum(when(!col("keep_classifier"), 1L).otherwise(0L)).as("classifier_blocked"),
        sum(when(!col("keep_classifier") && col("keep_dedup") && col("keep_quality") &&
          col("keep_bucket") && col("keep_paragraph"), 1L).otherwise(0L)).as("classifier_sole"),
        sum(when(!col("keep_paragraph"), 1L).otherwise(0L)).as("paragraph_blocked"),
        sum(when(!col("keep_paragraph") && col("keep_dedup") && col("keep_quality") &&
          col("keep_bucket") && col("keep_classifier"), 1L).otherwise(0L)).as("paragraph_sole"))
      .selectExpr(
        """stack(5,
          |  'dedup',      dedup_blocked,      dedup_sole,      kept + dedup_sole,
          |  'quality',    quality_blocked,    quality_sole,    kept + quality_sole,
          |  'bucket',     bucket_blocked,     bucket_sole,     kept + bucket_sole,
          |  'classifier', classifier_blocked, classifier_sole, kept + classifier_sole,
          |  'paragraph',  paragraph_blocked,  paragraph_sole,  kept + paragraph_sole
          |) AS (rule, n_blocked, n_sole_blocked, n_kept_if_dropped)""".stripMargin)
      .orderBy("rule")

  // def: composes trainingManifestOracle (itself a def)
  def keepAblationOracle: String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), s AS (
       |  SELECT
       |    CAST(sum(CASE WHEN final_keep THEN 1 ELSE 0 END) AS BIGINT) AS kept,
       |    CAST(sum(CASE WHEN NOT keep_dedup THEN 1 ELSE 0 END) AS BIGINT) AS dedup_blocked,
       |    CAST(sum(CASE WHEN NOT keep_dedup AND keep_quality AND keep_bucket AND keep_classifier AND keep_paragraph THEN 1 ELSE 0 END) AS BIGINT) AS dedup_sole,
       |    CAST(sum(CASE WHEN NOT keep_quality THEN 1 ELSE 0 END) AS BIGINT) AS quality_blocked,
       |    CAST(sum(CASE WHEN NOT keep_quality AND keep_dedup AND keep_bucket AND keep_classifier AND keep_paragraph THEN 1 ELSE 0 END) AS BIGINT) AS quality_sole,
       |    CAST(sum(CASE WHEN NOT keep_bucket THEN 1 ELSE 0 END) AS BIGINT) AS bucket_blocked,
       |    CAST(sum(CASE WHEN NOT keep_bucket AND keep_dedup AND keep_quality AND keep_classifier AND keep_paragraph THEN 1 ELSE 0 END) AS BIGINT) AS bucket_sole,
       |    CAST(sum(CASE WHEN NOT keep_classifier THEN 1 ELSE 0 END) AS BIGINT) AS classifier_blocked,
       |    CAST(sum(CASE WHEN NOT keep_classifier AND keep_dedup AND keep_quality AND keep_bucket AND keep_paragraph THEN 1 ELSE 0 END) AS BIGINT) AS classifier_sole,
       |    CAST(sum(CASE WHEN NOT keep_paragraph THEN 1 ELSE 0 END) AS BIGINT) AS paragraph_blocked,
       |    CAST(sum(CASE WHEN NOT keep_paragraph AND keep_dedup AND keep_quality AND keep_bucket AND keep_classifier THEN 1 ELSE 0 END) AS BIGINT) AS paragraph_sole
       |  FROM manifest
       |)
       |SELECT rule, n_blocked, n_sole_blocked, n_kept_if_dropped FROM (
       |  SELECT 'dedup' AS rule, dedup_blocked AS n_blocked,
       |    dedup_sole AS n_sole_blocked, kept + dedup_sole AS n_kept_if_dropped FROM s
       |  UNION ALL
       |  SELECT 'quality', quality_blocked, quality_sole, kept + quality_sole FROM s
       |  UNION ALL
       |  SELECT 'bucket', bucket_blocked, bucket_sole, kept + bucket_sole FROM s
       |  UNION ALL
       |  SELECT 'classifier', classifier_blocked, classifier_sole, kept + classifier_sole FROM s
       |  UNION ALL
       |  SELECT 'paragraph', paragraph_blocked, paragraph_sole, kept + paragraph_sole FROM s
       |) ORDER BY rule""".stripMargin

  // ----------------------------------------------- corpus release report
  /** The CORPUS RELEASE REPORT (VERDICT r10 #7) — the one table a data
    * owner signs off on before shipping a training set: the manifest's
    * keep accounting (docs/tokens, exact ppm survival) composed with the
    * three pre-release AUDITS over the SAME kept set —
    *   - `kept_contaminated`: kept docs sharing a word 5-gram with the
    *     eval set ([[decontaminate]] run against the release, not the raw
    *     corpus — the number that must be 0 before benchmarks mean
    *     anything);
    *   - `kept_takedown`: kept docs in the takedown purge set (requests ∪
    *     verified near-duplicates, [[Dedup.takedownPurgeSet]] — must be 0
    *     for a compliant release);
    *   - `leaked_pairs`: verified near-dup pairs straddling splits
    *     ([[splitLeakage]]'s count — the benchmark-integrity residual).
    * Long format (metric, value), exact integers, so one diff of two
    * release reports is the whole regression story between two corpus
    * versions.
    *
    * 100 TB shape: every input is an already-materialized stage (manifest,
    * verified-pair graph) or a bounded audit join (eval grams broadcast,
    * requests broadcast); the composition adds 1-row aggregate branches in
    * ONE DAG and moves 8 B keys — no new corpus scan beyond the audits a
    * release would run anyway. */
  def releaseReport(spark: SparkSession, dir: String): DataFrame = {
    val m = sharedManifest(spark, dir)
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), sz(words).as("n_tokens"))
    val mt = m.select("doc_id", "final_keep").join(toks, "doc_id")
    val kept = m.filter(col("final_keep")).select("doc_id")
    def row1(name: String, v: Column, from: DataFrame): DataFrame =
      from.agg(v.cast("bigint").as("value")).select(lit(name).as("metric"), col("value"))
    val totals = mt.agg(
      count(lit(1)).as("docs_total"),
      sum(when(col("final_keep"), 1L).otherwise(0L)).as("docs_kept"),
      sum(col("n_tokens")).as("tokens_total"),
      sum(when(col("final_keep"), col("n_tokens")).otherwise(0L)).as("tokens_kept"))
    val totalRows = totals.selectExpr(
      """stack(5,
        |  'docs_total', docs_total,
        |  'docs_kept', docs_kept,
        |  'tokens_total', tokens_total,
        |  'tokens_kept', tokens_kept,
        |  'tokens_kept_ppm',
        |  CAST((CAST(tokens_kept AS DECIMAL(38,0)) * 1000000) div tokens_total AS BIGINT)
        |) AS (metric, value)""".stripMargin)
    val contaminated = row1("kept_contaminated", count(lit(1)),
      kept.join(decontaminate(spark, dir).select("doc_id"), "doc_id"))
    val takedown = row1("kept_takedown", count(lit(1)),
      kept.join(Dedup.takedownPurgeSet(spark, dir), "doc_id"))
    val leaks = row1("leaked_pairs", count(lit(1)), splitLeakage(spark, dir))
    totalRows.unionAll(contaminated).unionAll(takedown).unionAll(leaks)
      .orderBy("metric")
  }

  // def: composes trainingManifestOracle (itself a def)
  def releaseReportOracle: String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
       |), mt AS (
       |  SELECT m.doc_id, m.final_keep, t.n_tokens FROM manifest m JOIN toks t USING (doc_id)
       |), kept AS (
       |  SELECT doc_id FROM manifest WHERE final_keep
       |), contam AS (
       |  SELECT * FROM (
       |${decontaminateOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) c
       |), pairs AS (
       |  SELECT * FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), corpus AS (
       |  ${Dedup.corpusSql.linesIterator.mkString("\n|  ")}
       |), splits AS (
       |  SELECT doc_id,
       |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |    ${splitHashSql("doc_id").linesIterator.mkString("\n|    ")} AS b
       |    FROM corpus)
       |), requests AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 41 = 0
       |), purge AS (
       |  SELECT doc_id FROM requests
       |  UNION
       |  SELECT p.id_b AS doc_id FROM pairs p JOIN requests r ON p.id_a = r.doc_id
       |  UNION
       |  SELECT p.id_a AS doc_id FROM pairs p JOIN requests r ON p.id_b = r.doc_id
       |)
       |SELECT metric, value FROM (
       |  SELECT 'docs_total' AS metric, count(*) AS value FROM mt
       |  UNION ALL
       |  SELECT 'docs_kept', CAST(sum(CASE WHEN final_keep THEN 1 ELSE 0 END) AS BIGINT) FROM mt
       |  UNION ALL
       |  SELECT 'tokens_total', CAST(sum(n_tokens) AS BIGINT) FROM mt
       |  UNION ALL
       |  SELECT 'tokens_kept', CAST(sum(CASE WHEN final_keep THEN n_tokens ELSE 0 END) AS BIGINT) FROM mt
       |  UNION ALL
       |  SELECT 'tokens_kept_ppm',
       |    CAST((sum(CASE WHEN final_keep THEN n_tokens ELSE 0 END) * 1000000)
       |         // sum(n_tokens) AS BIGINT) FROM mt
       |  UNION ALL
       |  SELECT 'kept_contaminated', count(*) FROM kept k JOIN contam c ON c.doc_id = k.doc_id
       |  UNION ALL
       |  SELECT 'kept_takedown', count(*) FROM kept k JOIN purge p ON p.doc_id = k.doc_id
       |  UNION ALL
       |  SELECT 'leaked_pairs', count(*)
       |  FROM pairs p
       |  JOIN splits sa ON sa.doc_id = p.id_a
       |  JOIN splits sb ON sb.doc_id = p.id_b
       |  WHERE sa.split != sb.split
       |) ORDER BY metric""".stripMargin

  // ------------------------------------------- end-to-end release run
  /** PIPELINE RELEASE, END-TO-END (round 12, VERDICT r11 #6a) — the whole
    * ship path as ONE gated run: keep-rule manifest → kept set → shard
    * WRITE to parquet (+ sidecar manifest) → READ THE ARTIFACT BACK → the
    * sign-off table computed FROM THE FILES AS WRITTEN, not from the
    * pre-write plan. Every number on the left of the gate comes off disk
    * (the artifact or its sidecar); the oracle recomputes each from the
    * raw tables through the logical keep→shard→pack definition — so a
    * write bug (dropped shard, double-written partition, sidecar drift,
    * kept-set mismatch) CANNOT pass, which is exactly what an e2e gate is
    * for. Metrics: shards/docs/tokens released, packed windows scheduled,
    * the sidecar's summed content hash, the artifact↔sidecar doc-count
    * delta (0 on agreement), and the two audits a release must pass
    * (contaminated / takedown docs in the release — both counted against
    * the ARTIFACT's ids).
    *
    * 100 TB shape: the write is the pipeline's own output (not a tax);
    * the report adds one narrow read-back pass + bounded audit joins
    * (eval grams and purge requests broadcast) — the standard
    * write-then-validate discipline, here regression-locked. */
  def pipelineReleaseE2e(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame = {
    val out = shardWrite(spark, dir, nShards, window) // the E2E run
    val art = spark.read.parquet(out)
    val sidecar = spark.read.parquet(shardManifestPath(dir))
    val artIds = art.select("doc_id")
    def row1(name: String, v: Column, from: DataFrame): DataFrame =
      from.agg(v.cast("bigint").as("value")).select(lit(name).as("metric"), col("value"))
    val totals = art.agg(
        countDistinct(col("shard")).as("shards_written"),
        count(lit(1)).as("docs_released"),
        sum(col("tokens")).as("tokens_released"))
      .selectExpr(
        """stack(3,
          |  'shards_written', shards_written,
          |  'docs_released', docs_released,
          |  'tokens_released', tokens_released
          |) AS (metric, value)""".stripMargin)
    val windows = row1("windows_scheduled", sum(col("n_windows")), sidecar)
    val hash = row1("sidecar_content_hash",
      expr("CAST(sum(CAST(content_hash AS DECIMAL(38,0))) % 1000000007 AS BIGINT)"),
      sidecar)
    val delta = art.agg(count(lit(1)).as("a"))
      .crossJoin(broadcast(sidecar.agg(sum(col("n_docs")).as("b"))))
      .select(lit("artifact_sidecar_docs_delta").as("metric"),
        (col("a") - col("b")).cast("bigint").as("value"))
    val contaminated = row1("released_contaminated", count(lit(1)),
      artIds.join(decontaminate(spark, dir).select("doc_id"), "doc_id"))
    val takedown = row1("released_takedown", count(lit(1)),
      artIds.join(Dedup.takedownPurgeSet(spark, dir), "doc_id"))
    totals.unionAll(windows).unionAll(hash).unionAll(delta)
      .unionAll(contaminated).unionAll(takedown)
      .orderBy("metric")
  }

  // def: composes trainingManifestOracle + the shard/pack definition
  def pipelineReleaseE2eOracle(nShards: Int = 8, window: Int = 2048): String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), kept AS (
       |  SELECT d.doc_id, d.text, d.lang, d.source FROM documents d
       |  JOIN manifest mm ON mm.doc_id = d.doc_id WHERE mm.final_keep
       |), hashed AS (
       |  SELECT doc_id, text, lang, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens,
       |    ${mixedHashSql("shuf|").linesIterator.mkString("\n|    ")} AS skey
       |  FROM kept
       |), sharded AS (
       |  SELECT *, skey % $nShards AS shard,
       |    CAST(row_number() OVER (PARTITION BY skey % $nShards ORDER BY skey, doc_id) AS BIGINT) AS pos
       |  FROM hashed
       |), packed AS (
       |  SELECT *, CAST(sum(tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
       |    ROWS UNBOUNDED PRECEDING) - tokens AS BIGINT) AS stream_offset
       |  FROM sharded
       |), rows_h AS (
       |  SELECT shard, tokens,
       |    ${mixedHashSql("sw|",
             "CAST(doc_id AS VARCHAR) || '|' || CAST(pos AS VARCHAR) || '|' || " +
             "CAST(stream_offset AS VARCHAR) || '|' || text").linesIterator.mkString("\n|    ")} AS h
       |  FROM packed
       |), per_shard AS (
       |  SELECT shard, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS n_tokens,
       |    CAST((sum(tokens) + ${window - 1}) // $window AS BIGINT) AS n_windows,
       |    CAST(sum(h) % 1000000007 AS BIGINT) AS content_hash
       |  FROM rows_h GROUP BY shard
       |), contam AS (
       |  SELECT * FROM (
       |${decontaminateOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) c
       |), pairs AS (
       |  SELECT * FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), requests AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 41 = 0
       |), purge AS (
       |  SELECT doc_id FROM requests
       |  UNION
       |  SELECT p.id_b AS doc_id FROM pairs p JOIN requests r ON p.id_a = r.doc_id
       |  UNION
       |  SELECT p.id_a AS doc_id FROM pairs p JOIN requests r ON p.id_b = r.doc_id
       |)
       |SELECT metric, value FROM (
       |  SELECT 'shards_written' AS metric, count(DISTINCT shard) AS value FROM sharded
       |  UNION ALL
       |  SELECT 'docs_released', count(*) FROM kept
       |  UNION ALL
       |  SELECT 'tokens_released', CAST(sum(tokens) AS BIGINT) FROM hashed
       |  UNION ALL
       |  SELECT 'windows_scheduled', CAST(sum(n_windows) AS BIGINT) FROM per_shard
       |  UNION ALL
       |  SELECT 'sidecar_content_hash',
       |    CAST(sum(content_hash) % 1000000007 AS BIGINT) FROM per_shard
       |  UNION ALL
       |  SELECT 'artifact_sidecar_docs_delta', 0
       |  UNION ALL
       |  SELECT 'released_contaminated', count(*)
       |  FROM kept k JOIN contam c ON c.doc_id = k.doc_id
       |  UNION ALL
       |  SELECT 'released_takedown', count(*)
       |  FROM kept k JOIN purge p ON p.doc_id = k.doc_id
       |) ORDER BY metric""".stripMargin

  // ----------------------------------- release-to-release diff, END-TO-END
  /** RELEASE DIFF, END-TO-END (round 13, VERDICT r12 #6a) — the release
    * gate run TWICE across a simulated corpus delta, with the diff table
    * computed FROM THE FILES AS WRITTEN: version A = the shipped keep rule
    * (`final_keep`, the [[pipelineReleaseE2e]] artifact), version B = the
    * next release candidate ([[releaseDiff]]'s rule: CCNet bucket relaxed
    * + takedown purge applied), BOTH materialized through the identical
    * shard/pack/write path to separate artifacts, both READ BACK, and the
    * per-source churn table (docs/tokens per version, adds/removes by id,
    * signed token delta, shards touched) derived from a full-outer join of
    * the two artifacts' ids. The oracle recomputes everything from the raw
    * tables through the two logical keep rules and the shared shard-key
    * definition — so a stale artifact, dropped shard directory, or
    * keep-rule drift in EITHER release cannot pass.
    *
    * 100 TB shape: each write is its release's own product (not a tax);
    * the diff adds two narrow read-back passes joined on 8 B ids and a
    * |sources|-row aggregate. The full-outer id join shuffles ids + flags
    * only — text never moves. */
  def pipelineReleaseDiffE2e(spark: SparkSession, dir: String,
      nShards: Int = 8, window: Int = 2048): DataFrame = {
    val outA = shardWrite(spark, dir, nShards, window)
    val outB = shardWritePath(dir) + "_relb"
    val keptB = sharedManifest(spark, dir)
      .filter(col("keep_dedup") && col("keep_quality"))
      .select("doc_id")
      .join(Dedup.takedownPurgeSet(spark, dir), Seq("doc_id"), "left_anti")
    graft.sources.TableSources.writePartitioned(
      trainingSetOf(spark, dir, keptB, nShards, window), outB, Seq("shard"))
    val a = spark.read.parquet(outA).select(
      col("doc_id").as("id_a"), col("source").as("source_a"),
      col("tokens").as("tokens_a"), col("shard").cast("bigint").as("shard_a"))
    val b = spark.read.parquet(outB).select(
      col("doc_id").as("id_b"), col("source").as("source_b"),
      col("tokens").as("tokens_b"), col("shard").cast("bigint").as("shard_b"))
    a.join(b, col("id_a") === col("id_b"), "full_outer")
      .groupBy(coalesce(col("source_a"), col("source_b")).as("source"))
      .agg(
        sum(when(col("id_a").isNotNull, 1L).otherwise(0L)).as("docs_a"),
        sum(when(col("id_b").isNotNull, 1L).otherwise(0L)).as("docs_b"),
        sum(when(col("id_b").isNotNull && col("id_a").isNull, 1L).otherwise(0L))
          .as("docs_added"),
        sum(when(col("id_a").isNotNull && col("id_b").isNull, 1L).otherwise(0L))
          .as("docs_removed"),
        sum(coalesce(col("tokens_a"), lit(0L))).as("tokens_a"),
        sum(coalesce(col("tokens_b"), lit(0L))).as("tokens_b"),
        countDistinct(col("shard_a")).as("shards_a"),
        countDistinct(col("shard_b")).as("shards_b"))
      .withColumn("tokens_delta", col("tokens_b") - col("tokens_a"))
      .orderBy("source")
  }

  // def: composes trainingManifestOracle (itself a def)
  def pipelineReleaseDiffE2eOracle(nShards: Int = 8): String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), pairs AS (
       |  SELECT * FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), requests AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 41 = 0
       |), purge AS (
       |  SELECT doc_id FROM requests
       |  UNION
       |  SELECT p.id_b AS doc_id FROM pairs p JOIN requests r ON p.id_a = r.doc_id
       |  UNION
       |  SELECT p.id_a AS doc_id FROM pairs p JOIN requests r ON p.id_b = r.doc_id
       |), flags AS (
       |  SELECT d.source, d.doc_id,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tokens,
       |    ${mixedHashSql("shuf|", "d.doc_id").linesIterator.mkString("\n|    ")}
       |      % $nShards AS shard,
       |    m.final_keep AS keep_a,
       |    (m.keep_dedup AND m.keep_quality AND p.doc_id IS NULL) AS keep_b
       |  FROM documents d
       |  JOIN manifest m USING (doc_id)
       |  LEFT JOIN purge p USING (doc_id)
       |)
       |SELECT source,
       |  CAST(sum(CASE WHEN keep_a THEN 1 ELSE 0 END) AS BIGINT) AS docs_a,
       |  CAST(sum(CASE WHEN keep_b THEN 1 ELSE 0 END) AS BIGINT) AS docs_b,
       |  CAST(sum(CASE WHEN keep_b AND NOT keep_a THEN 1 ELSE 0 END) AS BIGINT) AS docs_added,
       |  CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT) AS docs_removed,
       |  CAST(sum(CASE WHEN keep_a THEN tokens ELSE 0 END) AS BIGINT) AS tokens_a,
       |  CAST(sum(CASE WHEN keep_b THEN tokens ELSE 0 END) AS BIGINT) AS tokens_b,
       |  CAST(count(DISTINCT CASE WHEN keep_a THEN shard END) AS BIGINT) AS shards_a,
       |  CAST(count(DISTINCT CASE WHEN keep_b THEN shard END) AS BIGINT) AS shards_b,
       |  CAST(sum(CASE WHEN keep_b THEN tokens ELSE 0 END)
       |     - sum(CASE WHEN keep_a THEN tokens ELSE 0 END) AS BIGINT) AS tokens_delta
       |FROM flags WHERE keep_a OR keep_b
       |GROUP BY source ORDER BY source""".stripMargin

  // ----------------------------------------------- corpus release diff
  /** RELEASE-TO-RELEASE DIFF (round 11) — [[releaseReport]] said "diffing
    * two release reports is the whole regression story"; this table IS
    * that diff, computed in one pass. Version A = the shipped manifest
    * (`final_keep`); version B = the next release candidate: the CCNet
    * bucket rule relaxed (recovering its sole-blocked docs — exactly what
    * [[keepAblation]] priced) AND the takedown purge applied
    * ([[Dedup.takedownPurgeSet]] — what compliance requires). Per source:
    * docs/tokens under each version, docs added and removed by the
    * change, and the signed token delta — the per-source churn a data
    * owner reads before re-training on version B.
    *
    * 100 TB shape: both versions are COLUMN expressions over the one
    * materialized manifest joined to a (doc, token) projection — the diff
    * adds no corpus scan and no new shuffle beyond the |sources|-row
    * aggregate; the purge set is takedown-sized and broadcasts. Exact
    * integers throughout (the delta is a signed BIGINT). */
  def releaseDiff(spark: SparkSession, dir: String): DataFrame = {
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), sz(words).as("n_tokens"))
    val purge = Dedup.takedownPurgeSet(spark, dir).withColumn("purged", lit(1L))
    sharedManifest(spark, dir)
      .select("doc_id", "source", "keep_dedup", "keep_quality", "final_keep")
      .join(toks, "doc_id")
      .join(broadcast(purge), Seq("doc_id"), "left")
      .withColumn("keep_a", col("final_keep"))
      .withColumn("keep_b",
        col("keep_dedup") && col("keep_quality") && col("purged").isNull)
      .groupBy("source")
      .agg(
        sum(when(col("keep_a"), 1L).otherwise(0L)).as("docs_a"),
        sum(when(col("keep_b"), 1L).otherwise(0L)).as("docs_b"),
        sum(when(col("keep_b") && !col("keep_a"), 1L).otherwise(0L)).as("docs_added"),
        sum(when(col("keep_a") && !col("keep_b"), 1L).otherwise(0L)).as("docs_removed"),
        sum(when(col("keep_a"), col("n_tokens")).otherwise(0L)).as("tokens_a"),
        sum(when(col("keep_b"), col("n_tokens")).otherwise(0L)).as("tokens_b"))
      .withColumn("tokens_delta", col("tokens_b") - col("tokens_a"))
      .orderBy("source")
  }

  // def: composes trainingManifestOracle (itself a def)
  def releaseDiffOracle: String =
    s"""WITH manifest AS (
       |  SELECT * FROM (
       |${trainingManifestOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) m
       |), toks AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
       |), pairs AS (
       |  SELECT * FROM (
       |${Dedup.ngramJaccardPairsOracle.linesIterator.map("    " + _).mkString("\n")}
       |  ) p
       |), requests AS (
       |  SELECT doc_id FROM documents WHERE doc_id % 41 = 0
       |), purge AS (
       |  SELECT doc_id FROM requests
       |  UNION
       |  SELECT p.id_b AS doc_id FROM pairs p JOIN requests r ON p.id_a = r.doc_id
       |  UNION
       |  SELECT p.id_a AS doc_id FROM pairs p JOIN requests r ON p.id_b = r.doc_id
       |), flags AS (
       |  SELECT m.source, t.n_tokens,
       |    m.final_keep AS keep_a,
       |    (m.keep_dedup AND m.keep_quality AND p.doc_id IS NULL) AS keep_b
       |  FROM manifest m
       |  JOIN toks t USING (doc_id)
       |  LEFT JOIN purge p USING (doc_id)
       |)
       |SELECT source,
       |  CAST(sum(CASE WHEN keep_a THEN 1 ELSE 0 END) AS BIGINT) AS docs_a,
       |  CAST(sum(CASE WHEN keep_b THEN 1 ELSE 0 END) AS BIGINT) AS docs_b,
       |  CAST(sum(CASE WHEN keep_b AND NOT keep_a THEN 1 ELSE 0 END) AS BIGINT) AS docs_added,
       |  CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END) AS BIGINT) AS docs_removed,
       |  CAST(sum(CASE WHEN keep_a THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_a,
       |  CAST(sum(CASE WHEN keep_b THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_b,
       |  CAST(sum(CASE WHEN keep_b THEN n_tokens ELSE 0 END)
       |     - sum(CASE WHEN keep_a THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_delta
       |FROM flags GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------- PPS sampling (sequential Poisson)

  /** Size-weighted corpus sample (round 9): SEQUENTIAL POISSON SAMPLING
    * (Ohlsson 1998) — draw k documents with inclusion probability
    * ~proportional to size (n_chars), the standard PPS design for "sample
    * 0.1% of the corpus by bytes, not by doc count" (token-budget audits,
    * eval-slice drawing). Each doc gets priority ξ = u/w with u a
    * content-independent hash uniform and w its weight; the k smallest
    * priorities are the sample.
    *
    * 100 TB shape: ξ is a pure per-row expression ([[mixedHash]] + one
    * IEEE divide — u and w are exact-integer doubles, so ξ is
    * bit-identical on any engine), and the k-smallest is orderBy+limit →
    * TakeOrderedAndProject: O(k) state per partition, no global sort, no
    * driver-side corpus state, reproducible at any partitioning — exactly
    * [[stratifiedSample]]'s determinism story, with weights. */
  def ppsSample(spark: SparkSession, dir: String, k: Int = 100): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        ((mixedHash("pps|") % 1000003 + 1).cast("double") /
          greatest(col("n_chars"), lit(1L)).cast("double")).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)

  def ppsSampleOracle(k: Int = 100): String =
    s"""SELECT doc_id, n_chars,
       |  CAST(${mixedHashSql("pps|").linesIterator.mkString("\n|  ")} % 1000003 + 1 AS DOUBLE)
       |    / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS priority
       |FROM documents
       |ORDER BY priority, doc_id LIMIT $k""".stripMargin

  /** Stratified PPS: [[ppsSample]]'s priorities ranked WITHIN each
    * language — k docs per stratum, size-weighted inside it (the "equal
    * language representation, longest-doc-biased within" eval draw). The
    * global TakeOrdered becomes per-stratum rank windows: partitioned by
    * a bounded key, WindowGroupLimit-prunable, still no global sort. */
  def ppsStratified(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(col("priority"), col("doc_id"))
    table(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        ((mixedHash("pps|") % 1000003 + 1).cast("double") /
          greatest(col("n_chars"), lit(1L)).cast("double")).as("priority"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select("lang", "rk", "doc_id", "n_chars", "priority")
      .orderBy("lang", "rk")
  }

  /** HORVITZ–THOMPSON ESTIMATION GATE (Horvitz & Thompson 1952, over the
    * Ohlsson '98 sequential Poisson design) — the reason PPS sampling exists:
    * from the k-doc [[ppsSample]], estimate corpus totals with
    * inverse-inclusion weights (π_i ≈ min(1, k·w_i/W)) and report the
    * relative error against the true totals, all in exact integer
    * arithmetic (1/π held in ppm, floor divisions on non-negative
    * operands). The char-total estimate is tight BY CONSTRUCTION
    * (w_i·(W/(k·w_i)) = W/k per draw — the PPS self-normalizing property,
    * up to π-capping and floors); the doc-count estimate carries real
    * design variance and its tolerance documents it. `chars_ok`/`docs_ok`
    * are computed in-query — the spec asserts them TRUE at both fixture
    * SFs; the oracle pins every number bit-exactly.
    *
    * 100 TB shape: one scan for the totals, the TakeOrdered sample, and a
    * k-row estimator — the audit costs the profile scan, nothing more. */
  def ppsHtGate(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val tot = table(spark, dir, "documents")
      .agg(sum(dec(greatest(col("n_chars"), lit(1L)))).as("true_chars"),
        count(lit(1)).as("true_docs"))
    ppsSample(spark, dir, k)
      .select(greatest(col("n_chars"), lit(1L)).as("w"))
      .crossJoin(broadcast(tot))
      .withColumn("inv_ppm",
        expr(s"""CAST(CASE WHEN $k * CAST(w AS DECIMAL(38,0)) >= true_chars
                |     THEN 1000000
                |     ELSE (true_chars * 1000000) div ($k * w) END AS BIGINT)""".stripMargin))
      .groupBy("true_chars", "true_docs")
      .agg(count(lit(1)).as("n_sample"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * inv_ppm")).as("wsum"),
        sum(dec(col("inv_ppm"))).as("isum"))
      .select(col("n_sample"),
        expr("CAST(true_docs AS BIGINT)").as("true_docs"),
        expr("CAST(isum div 1000 AS BIGINT)").as("est_docs_milli"),
        expr("""CAST((greatest(isum div 1000, true_docs * 1000)
               |  - least(isum div 1000, true_docs * 1000)) div true_docs AS BIGINT)"""
          .stripMargin).as("err_docs_permille"),
        expr("CAST(true_chars AS BIGINT)").as("true_chars"),
        expr("CAST(wsum div 1000000 AS BIGINT)").as("est_chars"),
        expr("""CAST((greatest(wsum div 1000000, true_chars)
               |  - least(wsum div 1000000, true_chars)) * 1000 div true_chars AS BIGINT)"""
          .stripMargin).as("err_chars_permille"))
      .withColumn("chars_ok", col("err_chars_permille") <= 20)
      .withColumn("docs_ok", col("err_docs_permille") <= 300)
  }

  def ppsHtGateOracle(k: Int = 100): String =
    s"""WITH tot AS (
       |  SELECT CAST(sum(GREATEST(n_chars, 1)) AS HUGEINT) AS true_chars,
       |         count(*) AS true_docs
       |  FROM documents
       |), sample AS (
       |  SELECT GREATEST(n_chars, 1) AS w FROM (${ppsSampleOracle(k).linesIterator.mkString("\n|    ")}) s
       |), est AS (
       |  SELECT count(*) AS n_sample, any_value(true_chars) AS true_chars,
       |    any_value(true_docs) AS true_docs,
       |    sum(CAST(w AS HUGEINT) * inv_ppm) AS wsum, sum(inv_ppm) AS isum
       |  FROM (
       |    SELECT w, true_chars, true_docs,
       |      CASE WHEN $k * CAST(w AS HUGEINT) >= true_chars THEN 1000000
       |           ELSE (true_chars * 1000000) // ($k * w) END AS inv_ppm
       |    FROM sample CROSS JOIN tot)
       |)
       |SELECT *, err_chars_permille <= 20 AS chars_ok, err_docs_permille <= 300 AS docs_ok
       |FROM (
       |  SELECT n_sample,
       |    CAST(true_docs AS BIGINT) AS true_docs,
       |    CAST(isum // 1000 AS BIGINT) AS est_docs_milli,
       |    CAST((greatest(isum // 1000, true_docs * 1000)
       |      - least(isum // 1000, true_docs * 1000)) // true_docs AS BIGINT) AS err_docs_permille,
       |    CAST(true_chars AS BIGINT) AS true_chars,
       |    CAST(wsum // 1000000 AS BIGINT) AS est_chars,
       |    CAST((greatest(wsum // 1000000, true_chars)
       |      - least(wsum // 1000000, true_chars)) * 1000 // true_chars AS BIGINT) AS err_chars_permille
       |  FROM est
       |)""".stripMargin

  def ppsStratifiedOracle(k: Int = 20): String =
    s"""WITH pri AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(${mixedHashSql("pps|").linesIterator.mkString("\n|    ")} % 1000003 + 1 AS DOUBLE)
       |      / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS priority
       |  FROM documents
       |)
       |SELECT lang, rk, doc_id, n_chars, priority FROM (
       |  SELECT lang, doc_id, n_chars, priority,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS BIGINT) AS rk
       |  FROM pri) t
       |WHERE rk <= $k ORDER BY lang, rk""".stripMargin

  // ------------------------------------------------- multi-literal screen

  /** Deterministic screening phrase list: known fixture-vocabulary phrases
    * spanning hit rates, plus one guaranteed miss (the screen must PROVE
    * it emits nothing for absent phrases). */
  val ScreenPhrases: Seq[String] = Seq(
    "fast fast", "query table", "big scan order", "agg filter part",
    "table table key", "scan spark fast", "merge batch",
    "benchmark canary xq9")

  /** Blocklist / contamination screen via the native Aho-Corasick
    * expression ([[graft.functions.MultiLiteral]]): every (doc, phrase)
    * containment pair for a K-phrase literal list in ONE pass per
    * document — the built-in form is K `contains()` scans per row, which
    * at 10⁴ blocklist phrases is a 10⁴× per-row blowup. The oracle is the
    * semantic spec: a documents × phrases containment join. */
  def phraseScreen(spark: SparkSession, dir: String): DataFrame = {
    val phrases = ScreenPhrases
    table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.MultiLiteral.multi_literal_matches(col("text"), phrases))
          .as("pid"))
      .select(col("doc_id"), col("pid"),
        element_at(array(phrases.map(lit): _*), col("pid") + 1).as("phrase"))
      .orderBy("doc_id", "pid")
  }

  def phraseScreenOracle: String = {
    val values = ScreenPhrases.zipWithIndex
      .map { case (p, i) => s"($i, '$p')" }.mkString(", ")
    s"""SELECT doc_id, p.pid, p.phrase
       |FROM documents, (VALUES $values) AS p(pid, phrase)
       |WHERE strpos(text, p.phrase) > 0
       |ORDER BY doc_id, pid""".stripMargin
  }

  // ------------------------------------------------- inverted index

  /** Posting-list build (round 9): term → document frequency + the first
    * `cap` doc ids (sorted), terms = 3-gram shingles — the IR/text-search
    * building block, and the audit table "which docs contain this exact
    * phrase" (e.g. a takedown string or benchmark sentence).
    *
    * 100 TB shape: one explode pass, one groupBy on the term; the posting
    * ARRAY is capped (`slice(sort, cap)`), so a stop-phrase's row costs
    * O(cap) — df still counts everything, only the materialized list is
    * bounded. collect_set order is partition-dependent; sort_array
    * canonicalizes before the slice, so output is deterministic. */
  def invertedIndex(spark: SparkSession, dir: String, cap: Int = 10): DataFrame = {
    val docs = table(spark, dir, "documents")
      .filter(size(split(col("text"), " ")) >= 3)
      .repartition(spark.sparkContext.defaultParallelism)
    val ws = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    ws.select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2))))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_set(col("doc_id"))), 1, cap).as("postings"))
      .orderBy("term")
  }

  /** DRIVER-GATED form of [[invertedIndex]]: identical computation, but the
    * `postings` ARRAY is projected to driver-adjudicable SCALARS — an md5
    * digest of the comma-joined sorted list plus its size and endpoints.
    * Array/Map columns crash the driver's pandas `sort_values` harness
    * (the round-3 `embedding_quantize_int8` lesson, reintroduced and
    * re-fixed in round 10); the array form stays the library API. The
    * digest is exact — postings are sorted before joining on both engines,
    * so a single doc-id difference flips the hash. */
  def invertedIndexDigest(spark: SparkSession, dir: String, cap: Int = 10): DataFrame =
    invertedIndex(spark, dir, cap)
      .select(col("term"), col("df"),
        size(col("postings")).as("n_postings"),
        element_at(col("postings"), 1).as("first_doc"),
        element_at(col("postings"), -1).as("last_doc"),
        md5(concat_ws(",", col("postings")).cast("binary")).as("postings_md5"))

  def invertedIndexDigestOracle(cap: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |  ))) AS term
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |), idx AS (
       |  SELECT term, count(*) AS df,
       |    list_sort(list(DISTINCT doc_id))[1:$cap] AS postings
       |  FROM toks GROUP BY term
       |)
       |SELECT term, df,
       |  CAST(len(postings) AS INT) AS n_postings,
       |  postings[1] AS first_doc,
       |  postings[-1] AS last_doc,
       |  md5(list_aggregate(list_transform(postings, x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS postings_md5
       |FROM idx ORDER BY term""".stripMargin

  def invertedIndexOracle(cap: Int = 10): String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
       |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
       |  ))) AS term
       |  FROM documents WHERE len(string_split(text, ' ')) >= 3
       |)
       |SELECT term, count(*) AS df,
       |  list_sort(list(DISTINCT doc_id))[1:$cap] AS postings
       |FROM toks GROUP BY term ORDER BY term""".stripMargin

  // --------------------------------------------- source TV-distance matrix
  /** Lexical similarity matrix between sources: TOTAL-VARIATION distance
    * between each pair's word distributions, exact in parts-per-million —
    * the libm-free alternative to JS divergence (TV = ½Σ|p−q|; with
    * integer counts, `Σ|c_a·n_b − c_b·n_a|` is exact in wide decimals).
    * Missing words never need a full-outer join: the absent-word mass
    * folds in algebraically as `n_b·(n_a − Σ_common c_a) + n_a·(n_b −
    * Σ_common c_b)`, so ONE inner self-join on the vocab-keyed frame plus
    * per-source totals covers the whole sum. Two sources sharing no
    * vocabulary score exactly 10⁶; near-identical mixes score ~0 — the
    * crawl-dialect / syndication fingerprint next to the near-dup
    * source-overlap matrix. */
  def sourceTvDistance(spark: SparkSession, dir: String): DataFrame =
    sourceTvDistanceImpl(spark, dir, materialize = true)

  /** Un-materialized twin for plan audits. */
  private[graft] def sourceTvDistancePlan(spark: SparkSession, dir: String): DataFrame =
    sourceTvDistanceImpl(spark, dir, materialize = false)

  private def sourceTvDistanceImpl(spark: SparkSession, dir: String,
      materialize: Boolean): DataFrame = {
    val counts0 = table(spark, dir, "documents")
      .select(col("source"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
    // (source × vocab)-bounded (Zipf), read by the totals branch AND both
    // self-join sides — without materialization the corpus tokenize +
    // explode + aggregate ran once per branch (r17; plan: 3 document
    // scans → 1)
    val counts = if (materialize) counts0.localCheckpoint(false) else counts0
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val a = counts.select(col("source").as("source_a"), col("word"), col("c").as("ca"))
      .join(broadcast(totals.select(col("source").as("source_a"), col("n").as("na"))),
        "source_a")
    val b = counts.select(col("source").as("source_b"), col("word"), col("c").as("cb"))
      .join(broadcast(totals.select(col("source").as("source_b"), col("n").as("nb"))),
        "source_b")
    a.join(b, "word")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b", "na", "nb")
      .agg(
        sum(abs(dec(col("ca")) * dec(col("nb")) - dec(col("cb")) * dec(col("na"))))
          .cast("decimal(38,0)").as("common_term"),
        sum(col("ca")).as("ca_common"), sum(col("cb")).as("cb_common"))
      .select(col("source_a"), col("source_b"),
        expr("CAST((common_term + CAST(nb AS DECIMAL(38,0)) * (na - ca_common)" +
          " + CAST(na AS DECIMAL(38,0)) * (nb - cb_common)) * 500000" +
          " div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)").as("tv_ppm"))
      .orderBy("source_a", "source_b")
  }

  val sourceTvDistanceOracle: String =
    """WITH counts AS (
      |  SELECT source, w AS word, CAST(count(*) AS HUGEINT) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY 1, 2
      |), totals AS (
      |  SELECT source, CAST(sum(c) AS HUGEINT) AS n FROM counts GROUP BY 1
      |), j AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    ta.n AS na, tb.n AS nb,
      |    sum(abs(a.c * tb.n - b.c * ta.n)) AS common_term,
      |    sum(a.c) AS ca_common, sum(b.c) AS cb_common
      |  FROM counts a
      |  JOIN counts b ON a.word = b.word AND a.source < b.source
      |  JOIN totals ta ON ta.source = a.source
      |  JOIN totals tb ON tb.source = b.source
      |  GROUP BY 1, 2, 3, 4)
      |SELECT source_a, source_b,
      |  CAST((common_term + nb * (na - ca_common) + na * (nb - cb_common))
      |    * 500000 // (na * nb) AS BIGINT) AS tv_ppm
      |FROM j ORDER BY source_a, source_b""".stripMargin

  // ------------------------------------------------- vocabulary growth curve
  /** Heaps-law vocabulary growth: cumulative distinct words vs cumulative
    * tokens as the corpus is read in doc_id order, sampled at power-of-two
    * document counts — the curve that predicts tokenizer vocab coverage at
    * 100× the data (V ≈ K·nᵝ: extrapolate the log-log slope). A word's
    * contribution collapses to its FIRST document (`groupBy(word).min`),
    * per-doc (new-words, tokens) rows then accumulate through the
    * two-level distributed prefix — corpus-order cumulative sums with no
    * global row sort — and the power-of-two filter is a bit test. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = table(spark, dir, "documents")
      .select(col("doc_id"), explode(words).as("word"))
      .filter(col("word") =!= "")
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .join(
        toks.groupBy("word").agg(min(col("doc_id")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("new_words")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("new_words"))
      .withColumn("bucket", expr("doc_id div 64"))
    val wLocal = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perDoc.groupBy("bucket")
      .agg(count(lit(1)).as("bd"), sum(col("n_tokens")).as("bt"),
        sum(col("new_words")).as("bw"))
      .withColumn("od", coalesce(sum(col("bd")).over(wBucket), lit(0L)))
      .withColumn("ot", coalesce(sum(col("bt")).over(wBucket), lit(0L)))
      .withColumn("ow", coalesce(sum(col("bw")).over(wBucket), lit(0L)))
      .select(col("bucket").as("ob"), col("od"), col("ot"), col("ow"))
    perDoc
      .withColumn("ld", count(lit(1)).over(wLocal))
      .withColumn("lt", sum(col("n_tokens")).over(wLocal))
      .withColumn("lw", sum(col("new_words")).over(wLocal))
      .join(broadcast(offsets), col("bucket") === col("ob"))
      .select((col("od") + col("ld")).as("docs_seen"),
        (col("ot") + col("lt")).as("cum_tokens"),
        (col("ow") + col("lw")).as("cum_vocab"))
      .filter(expr("(docs_seen & (docs_seen - 1)) = 0"))
      .orderBy("docs_seen")
  }

  val vocabGrowthOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, w FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> ''
      |), per_doc AS (
      |  SELECT t.doc_id, t.n_tokens, COALESCE(f.new_words, 0) AS new_words FROM
      |    (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY 1) t
      |    LEFT JOIN (
      |      SELECT doc_id, count(*) AS new_words FROM (
      |        SELECT w, min(doc_id) AS doc_id FROM toks GROUP BY w)
      |      GROUP BY doc_id) f USING (doc_id)
      |), cum AS (
      |  SELECT row_number() OVER (ORDER BY doc_id) AS docs_seen,
      |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens,
      |    sum(new_words) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_vocab
      |  FROM per_doc)
      |SELECT docs_seen, CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |       CAST(cum_vocab AS BIGINT) AS cum_vocab
      |FROM cum WHERE (docs_seen & (docs_seen - 1)) = 0
      |ORDER BY docs_seen""".stripMargin

  // ---------------------------------------------- Zipf frequency spectrum
  /** ZIPF FREQUENCY SPECTRUM — the corpus-health companion of
    * [[vocabGrowth]]: word types binned by log₂ of their corpus frequency
    * (bucket = bit length of the count, the same dialect-shared `bin()`
    * trick as the numeric log₂ histograms), with type/token counts and
    * integer-permille shares per bucket. Bucket 1 is the hapax legomena
    * (freq 1) — their type share is the classic ~50% Zipf sanity check,
    * and a corpus whose spectrum deviates hard (hapax collapse → heavy
    * templating/duplication; hapax explosion → OCR noise or tokenizer
    * mismatch) fails curation before any model sees it.
    *
    * 100 TB shape: one explode stream partial-aggregates per-partition on
    * `word` (map-side combine) before the single word-keyed shuffle; the
    * bucket rollup is O(log maxFreq) ≤ 64 rows, recombined with the 1-row
    * corpus totals by broadcast. No windows, no all-pairs. */
  def zipfProfile(spark: SparkSession, dir: String): DataFrame = {
    val freqs = table(spark, dir, "documents")
      .select(explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("f"))
    val buckets = freqs
      .select(length(expr("bin(f)")).cast("bigint").as("bucket"), col("f"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_types"), sum(col("f")).as("n_tokens"),
        min(col("f")).as("lo_freq"), max(col("f")).as("hi_freq"))
    val totals = buckets.agg(sum(col("n_tokens")).as("tt"), sum(col("n_types")).as("ty"))
    buckets.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_types"), col("n_tokens"),
        col("lo_freq"), col("hi_freq"),
        expr("CAST(n_tokens * 1000 div tt AS BIGINT)").as("token_permille"),
        expr("CAST(n_types * 1000 div ty AS BIGINT)").as("type_permille"))
      .orderBy("bucket")
  }

  val zipfProfileOracle: String =
    """WITH f AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY w
      |), b AS (
      |  SELECT CAST(length(bin(f)) AS BIGINT) AS bucket, count(*) AS n_types,
      |         CAST(sum(f) AS BIGINT) AS n_tokens, min(f) AS lo_freq, max(f) AS hi_freq
      |  FROM f GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tt, CAST(sum(n_types) AS BIGINT) AS ty FROM b
      |)
      |SELECT bucket, n_types, n_tokens, lo_freq, hi_freq,
      |       CAST(n_tokens * 1000 // tt AS BIGINT) AS token_permille,
      |       CAST(n_types * 1000 // ty AS BIGINT) AS type_permille
      |FROM b, t ORDER BY bucket""".stripMargin

  // -------------------------------------------- per-source lexical diversity
  /** PER-SOURCE LEXICAL DIVERSITY — the [[zipfProfile]] spectrum collapsed
    * to the three numbers a source-mix review reads: type/token ratio,
    * hapax share of the vocabulary, and the Simpson repeated-token
    * probability Σf(f−1)/N(N−1) — the chance two tokens drawn from the
    * source are the same word, i.e. templating concentration (the
    * token-level analogue of the HHI the source profile already computes
    * over languages). All three are exact integer ratios (permille / ppm):
    * the Simpson numerator runs in DECIMAL(38,0) because Σf² wraps int64
    * once a source passes ~3·10⁹ occurrences of one token.
    *
    * 100 TB shape: explode → (source, word) partial agg (map-side combine)
    * → per-source rollup of O(vocab) rows; no windows, no joins. */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    val f = table(spark, dir, "documents")
      .select(col("source"), explode(words).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source", "word").agg(count(lit(1)).as("f"))
    f.groupBy("source")
      .agg(sum(col("f")).as("n_tokens_raw"), count(lit(1)).as("n_types"),
        sum(when(col("f") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(expr("CAST(f AS DECIMAL(38,0)) * (f - 1)")).as("coll"))
      .select(col("source"),
        expr("CAST(n_tokens_raw AS BIGINT)").as("n_tokens"),
        col("n_types"),
        expr("CAST(n_hapax AS BIGINT)").as("n_hapax"),
        expr("CAST(n_types * 1000 div n_tokens_raw AS BIGINT)").as("ttr_permille"),
        expr("CAST(n_hapax * 1000 div n_types AS BIGINT)").as("hapax_permille"),
        expr("""CAST((1000000 * coll) div
               |  (CAST(n_tokens_raw AS DECIMAL(38,0)) * (n_tokens_raw - 1)) AS BIGINT)"""
          .stripMargin).as("simpson_ppm"))
      .orderBy("source")
  }

  val lexicalDiversityOracle: String =
    """WITH f AS (
      |  SELECT source, w, count(*) AS f FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE w <> '' GROUP BY source, w
      |), agg AS (
      |  SELECT source, sum(f) AS n_tokens, count(*) AS n_types,
      |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS n_hapax,
      |         sum(f * (f - 1)) AS coll
      |  FROM f GROUP BY source
      |)
      |SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, n_types,
      |       CAST(n_hapax AS BIGINT) AS n_hapax,
      |       CAST(n_types * 1000 // n_tokens AS BIGINT) AS ttr_permille,
      |       CAST(n_hapax * 1000 // n_types AS BIGINT) AS hapax_permille,
      |       CAST(1000000 * coll // (n_tokens * (n_tokens - 1)) AS BIGINT) AS simpson_ppm
      |FROM agg ORDER BY source""".stripMargin

  // ------------------------------------------------- quantile normalization
  /** Quantile normalization of `n_chars` ACROSS sources — every source's
    * length distribution is mapped onto the GLOBAL one by rank matching
    * (the batch-effect correction used when per-source crawling artifacts
    * shift a feature's distribution): doc at within-source rank r of m
    * lands on the global value at rank `1 + (r−1)(N−1) div (m−1)`, all in
    * exact integers (the rank product runs in DECIMAL(38,0) — (N−1)² wraps
    * int64 past ~10⁹ docs).
    *
    * No global row sort: the global rank→value lookup comes from the
    * grouped-value cumulative frame (the Gini two-level prefix) exploded
    * into one row per rank — a LINEAR frame joined by equi-key; the
    * within-source ranks are partition-parallel windows. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("source"),
      col("n_chars"))
    val ranked = docs
      .withColumn("r", row_number().over(
        Window.partitionBy("source").orderBy("n_chars", "doc_id")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("source")))
    val total = docs.agg(count(lit(1)).as("n_total"))
    val grp = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
      .withColumn("bucket", expr("n_chars div 1024"))
    val wLocal = Window.partitionBy("bucket").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBucket = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = grp.groupBy("bucket").agg(sum(col("c")).as("bc"))
      .withColumn("off", coalesce(sum(col("bc")).over(wBucket), lit(0L)))
      .select(col("bucket").as("ob"), col("off"))
    val lookup = grp
      .withColumn("local", sum(col("c")).over(wLocal))
      .join(broadcast(offsets), col("bucket") === col("ob"))
      .withColumn("cumw", col("off") + col("local"))
      .select(col("n_chars").as("v"),
        explode(sequence(col("cumw") - col("c") + 1, col("cumw"))).as("g"))
    ranked.crossJoin(broadcast(total))
      .withColumn("g", when(col("m") === 1, expr("(n_total + 1) div 2"))
        .otherwise(expr(
          "1 + CAST(CAST(r - 1 AS DECIMAL(38,0)) * (n_total - 1) div (m - 1) AS BIGINT)")))
      .join(lookup, "g")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("v").as("norm_chars"))
      .orderBy("doc_id")
  }

  val quantileNormalizeOracle: String =
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS r,
      |         count(*) OVER (PARTITION BY source) AS m
      |  FROM d),
      |n AS (SELECT count(*) AS n_total FROM d),
      |g AS (
      |  SELECT doc_id, source, n_chars,
      |    CASE WHEN m = 1 THEN (n_total + 1) // 2
      |         ELSE 1 + CAST(CAST(r - 1 AS HUGEINT) * (n_total - 1) // (m - 1) AS BIGINT)
      |    END AS g
      |  FROM r, n),
      |o AS (SELECT n_chars AS v, row_number() OVER (ORDER BY n_chars, doc_id) AS gr FROM d)
      |SELECT g.doc_id, g.source, g.n_chars, o.v AS norm_chars
      |FROM g JOIN o ON g.g = o.gr
      |ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------------------- PMI collocations
  /** Collocation mining: the word bigrams most over-represented vs chance,
    * ranked by pointwise mutual information — WITHOUT libm. PMI's log is
    * monotone in its argument, so ranking by the exact integer ratio
    * `10⁶ · c(xy) · n₁² / (n_b · c(x) · c(y))` (unigram totals n₁, bigram
    * total n_b) orders identically to PMI and both engines compute it
    * bit-for-bit in DECIMAL(38,0)/HUGEINT (the products pass 2⁶³ around
    * 10⁷ tokens — a 100 TB corpus is ~10¹³).
    *
    * Scale shape: bigram and unigram counts are partial-agg shuffles over
    * vocabulary-bounded keys (never corpus rows past the first combine);
    * the two count joins are vocab-side only; the min-support filter
    * (c(xy) ≥ minCount) cuts the frame before ranking, and the top-k is
    * TakeOrderedAndProject — no global sort anywhere. */
  def collocations(spark: SparkSession, dir: String, minCount: Int = 20,
      k: Int = 30): DataFrame = {
    // r16 (guide §2.3, project before the explode): the previous form
    // carried the WHOLE token array through posexplode so w2 could be
    // looked up by position — the Generate materialized the array once
    // per output row (measured 9× the bare explode at sf0.1). Pairs are
    // now generated ROW-LOCALLY as 2-structs; each exploded row carries
    // 2 words, never the document. Same pair multiset (probe-verified
    // equal counts), same oracle.
    val docs = table(spark, dir, "documents")
    val uni = docs.select(explode(words).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val big = docs.select(words.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    val totals = uni.agg(sum(col("c")).as("n1")).crossJoin(
      big.agg(sum(col("c_xy")).as("nb")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    big
      .join(uni.select(col("w").as("w1"), col("c").as("cx")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("num", dec(col("c_xy")) * dec(col("n1")) * dec(col("n1")) * 1000000)
      .withColumn("den", dec(col("nb")) * dec(col("cx")) * dec(col("cy")))
      // `div` is integral (truncating) division — DuckDB's `//` — where
      // decimal `/` would round half-up and disagree on ratio boundaries
      .select(col("w1"), col("w2"), col("c_xy"),
        expr("CAST(num div den AS BIGINT)").as("pmi_ratio_ppm"))
      .orderBy(col("pmi_ratio_ppm").desc, col("w1"), col("w2"))
      .limit(k)
  }

  def collocationsOracle(minCount: Int = 20, k: Int = 30): String =
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS ts FROM documents
       |), uni AS (
       |  SELECT w, CAST(count(*) AS HUGEINT) AS c FROM (
       |    SELECT unnest(ts) AS w FROM toks) WHERE w <> '' GROUP BY w
       |), big AS (
       |  SELECT w1, w2, CAST(count(*) AS HUGEINT) AS c_xy FROM (
       |    SELECT ts[i] AS w1, ts[i+1] AS w2
       |    FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM toks))
       |  WHERE w1 <> '' AND w2 <> ''
       |  GROUP BY w1, w2 HAVING count(*) >= $minCount
       |), tot AS (
       |  SELECT (SELECT sum(c) FROM uni) AS n1, (SELECT sum(c_xy) FROM big) AS nb
       |)
       |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       |  CAST(c_xy * n1 * n1 * 1000000 // (nb * ux.c * uy.c) AS BIGINT) AS pmi_ratio_ppm
       |FROM big
       |JOIN uni ux ON ux.w = big.w1
       |JOIN uni uy ON uy.w = big.w2
       |CROSS JOIN tot
       |ORDER BY pmi_ratio_ppm DESC, w1, w2 LIMIT $k""".stripMargin

  // -------------------------------------------------------- RAG chunking
  /** RAG CHUNK PLAN — the retrieval front-door: every document split into
    * overlapping token windows (64 tokens, stride 48 → 16-token overlap,
    * the common retrieval-chunking shape), each chunk carrying its stable
    * coordinates (token start/length) and an md5 content fingerprint of
    * the space-rejoined window. Chunk identity is (doc_id, chunk_idx) —
    * re-chunking an unchanged doc reproduces identical fingerprints, so an
    * embedding cache keys off chunk_md5 and only novel chunks are ever
    * re-embedded. A short trailing window is emitted as-is (never padded,
    * never silently dropped), so concatenating chunks at stride boundaries
    * reconstructs the doc exactly.
    *
    * 100 TB shape: a pure per-row projection + explode — no shuffle at all
    * except the presentation sort; the chunk stream feeds the embedding
    * seam partition-locally. */
  def ragChunks(spark: SparkSession, dir: String,
      window: Int = 64, stride: Int = 48): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("bigint"))
      .withColumn("n_chunks", expr(
        s"CASE WHEN n_tokens <= $window THEN 1L" +
          s" ELSE 1L + (n_tokens - $window + ${stride - 1}) div $stride END"))
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * stride.toLong)
      .withColumn("tok_len", least(lit(window.toLong), col("n_tokens") - col("tok_start")))
      .select(col("doc_id"), col("chunk_idx"), col("n_tokens"),
        col("tok_start"), col("tok_len"),
        md5(expr("array_join(slice(toks, cast(tok_start + 1 as int), cast(tok_len as int)), ' ')"))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  def ragChunksOracle(window: Int = 64, stride: Int = 48): String =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, toks, n_tokens,
       |    CASE WHEN n_tokens <= $window THEN 1
       |      ELSE 1 + (n_tokens - $window + ${stride - 1}) // $stride END AS n_chunks
       |  FROM t
       |), x AS (
       |  SELECT doc_id, toks, n_tokens,
       |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
       |  FROM c
       |)
       |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, n_tokens,
       |  CAST(chunk_idx * $stride AS BIGINT) AS tok_start,
       |  CAST(LEAST($window, n_tokens - chunk_idx * $stride) AS BIGINT) AS tok_len,
       |  md5(array_to_string(
       |    toks[CAST(chunk_idx * $stride + 1 AS INTEGER) :
       |         CAST(chunk_idx * $stride + LEAST($window, n_tokens - chunk_idx * $stride) AS INTEGER)],
       |    ' ')) AS chunk_md5
       |FROM x ORDER BY doc_id, chunk_idx""".stripMargin

  // --------------------------------------------------- Poisson bootstrap
  /** POISSON BOOTSTRAP CI (Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012) — per-source confidence interval
    * for mean document length WITHOUT resampling coordination: each (doc,
    * replicate) pair draws a Poisson(1) multiplicity from the
    * content-independent mixedHash (inverse-CDF thresholds in millionths,
    * capped at 6), so every replicate is a deterministic weighted mean any
    * engine reproduces bit-for-bit. The classic n-out-of-n bootstrap needs
    * a global row count per draw; the Poisson form is a PER-ROW projection
    * — the only shuffle carries (source × replicate) partial sums. CI
    * bounds are the 2nd and 39th order statistics of the 40 replicate
    * means (2.5%/97.5%, ties broken by replicate id).
    *
    * 100 TB shape: one scan, a 40-way row-local explode, map-side combine
    * down to |sources|·40 groups; the quantile step runs on ≤ 40 rows per
    * source. */
  def bootstrapCi(spark: SparkSession, dir: String, reps: Int = 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(spark, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
    val point = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      expr("sum(n_chars) * 1000 div count(*)").as("mean_milli"))
    val m = docs
      .select(col("doc_id"), col("source"), col("n_chars"),
        explode(expr(s"sequence(1, $reps)")).as("rep"))
      .withColumn("u", mixedHashOf("boot|",
        concat(col("doc_id").cast("string"), lit("|"), col("rep").cast("string"))) % 1000000L)
      .withColumn("m", expr(
        """CASE WHEN u < 367879 THEN 0L WHEN u < 735758 THEN 1L
          | WHEN u < 919698 THEN 2L WHEN u < 981011 THEN 3L
          | WHEN u < 996340 THEN 4L WHEN u < 999405 THEN 5L ELSE 6L END""".stripMargin))
      .groupBy("source", "rep")
      .agg(sum(col("m")).as("sw"),
        sum(col("m") * col("n_chars")).as("swx"))
      .withColumn("rep_mean_milli",
        expr("CAST(CAST(swx AS DECIMAL(38,0)) * 1000 div sw AS BIGINT)"))
    val ranked = m.withColumn("rn",
      row_number().over(Window.partitionBy("source").orderBy(col("rep_mean_milli"), col("rep"))))
    val ci = ranked.groupBy("source").agg(
      max(when(col("rn") === 2, col("rep_mean_milli"))).as("boot_lo_milli"),
      max(when(col("rn") === reps - 1, col("rep_mean_milli"))).as("boot_hi_milli"))
    point.join(ci, Seq("source"))
      .select(col("source"), col("n_docs"), col("mean_milli"),
        col("boot_lo_milli"), col("boot_hi_milli"),
        (col("boot_hi_milli") - col("boot_lo_milli")).as("ci_width_milli"))
      .orderBy("source")
  }

  def bootstrapCiOracle(reps: Int = 40): String =
    s"""WITH docs AS (
       |  SELECT doc_id, source, n_chars FROM documents
       |), point AS (
       |  SELECT source, count(*) AS n_docs,
       |    sum(n_chars) * 1000 // count(*) AS mean_milli
       |  FROM docs GROUP BY source
       |), drawn AS (
       |  SELECT source, n_chars, rep,
       |    ${mixedHashSql("boot|", "CAST(doc_id AS VARCHAR) || '|' || CAST(rep AS VARCHAR)")} % 1000000 AS u
       |  FROM docs, (SELECT unnest(generate_series(1, $reps)) AS rep)
       |), weighted AS (
       |  SELECT source, rep,
       |    CASE WHEN u < 367879 THEN 0 WHEN u < 735758 THEN 1
       |      WHEN u < 919698 THEN 2 WHEN u < 981011 THEN 3
       |      WHEN u < 996340 THEN 4 WHEN u < 999405 THEN 5 ELSE 6 END AS m,
       |    n_chars
       |  FROM drawn
       |), repmeans AS (
       |  SELECT source, rep,
       |    CAST(CAST(sum(m * n_chars) AS HUGEINT) * 1000 // sum(m) AS BIGINT)
       |      AS rep_mean_milli
       |  FROM weighted GROUP BY source, rep
       |), ranked AS (
       |  SELECT source, rep_mean_milli,
       |    row_number() OVER (PARTITION BY source ORDER BY rep_mean_milli, rep) AS rn
       |  FROM repmeans
       |), ci AS (
       |  SELECT source,
       |    max(CASE WHEN rn = 2 THEN rep_mean_milli END) AS boot_lo_milli,
       |    max(CASE WHEN rn = ${reps - 1} THEN rep_mean_milli END) AS boot_hi_milli
       |  FROM ranked GROUP BY source
       |)
       |SELECT p.source, CAST(n_docs AS BIGINT) AS n_docs,
       |  CAST(mean_milli AS BIGINT) AS mean_milli,
       |  boot_lo_milli, boot_hi_milli,
       |  boot_hi_milli - boot_lo_milli AS ci_width_milli
       |FROM point p JOIN ci USING (source)
       |ORDER BY source""".stripMargin

  // ----------------------------------------------- code-likeness screen
  /** Deterministic code-rendered twin of each doc for the code screen
    * (the [[graft.operators.WebNormalize]] `rawHtml` pattern): every
    * doc_id % 7 == 0 doc is re-rendered as a function skeleton with its
    * first 120 chars semicolon-delimited, the rest pass through verbatim.
    * One expression string shared by the Spark plan and the DuckDB
    * oracle, so the planted shape cannot drift between engines. At 100 TB
    * the synthesis is replaced by the raw crawl text — the DETECTOR below
    * is the operator. */
  private val codeRenderSql: String =
    """CASE WHEN doc_id % 7 = 0
      |     THEN 'void f() { return (' || replace(substring(text, 1, 120), ' ', '; ') || '); }'
      |     ELSE text END""".stripMargin

  /** Per-doc code-likeness flags over the rendered text: pure
    * length/replace counting (no regex dialect to reconcile) of the
    * symbols prose never carries — `;` `{}` `()` — plus a `return`
    * keyword hit, folded into an exact half-up symbol-density permille
    * and the keep decision `is_code = density ≥ 15‰ AND (keyword OR ≥ 5
    * semicolons)`. Row-local projection end to end. */
  private[graft] def codeFlags(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .withColumn("r", expr(codeRenderSql))
      .withColumn("chars", length(col("r")).cast("bigint"))
      .withColumn("n_semi",
        (length(col("r")) - length(expr("replace(r, ';', '')"))).cast("bigint"))
      .withColumn("n_brace",
        (length(col("r")) * 2 - length(expr("replace(r, '{', '')"))
          - length(expr("replace(r, '}', '')"))).cast("bigint"))
      .withColumn("n_paren",
        (length(col("r")) * 2 - length(expr("replace(r, '(', '')"))
          - length(expr("replace(r, ')', '')"))).cast("bigint"))
      .withColumn("kw_return",
        expr("CAST((length(r) - length(replace(r, 'return ', ''))) div 7 AS BIGINT)"))
      .withColumn("symbols", col("n_semi") + col("n_brace") + col("n_paren"))
      .withColumn("symbol_permille",
        expr("(1000 * symbols + chars div 2) div chars"))
      .withColumn("is_code",
        col("symbol_permille") >= 15 && (col("kw_return") >= 1 || col("n_semi") >= 5))

  /** CODE-LIKENESS RATES BY SOURCE — the prose/code composition read a
    * mixture owner takes before setting code-vs-text sampling weights
    * (and the screen that catches a "text" source that is secretly a code
    * dump): per source, docs, code-flagged docs, exact half-up ppm, and
    * the max symbol density seen. Detector signals are pure
    * length/replace counting over a row-local projection; the rollup is a
    * 20-group aggregate with map-side partials — the scan is the whole
    * cost at any scale. */
  def codeDetect(spark: SparkSession, dir: String): DataFrame =
    codeFlags(spark, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("code_docs"),
        max(col("symbol_permille")).as("max_symbol_permille"))
      .withColumn("code_ppm",
        expr("(code_docs * 1000000 + n_docs div 2) div n_docs"))
      .select("source", "n_docs", "code_docs", "code_ppm", "max_symbol_permille")
      .orderBy("source")

  val codeDetectOracle: String = {
    val render = codeRenderSql.replace("\n", "\n  ")
    s"""WITH rendered AS (
       |  SELECT doc_id, source, $render AS r FROM documents
       |), sig AS (
       |  SELECT doc_id, source,
       |    CAST(length(r) AS BIGINT) AS chars,
       |    CAST(length(r) - length(replace(r, ';', '')) AS BIGINT) AS n_semi,
       |    CAST(length(r) * 2 - length(replace(r, '{', '')) - length(replace(r, '}', '')) AS BIGINT) AS n_brace,
       |    CAST(length(r) * 2 - length(replace(r, '(', '')) - length(replace(r, ')', '')) AS BIGINT) AS n_paren,
       |    CAST((length(r) - length(replace(r, 'return ', ''))) // 7 AS BIGINT) AS kw_return
       |  FROM rendered
       |), flags AS (
       |  SELECT source,
       |    (1000 * (n_semi + n_brace + n_paren) + chars // 2) // chars AS symbol_permille,
       |    ((1000 * (n_semi + n_brace + n_paren) + chars // 2) // chars >= 15
       |      AND (kw_return >= 1 OR n_semi >= 5)) AS is_code
       |  FROM sig
       |)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) AS code_docs,
       |  (CAST(sum(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) * 1000000
       |    + CAST(count(*) AS BIGINT) // 2) // CAST(count(*) AS BIGINT) AS code_ppm,
       |  max(symbol_permille) AS max_symbol_permille
       |FROM flags GROUP BY source ORDER BY source""".stripMargin
  }
}
