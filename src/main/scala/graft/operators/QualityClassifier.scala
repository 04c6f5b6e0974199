package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained quality classifier, fastText-style (Joulin et al. 2016,
  * arXiv:1607.01759; the CommonCrawl-pipeline usage is the GPT-3/CCNet
  * "train a linear classifier on a high-quality proxy, score the crawl"
  * recipe): proxy labels come from the engine's own CCNet terciles
  * ([[TextAnalysis.unigramSurprisal]] — head = positive, tail = negative,
  * middle held out), a Naive-Bayes bag-of-words model is fit distributed in
  * ONE closed-form pass (no SGD — the count ratios ARE the model), and the
  * whole corpus is re-scored under the trained model, including the held-out
  * middle band the labels never saw. This composes two rounds of machinery:
  * the tokenize-once artifact feeds the LM bucketing, the classifier fit,
  * and the scoring side of the SAME DAG.
  *
  * Engine semantics (exact-integer surrogate, the [[DataSelection]] /
  * [[TextAnalysis.unigramSurprisal]] precedent): per-word class evidence is
  * the add-1-smoothed likelihood ratio in integer micro-units,
  * `ratio_micro(w) = 10⁶·(c_pos+1)·(tot_neg+V) div ((c_neg+1)·(tot_pos+V))`,
  * a document's score is its tf-weighted MEAN ratio (integral `div`, words
  * unseen in training fall back to the smoothed unseen ratio), and the
  * decision rule is `score_micro > 10⁶` (mean evidence favors the positive
  * class). The published NB sums per-word LOG ratios — the mean-ratio form
  * keeps the same per-word evidence and direction in exact integer
  * arithmetic so fit, scoring, and the decision boundary all sit under the
  * DuckDB oracle instead of diverging in `ln` ulps.
  *
  * 100 TB shape: the corpus shuffles ONCE into the (doc, word) tf frame
  * (shared via lazy localCheckpoint across the bucket fit, the class-count
  * fit, and scoring); class counts reduce to a VOCAB-sized table (Zipf-
  * bounded) that scoring joins back on `word` — a vocab-keyed shuffle join,
  * never a broadcast of something corpus-sized and never a second corpus
  * tokenization. The model digest's top-k is TakeOrdered before any rank
  * window (the labelOutliers discipline). Integer headroom: score_micro can
  * reach ~10⁶·tot_neg only for a word carrying the entire positive mass
  * while absent from negatives — the analogous pure-hapax boundary to
  * [[TextAnalysis.unigramSurprisalFrom]]'s documented one.
  */
object QualityClassifier {

  private val DigestK = 25

  /** (doc_id, word) tf frame + CCNet buckets, built once and shared. */
  private def pieces(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docTerm = TextAnalysis.docTermTf(spark, dir).localCheckpoint(false)
    val buckets = TextAnalysis.unigramSurprisalFrom(docTerm).localCheckpoint(false)
    (docTerm, buckets)
  }

  /** Vocab-sized model: word, c_pos, c_neg plus the 1-row scalar frame
    * (tot_pos, tot_neg, v, unseen_micro). */
  private def fit(docTerm: DataFrame, buckets: DataFrame): (DataFrame, DataFrame) = {
    val labeled = buckets
      .filter(col("bucket").isin("head", "tail"))
      .select(col("doc_id"), (col("bucket") === "head").as("pos"))
    val cls = docTerm.join(labeled, "doc_id")
      .groupBy("word")
      .agg(sum(when(col("pos"), col("tf")).otherwise(0L)).as("c_pos"),
        sum(when(!col("pos"), col("tf")).otherwise(0L)).as("c_neg"))
    val scal = cls.agg(
      sum("c_pos").as("tot_pos"), sum("c_neg").as("tot_neg"),
      count(lit(1)).as("v"))
      .withColumn("unseen_micro", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * (tot_neg + v)) div (tot_pos + v) AS BIGINT)"))
    val ratios = cls.crossJoin(broadcast(scal))
      .select(col("word"), col("c_pos"), col("c_neg"), expr(
        """CAST((CAST(1000000 AS DECIMAL(38,0)) * (c_pos + 1) * (tot_neg + v))
          | div ((CAST(c_neg AS DECIMAL(38,0)) + 1) * (tot_pos + v)) AS BIGINT)"""
          .stripMargin.replace("\n", "")).as("ratio_micro"))
    (ratios, scal)
  }

  /** Model digest: the [[DigestK]] strongest positive-evidence words and the
    * [[DigestK]] strongest negative-evidence words, with their class counts
    * and ratios. TakeOrdered (orderBy+limit) before the 25-row rank window. */
  def classifierTrain(spark: SparkSession, dir: String): DataFrame = {
    val (docTerm, buckets) = pieces(spark, dir)
    val (ratios, _) = fit(docTerm, buckets)
    def side(name: String, ordered: DataFrame): DataFrame = {
      val w = Window.partitionBy("side").orderBy(
        if (name == "pos") col("ratio_micro").desc else col("ratio_micro").asc,
        col("word"))
      ordered.limit(DigestK)
        .withColumn("side", lit(name))
        .withColumn("rank", row_number().over(w).cast("bigint"))
    }
    val pos = side("pos", ratios.orderBy(col("ratio_micro").desc, col("word")))
    val neg = side("neg", ratios.orderBy(col("ratio_micro").asc, col("word")))
    pos.unionByName(neg)
      .select("side", "rank", "word", "c_pos", "c_neg", "ratio_micro")
      .orderBy("side", "rank")
  }

  /** Corpus-wide calibration: every doc re-scored under the trained model
    * and cross-tabbed against its proxy tercile — head should read mostly
    * positive, tail mostly negative, and the held-out middle band splits.
    * Rows: (bucket, predicted) with doc count and exact mean score. */
  def classifierConfusion(spark: SparkSession, dir: String): DataFrame = {
    val (docTerm, buckets) = pieces(spark, dir)
    val (ratios, scal) = fit(docTerm, buckets)
    val scored = scoreByJoin(docTerm, ratios, scal)
    scored.join(buckets.select("doc_id", "bucket"), "doc_id")
      .withColumn("predicted", when(col("score_micro") > 1000000L, "pos").otherwise("neg"))
      .groupBy("bucket", "predicted")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(CAST(score_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_score_micro"))
      .orderBy("bucket", "predicted")
  }

  /** Un-checkpointed twin for plan audits ([[TextAnalysis.unigramSurprisalPlan]]
    * pattern): the gated form's tokenize-once checkpoints collapse the
    * upstream to RDD scans in explain output. */
  private[graft] def classifierConfusionPlan(spark: SparkSession, dir: String): DataFrame = {
    val docTerm = TextAnalysis.docTermTf(spark, dir)
    val buckets = TextAnalysis.unigramSurprisalFrom(docTerm)
    val (ratios, scal) = fit(docTerm, buckets)
    scoreByJoin(docTerm, ratios, scal)
      .join(buckets.select("doc_id", "bucket"), "doc_id")
      .withColumn("predicted", when(col("score_micro") > 1000000L, "pos").otherwise("neg"))
      .groupBy("bucket", "predicted")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(CAST(score_micro AS DECIMAL(38,0))) div count(1) AS BIGINT)")
          .as("mean_score_micro"))
      .orderBy("bucket", "predicted")
  }

  /** Per-doc scoring via the vocab-keyed JOIN shape (the scale path: the
    * ratio table shuffles by word, never broadcasts with the corpus). */
  private def scoreByJoin(docTerm: DataFrame, ratios: DataFrame,
      scal: DataFrame): DataFrame =
    docTerm
      .join(ratios.select("word", "ratio_micro"), Seq("word"), "left")
      .crossJoin(broadcast(scal.select("unseen_micro")))
      .withColumn("r", coalesce(col("ratio_micro"), col("unseen_micro")))
      .groupBy("doc_id")
      .agg(expr("CAST(sum(CAST(tf AS DECIMAL(38,0)) * r) div sum(tf) AS BIGINT)")
        .as("score_micro"))

  /** Per-doc trained scores through the join shape — the referee frame the
    * streaming twin's row-local map scoring is spec-compared against. */
  private[graft] def perDocScores(spark: SparkSession, dir: String): DataFrame = {
    val (docTerm, buckets) = pieces(spark, dir)
    val (ratios, scal) = fit(docTerm, buckets)
    scoreByJoin(docTerm, ratios, scal)
  }

  /** The trained model FROZEN as one broadcastable row: a word→ratio map
    * plus the smoothed unseen fallback — the side input the streaming twin
    * scores against (the StreamingIvfMaintenance frozen-centroid
    * precedent). Vocab-bounded (Zipf), never corpus-sized. */
  def modelRow(spark: SparkSession, dir: String): DataFrame = {
    val (docTerm, buckets) = pieces(spark, dir)
    val (ratios, scal) = fit(docTerm, buckets)
    ratios
      .agg(map_from_entries(collect_list(struct(col("word"), col("ratio_micro"))))
        .as("model"))
      .crossJoin(broadcast(scal.select("unseen_micro")))
  }

  /** Shared oracle chain: the full CCNet-tercile replay embedded as a
    * derived table (ONE copy of that policy —
    * [[TextAnalysis.unigramSurprisalOracle]] verbatim, so the label side can
    * never drift from the gated `docs_ccnet_buckets` row), then the
    * closed-form NB fit. */
  private def oracleChain: String =
    s"""WITH buckets AS (
       |  SELECT * FROM (${TextAnalysis.unigramSurprisalOracle})
       |), dt AS (
       |  SELECT doc_id, w.word, count(*) AS tf
       |  FROM documents, unnest(string_split(text, ' ')) AS w(word)
       |  WHERE w.word != ''
       |  GROUP BY doc_id, w.word
       |), lab AS (
       |  SELECT doc_id, bucket = 'head' AS pos FROM buckets
       |  WHERE bucket IN ('head', 'tail')
       |), cls AS (
       |  SELECT dt.word,
       |    CAST(sum(CASE WHEN pos THEN tf ELSE 0 END) AS BIGINT) AS c_pos,
       |    CAST(sum(CASE WHEN NOT pos THEN tf ELSE 0 END) AS BIGINT) AS c_neg
       |  FROM dt JOIN lab USING (doc_id) GROUP BY dt.word
       |), scal AS (
       |  SELECT CAST(sum(c_pos) AS BIGINT) AS tot_pos,
       |    CAST(sum(c_neg) AS BIGINT) AS tot_neg,
       |    CAST(count(*) AS BIGINT) AS v,
       |    CAST((CAST(1000000 AS HUGEINT) * (sum(c_neg) + count(*)))
       |      // (sum(c_pos) + count(*)) AS BIGINT) AS unseen_micro
       |  FROM cls
       |), ratio AS (
       |  SELECT word, c_pos, c_neg,
       |    CAST((CAST(1000000 AS HUGEINT) * (c_pos + 1) * (tot_neg + v))
       |      // ((CAST(c_neg AS HUGEINT) + 1) * (tot_pos + v)) AS BIGINT) AS ratio_micro
       |  FROM cls, scal
       |)""".stripMargin

  val classifierTrainOracle: String =
    s"""$oracleChain, ranked AS (
       |  SELECT 'pos' AS side,
       |    CAST(row_number() OVER (ORDER BY ratio_micro DESC, word) AS BIGINT) AS rank,
       |    word, c_pos, c_neg, ratio_micro
       |  FROM ratio
       |  UNION ALL
       |  SELECT 'neg' AS side,
       |    CAST(row_number() OVER (ORDER BY ratio_micro ASC, word) AS BIGINT) AS rank,
       |    word, c_pos, c_neg, ratio_micro
       |  FROM ratio
       |)
       |SELECT side, rank, word, c_pos, c_neg, ratio_micro
       |FROM ranked WHERE rank <= $DigestK
       |ORDER BY side, rank""".stripMargin

  /** Per-doc trained scores as a standalone oracle query — the label CTE
    * other oracles (the filter-agreement matrix) embed to re-derive the
    * classifier's admit flag without drifting from the gated chain. */
  val perDocScoresOracle: String =
    s"""$oracleChain
       |SELECT dt.doc_id,
       |  CAST(sum(CAST(dt.tf AS HUGEINT) * coalesce(r.ratio_micro, scal.unseen_micro))
       |    // sum(dt.tf) AS BIGINT) AS score_micro
       |FROM dt LEFT JOIN ratio r ON r.word = dt.word CROSS JOIN scal
       |GROUP BY dt.doc_id""".stripMargin

  val classifierConfusionOracle: String =
    s"""$oracleChain, scored AS (
       |  SELECT dt.doc_id,
       |    CAST(sum(CAST(dt.tf AS HUGEINT) * coalesce(r.ratio_micro, scal.unseen_micro))
       |      // sum(dt.tf) AS BIGINT) AS score_micro
       |  FROM dt LEFT JOIN ratio r ON r.word = dt.word CROSS JOIN scal
       |  GROUP BY dt.doc_id
       |)
       |SELECT b.bucket,
       |  CASE WHEN s.score_micro > 1000000 THEN 'pos' ELSE 'neg' END AS predicted,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CAST(s.score_micro AS HUGEINT)) // count(*) AS BIGINT) AS mean_score_micro
       |FROM scored s JOIN buckets b USING (doc_id)
       |GROUP BY b.bucket, predicted
       |ORDER BY b.bucket, predicted""".stripMargin
}
