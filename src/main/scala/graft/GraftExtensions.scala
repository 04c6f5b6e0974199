package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorExpressions.{DoubleBits, FloatVectorDot, FloatVectorL2Sq, MinHashSignature, SignLshBuckets, SimHashWords, StringRollingHash}

/** `SparkSessionExtensions` hook exposing the engine's native expressions to
  * SQL — `spark.sql("SELECT vec_dot(a, b) ...")` — so the library composes
  * with plain-SQL pipelines, not just the Column API. Register with either
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDot)
    ext.injectFunction(GraftExtensions.rollingHash)
    ext.injectFunction(GraftExtensions.minhashSig)
    ext.injectFunction(GraftExtensions.simhashWords)
    ext.injectFunction(GraftExtensions.vecL2Sq)
    ext.injectFunction(GraftExtensions.signLshBuckets)
    ext.injectFunction(GraftExtensions.doubleBits)
    ext.injectFunction(GraftExtensions.misraGries)
    ext.injectFunction(GraftExtensions.multiLiteralMatches)
    ext.injectFunction(GraftExtensions.cmsEstimate)
    ext.injectFunction(GraftExtensions.bpeTokenCount)
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
  }
}

object GraftExtensions {

  /** Imperative registration on a live session — for REPL/test use where the
    * session predates the library (`withExtensions` only applies at
    * construction time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(vecDot, rollingHash, minhashSig, simhashWords, vecL2Sq, signLshBuckets, doubleBits,
        misraGries, multiLiteralMatches, cmsEstimate, bpeTokenCount).foreach { case (fid, i, b) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, fid, i, b)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandedRangeJoinRule
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity guard for the SQL builders: without it `SELECT vec_dot(a)` died
    * with an IndexOutOfBoundsException from `exprs(1)` instead of the
    * standard WRONG_NUM_ARGS analysis error (ADVICE r5). */
  private def requireArity(name: String, exprs: Seq[Expression], valid: Seq[Int]): Unit =
    if (!valid.contains(exprs.size))
      throw org.apache.spark.sql.graft.ColumnBridge.wrongNumArgs(name, valid, exprs.size)

  val vecDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    info("vec_dot", "vec_dot(a, b) - dot product of two array<float> vectors in double, strict left fold"),
    (exprs: Seq[Expression]) => {
      requireArity("vec_dot", exprs, Seq(2))
      FloatVectorDot(exprs(0), exprs(1))
    })

  val rollingHash: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_hash"),
    info("rolling_hash", "rolling_hash(s) - polynomial rolling hash (base 31, mod 1e9+7) over code points"),
    (exprs: Seq[Expression]) => {
      requireArity("rolling_hash", exprs, Seq(1))
      StringRollingHash(exprs(0))
    })

  val minhashSig: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    info("minhash_sig", "minhash_sig(shingles, k) - k md5-family minhash minima over an array<string> in one pass"),
    (exprs: Seq[Expression]) => {
      requireArity("minhash_sig", exprs, Seq(2))
      val k = exprs(1).eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long    => l.intValue()
        case other => throw new IllegalArgumentException(s"minhash_sig k must be an integer literal, got $other")
      }
      MinHashSignature(exprs(0), k)
    })

  val simhashWords: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_words"),
    info("simhash_words",
      "simhash_words(s, bits[, mod]) - one-pass word-level SimHash signature (rolling hash base 31)"),
    (exprs: Seq[Expression]) => {
      requireArity("simhash_words", exprs, Seq(2, 3))
      def intLit(e: Expression, what: String): Long = e.eval() match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long    => l.longValue()
        case other => throw new IllegalArgumentException(s"simhash_words $what must be an integer literal, got $other")
      }
      val bits = intLit(exprs(1), "bits").toInt
      val mod = if (exprs.size > 2) intLit(exprs(2), "mod") else 1000000007L
      SimHashWords(exprs(0), bits, mod)
    })

  val vecL2Sq: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_l2sq"),
    info("vec_l2sq", "vec_l2sq(a, b) - squared L2 distance of two array<float> vectors in double, strict left fold"),
    (exprs: Seq[Expression]) => {
      requireArity("vec_l2sq", exprs, Seq(2))
      FloatVectorL2Sq(exprs(0), exprs(1))
    })

  val doubleBits: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("double_bits"),
    info("double_bits",
      "double_bits(x) - doubleToLongBits(x + 0.0): injective long encoding of a double (-0.0 folded, NaN canonical) for distinct counting"),
    (exprs: Seq[Expression]) => {
      requireArity("double_bits", exprs, Seq(1))
      DoubleBits(exprs(0))
    })

  val misraGries: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries_agg"),
    info("misra_gries_agg",
      "misra_gries_agg(v, k) - mergeable Misra-Gries frequent-items summary: map value->count with at most k entries, error <= n/(k+1)"),
    (exprs: Seq[Expression]) => {
      requireArity("misra_gries_agg", exprs, Seq(2))
      val k = exprs(1).eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long    => l.intValue()
        case other => throw new IllegalArgumentException(s"misra_gries_agg k must be an integer literal, got $other")
      }
      graft.functions.MisraGriesAgg(exprs(0), k)
    })

  val signLshBuckets: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sign_lsh_buckets"),
    info("sign_lsh_buckets",
      "sign_lsh_buckets(v, tables, planesPerTable) - all sign-LSH bucket ids of an array<float> vector in one pass"),
    (exprs: Seq[Expression]) => {
      requireArity("sign_lsh_buckets", exprs, Seq(3))
      def intLit(e: Expression, what: String): Int = e.eval() match {
        case i: java.lang.Integer => i.intValue()
        case l: java.lang.Long    => l.intValue()
        case other => throw new IllegalArgumentException(s"sign_lsh_buckets $what must be an integer literal, got $other")
      }
      SignLshBuckets(exprs(0), intLit(exprs(1), "tables"), intLit(exprs(2), "planesPerTable"))
    })

  val bpeTokenCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_token_count"),
    info("bpe_token_count",
      "bpe_token_count(text) - BIGINT byte-pair-encoding token count of text under the built-in demo merge table (ordered-pass semantics; the Column API accepts a custom merges table)"),
    (exprs: Seq[Expression]) => {
      requireArity("bpe_token_count", exprs, Seq(1))
      graft.functions.Bpe.BpeTokenCount(exprs(0), graft.functions.Bpe.DemoMerges)
    })

  val cmsEstimate: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_estimate"),
    info("cms_estimate",
      "cms_estimate(sketch, item) - estimated count of a string item in count_min_sketch() bytes (never under; over by <= eps*n at the sketch confidence)"),
    (exprs: Seq[Expression]) => {
      requireArity("cms_estimate", exprs, Seq(2))
      graft.functions.CmsEstimate(exprs(0), exprs(1))
    })

  val multiLiteralMatches: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("multi_literal_matches"),
    info("multi_literal_matches",
      "multi_literal_matches(text, array('p0', 'p1', ...)) - ids of the literal patterns " +
        "contained in text, found in ONE Aho-Corasick pass (vs one contains() scan per pattern)"),
    (exprs: Seq[Expression]) => {
      requireArity("multi_literal_matches", exprs, Seq(2))
      // the pattern list must be a foldable array of string literals: the
      // automaton is built ONCE at plan time, not per row
      val patterns = exprs(1) match {
        case e if e.foldable => e.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toObjectArray(org.apache.spark.sql.types.StringType)
              .map(v => if (v == null) null else v.toString).toSeq
          case other => throw new IllegalArgumentException(
            s"multi_literal_matches patterns must be an array literal, got $other")
        }
        case other => throw new IllegalArgumentException(
          s"multi_literal_matches patterns must be foldable, got $other")
      }
      require(patterns.forall(_ != null), "multi_literal_matches patterns must be non-null")
      graft.functions.MultiLiteral.MultiLiteralMatches(exprs(0), patterns)
    })
}
