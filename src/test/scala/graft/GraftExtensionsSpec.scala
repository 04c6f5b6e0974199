package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registered SQL functions must agree with the Column-API forms.
  * (`withExtensions` only applies when constructing a NEW SparkContext, so
  * the suite exercises the live-session registration path the extension
  * class delegates to.) */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark = {
    val s = SparkSuite.spark
    GraftExtensions.register(s)
    s
  }

  test("vec_dot / rolling_hash / minhash_sig are SQL-callable and correct") {
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |          array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |  rolling_hash('ab') AS h,
        |  minhash_sig(array('x', 'y'), 2) AS sig
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 4.0)
    // ('a'=97)*31 + 98 = 3105
    assert(r.getLong(1) == 97L * 31 + 98)
    val sig = r.getSeq[String](2)
    assert(sig.length == 2)
    // element 0 = min(md5("0|x"), md5("0|y")) — verify against built-in md5
    val mins = spark.sql(
      "SELECT least(md5('0|x'), md5('0|y')) AS m0, least(md5('1|x'), md5('1|y')) AS m1")
      .collect()(0)
    assert(sig == Seq(mins.getString(0), mins.getString(1)))
  }

  test("SQL vec_l2sq and sign_lsh_buckets agree with the Column API") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${SparkSuite.Sf0001}/embeddings.parquet").limit(20)
    df.createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT vec_id, vec_l2sq(embedding, embedding) AS z,
        |       sign_lsh_buckets(embedding, 8, 4) AS b
        |FROM emb_ext""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toSeq
    val viaCol = df.select(col("vec_id"),
        graft.functions.VectorExpressions.vec_l2sq(col("embedding"), col("embedding")).as("z"),
        graft.functions.VectorExpressions.sign_lsh_buckets(col("embedding"), 8, 4).as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toSeq
    assert(viaSql.sortBy(_._1) == viaCol.sortBy(_._1))
    assert(viaSql.forall(_._2 == 0.0)) // l2sq(v, v) is exactly zero
  }

  test("SQL simhash_words agrees with the Column API") {
    graft.GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT simhash_words('hello world foo', 16) AS s").collect()(0).getLong(0)
    val viaCol = spark.sql("SELECT 'hello world foo' AS t")
      .select(graft.functions.VectorExpressions.simhash_words(org.apache.spark.sql.functions.col("t"), 16).as("s"))
      .collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }

  test("SQL rolling_hash agrees with the Column API on fixture text") {
    import org.apache.spark.sql.functions.col
    val d = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
    d.createOrReplaceTempView("docs_ext")
    val viaSql = spark.sql("SELECT doc_id, rolling_hash(text) AS h FROM docs_ext ORDER BY doc_id")
      .collect().map(_.getLong(1)).toSeq
    val viaCol = d.select(col("doc_id"), graft.operators.TextAnalysis.rollingHash(col("text")).as("h"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(viaSql == viaCol)
  }

  test("wrong arity raises the standard analysis error, not IndexOutOfBounds (ADVICE r5)") {
    def analysisError(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        Option(e.getCause).exists(_.isInstanceOf[org.apache.spark.sql.AnalysisException]),
        s"expected AnalysisException for `$sql`, got ${e.getClass.getName}: ${e.getMessage}")
      assert(!e.isInstanceOf[IndexOutOfBoundsException])
    }
    analysisError("SELECT vec_dot(array(CAST(1.0 AS FLOAT)))")
    analysisError("SELECT vec_l2sq(array(CAST(1.0 AS FLOAT)))")
    analysisError("SELECT rolling_hash('a', 'b')")
    analysisError("SELECT minhash_sig(array('x'))")
    analysisError("SELECT simhash_words('text')")
    analysisError("SELECT sign_lsh_buckets(array(CAST(1.0 AS FLOAT)), 2)")
    analysisError("SELECT misra_gries_agg('x')")
  }

  test("SQL misra_gries_agg aggregates and agrees with the Column API (exact regime)") {
    import spark.implicits._
    (1 to 90).map(i => s"v${i % 3}").toDF("v").createOrReplaceTempView("mg_in")
    val viaSql = spark.sql("SELECT misra_gries_agg(v, 8) AS mg FROM mg_in")
      .collect()(0).getMap[String, Long](0).toMap
    val viaCol = spark.table("mg_in")
      .agg(graft.functions.MisraGriesAgg.misra_gries_agg(org.apache.spark.sql.functions.col("v"), 8))
      .collect()(0).getMap[String, Long](0).toMap
    // k=8 > 3 distinct: both exact
    assert(viaSql == Map("v0" -> 30L, "v1" -> 30L, "v2" -> 30L))
    assert(viaSql == viaCol)
    // GROUP BY path: the aggregate must also work per-group
    val grouped = spark.sql(
      "SELECT length(v) AS g, misra_gries_agg(v, 4) AS mg FROM mg_in GROUP BY length(v)")
      .collect()
    assert(grouped.length == 1 && grouped(0).getMap[String, Long](1).values.sum == 90L)
    // numeric inputs coerce to their string render at analysis time
    // (ImplicitCastInputTypes) instead of a mid-job ClassCastException
    val numeric = spark.sql("SELECT misra_gries_agg(length(v), 8) AS mg FROM mg_in")
      .collect()(0).getMap[String, Long](0).toMap
    assert(numeric == Map("2" -> 90L))
  }

  test("SQL multi_literal_matches agrees with the Column API; non-literal patterns rejected") {
    val viaSql = spark.sql(
      "SELECT multi_literal_matches('ushers at the show', array('he', 'she', 'his', 'hers')) AS m")
      .collect()(0).getSeq[Int](0)
    assert(viaSql == Seq(0, 1, 3)) // he, she, hers — not his
    val viaCol = spark.range(1).select(
      graft.functions.MultiLiteral.multi_literal_matches(
        org.apache.spark.sql.functions.lit("ushers at the show"),
        Seq("he", "she", "his", "hers")).as("m"))
      .collect()(0).getSeq[Int](0)
    assert(viaSql == viaCol)
    // a non-foldable pattern array would rebuild the automaton per row —
    // rejected at analysis time
    spark.range(1).selectExpr("CAST(id AS STRING) AS s").createOrReplaceTempView("mlm_in")
    val err = intercept[Exception] {
      spark.sql("SELECT multi_literal_matches(s, array(s)) FROM mlm_in").collect()
    }
    assert(err.getMessage.contains("foldable") || err.getMessage.contains("literal"),
      s"unexpected error: ${err.getMessage}")
  }

  test("SQL cms_estimate probes a count_min_sketch built in SQL") {
    import spark.implicits._
    (Seq.fill(40)("x") ++ Seq.fill(9)("y")).toDF("v").createOrReplaceTempView("cms_in")
    val rows = spark.sql(
      """SELECT cms_estimate(sk, 'x') AS ex, cms_estimate(sk, 'y') AS ey FROM (
        |  SELECT count_min_sketch(v, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 7) AS sk
        |  FROM cms_in)""".stripMargin).collect()(0)
    // eps*n < 1 -> exact
    assert(rows.getAs[Long]("ex") == 40L && rows.getAs[Long]("ey") == 9L)
  }

  test("SQL bpe_token_count applies the demo merge table") {
    val r = spark.sql(
      "SELECT bpe_token_count('the thing 42!') AS n, bpe_token_count(CAST(NULL AS STRING)) AS z")
      .collect()(0)
    // the->1, thing->[th,ing]=2, 42->1, !->1
    assert(r.getAs[Long]("n") == 5L)
    assert(r.isNullAt(1))
    // arity guard raises the standard analysis error, not an index crash
    val err = intercept[Exception](spark.sql("SELECT bpe_token_count()").collect())
    assert(err.getMessage.toLowerCase.contains("parameter") ||
      err.getMessage.contains("WRONG_NUM_ARGS"), s"unexpected: ${err.getMessage}")
  }
}
