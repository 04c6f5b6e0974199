package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Property gates for DSIR-style importance resampling — value-exactness is
  * separately gated by the DuckDB oracles (`docs_dsir_importance`,
  * `docs_dsir_select`). These pin the semantics the hash can't explain:
  * target docs never scored, target-looking raw docs outrank raw-looking
  * ones, and the stratified top-decile cut is the exact ceil(n/10) rule.
  */
class DataSelectionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("dsir importance: scores exactly the non-target docs, weights positive") {
    val rows = DataSelection.dsirImportance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, source, nFeats, w) =>
      assert(!DataSelection.TargetSources.contains(source),
        s"doc $id from target source $source must not be importance-scored")
      assert(nFeats >= 1L, s"doc $id scored with zero features")
      assert(w > 0L, s"doc $id has non-positive weight $w")
    }
    // every raw doc with at least one token is present
    val expected = spark.read.parquet(s"$dir/documents.parquet")
      .filter(!col("source").isin(DataSelection.TargetSources: _*))
      .filter(size(filter(split(col("text"), " "), w => w =!= "")) >= 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == expected, "raw-doc coverage mismatch")
  }

  test("dsir importance: target-looking raw docs outrank raw-only docs") {
    // planted micro-corpus: the target domain speaks "alpha beta gamma";
    // raw doc 100 repeats the target phrase, raw docs 101-102 speak a
    // vocabulary the target has never seen. DSIR must rank 100 first.
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "en", "src1"),
      (2L, "alpha beta gamma gamma", "en", "src2"),
      (100L, "alpha beta gamma alpha", "en", "src9"),
      (101L, "zeta yota kappa zeta", "en", "src9"),
      (102L, "kappa yota zeta kappa yota", "en", "src9"))
    val tmp = java.nio.file.Files.createTempDirectory("dsir_tiny").toString
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val w = DataSelection.dsirImportance(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(w.keySet == Set(100L, 101L, 102L))
    assert(w(100L) > w(101L) && w(100L) > w(102L),
      s"target-like doc must outrank raw-only docs: $w")
    // and the top-decile cut (ceil(3/10) = 1) selects exactly doc 100
    val sel = DataSelection.dsirSelect(spark, tmp).collect()
    assert(sel.length == 1 && sel.head.getString(0) == "src9")
    assert(sel.head.getLong(2) == 1L, "ceil(3/10) must select exactly one doc")
    assert(sel.head.getLong(4) == w(100L),
      "the selected slice's mean weight must equal the top doc's weight")
  }

  test("dsir deployed: threshold form is consistent with the rank selection everywhere") {
    val rows = DataSelection.dsirDeployed(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"source ${r.getString(0)} deployed threshold drifted " +
        s"from its rank selection: sel=${r.getLong(2)} adm=${r.getLong(3)} ties=${r.getLong(4)}")
      assert(r.getLong(4) >= 1L, "the threshold doc itself must sit on the boundary")
    }
    // thresholds table agrees with the deployed view
    val thr = DataSelection.selectionThresholds(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(thr(r.getString(0)) == r.getLong(1)))
  }

  test("dsir select: exact ceil(n/10) per stratum, selected mean >= overall mean") {
    val perSource = DataSelection.dsirImportance(spark, dir).collect()
      .groupBy(_.getString(1)).map { case (s, rs) => s -> rs.length }
    val rows = DataSelection.dsirSelect(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (source, nRaw, nSel) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(nRaw == perSource(source).toLong, s"$source raw count")
      assert(nSel == (nRaw + 9) / 10, s"$source: selection is not ceil(n/10)")
      assert(r.getLong(4) >= r.getLong(3),
        s"$source: selected mean weight below overall mean")
      val permille = r.getLong(5)
      assert(permille >= 0L && permille <= 1000L, s"$source permille $permille")
    }
    assert(rows.map(_.getString(0)).toSet == perSource.keySet)
  }
}
