package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The prefix-filtering join's whole claim is EXACTNESS (recall 1.0 at the
  * threshold, unlike LSH) — so the spec is equality against an in-Spark
  * brute-force all-pairs join, complementing the driver's DuckDB
  * brute-force oracle.
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def bruteForce(t10: Int): Set[(Long, Long)] = {
    val ws = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2)))).as("arr"))
    val a = ws.select(col("doc_id").as("id_a"), col("arr").as("arr_a"))
    val b = ws.select(col("doc_id").as("id_b"), col("arr").as("arr_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))).cast("bigint"))
      .withColumn("un", (size(col("arr_a")) + size(col("arr_b"))).cast("bigint") - col("inter"))
      .filter(col("inter") * 10 >= col("un") * t10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("prefix join == brute-force all-pairs at t=0.6 (recall AND precision 1.0)") {
    val got = Dedup.prefixFilterJoinPairs(spark, SparkSuite.Sf0001, t10 = 6)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = bruteForce(6)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)} " +
        s"sizes got=${got.size} want=${want.size}")
    assert(want.nonEmpty, "degenerate fixture: no pairs at t=0.6")
  }

  test("tighter threshold returns a subset") {
    val loose = Dedup.prefixFilterJoinPairs(spark, SparkSuite.Sf0001, t10 = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val tight = Dedup.prefixFilterJoinPairs(spark, SparkSuite.Sf0001, t10 = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(loose))
  }

  test("reported jaccard clears the threshold and matches inter/un") {
    val rows = Dedup.prefixFilterJoinPairs(spark, SparkSuite.Sf0001, t10 = 6).collect()
    rows.foreach { r =>
      val inter = r.getAs[Long]("inter"); val un = r.getAs[Long]("un")
      val j = r.getAs[Double]("jaccard")
      assert(j == inter.toDouble / un.toDouble)
      assert(inter * 10 >= un * 6)
    }
  }

  test("containment join == brute force, and catches a planted low-J embed") {
    import spark.implicits._
    val fixture = spark.read.parquet(s"${SparkSuite.Sf0001}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    // plant: a short excerpt (30 words) of the longest doc, as a new doc —
    // high containment in its source, tiny jaccard
    val longest = fixture.maxBy(_._2.length)
    val excerpt = longest._2.split(" ").slice(5, 35).mkString(" ")
    val planted = (fixture :+ (999999L, excerpt)).toSeq
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("containment_fix")
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.containmentJoinPairs(spark, tmp.toString, t10 = 9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // brute force over the same planted corpus
    val ws = planted
      .filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        array_distinct(transform(
          sequence(lit(1), size(col("ws")) - 2),
          i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2)))).as("arr"))
    val a = ws.select(col("doc_id").as("id_a"), col("arr").as("arr_a"))
    val b = ws.select(col("doc_id").as("id_b"), col("arr").as("arr_b"))
    val want = a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .withColumn("inter", size(array_intersect(col("arr_a"), col("arr_b"))).cast("bigint"))
      .filter(col("inter") * 10 >= size(col("arr_a")).cast("bigint") * 9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    // the planted excerpt is found inside its source document
    assert(got.contains((999999L, longest._1)), s"planted embed missed; got=$got")
    // ...and symmetric jaccard at 0.6 does NOT see that pair (the point)
    val jpairs = Dedup.prefixFilterJoinPairs(spark, tmp.toString, t10 = 6)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!jpairs.contains((999999L, longest._1)) &&
      !jpairs.contains((longest._1, 999999L)))
  }
}
