package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Exact behavior of the FFD packer + the dim-stats hygiene invariants. */
class CompactionPlanSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("packFFD: known optimal packing, big files pass through untouched") {
    // target 100: sizes 60,40 | 50,50 | 30,30,30 -> 3 bins; 250 is its own
    val files = Seq("a" -> 60L, "b" -> 40L, "c" -> 50L, "d" -> 50L,
      "e" -> 30L, "f" -> 30L, "g" -> 30L, "huge" -> 250L)
    val bins = CompactionPlan.packFFD(files, targetBytes = 100L)
    assert(bins.map(_.bytes).sum == files.map(_._2).sum)
    assert(bins.map(_.files).sum == files.size.toLong)
    val big = bins.filter(_.alreadyCompact)
    assert(big.map(_.bytes) == Seq(250L) && big.head.files == 1L)
    val packed = bins.filterNot(_.alreadyCompact)
    assert(packed.forall(_.bytes <= 100L))
    assert(packed.size == 3, s"FFD should reach the optimal 3 bins, got $packed")
    // deterministic: same input, same plan
    assert(bins == CompactionPlan.packFFD(files, 100L))
    // bin ids are dense 0..n-1
    assert(bins.map(_.id) == bins.indices.map(_.toLong))
  }

  test("plan over a fixture table: totals reconcile with the file listing") {
    val rows = CompactionPlan.plan(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("total_bytes")).sum
    val onDisk = new java.io.File(s"${SparkSuite.Sf0001}/documents.parquet")
    val want = if (onDisk.isFile) onDisk.length
      else onDisk.listFiles.filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length).sum
    assert(total == want)
  }

  test("dim stats: zero-variance dim is flagged dead; n is the vector count") {
    val rows = graft.operators.Similarity.dimStats(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    val n = spark.read.parquet(s"${SparkSuite.Sf0001}/embeddings.parquet").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("var_micro2") >= 0.0)
      assert(r.getAs[Boolean]("is_dead") ==
        (r.getAs[Long]("min_micro") == r.getAs[Long]("max_micro")))
      assert(r.getAs[Long]("min_micro") <= r.getAs[Long]("max_micro"))
    }
  }
}
