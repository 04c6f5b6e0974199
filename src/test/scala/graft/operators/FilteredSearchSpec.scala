package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, SparkSuite}

/** Filtered vector search (round 11): semantics the oracle hash can't
  * articulate — predicate containment, pool accounting, and the
  * post-filter-vs-exact recall relationship.
  */
class FilteredSearchSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  private lazy val labels: Map[Long, Int] =
    Fixtures.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("pre-filter exact top-k: every hit shares the query's label; pool is exact") {
    val rows = Similarity.filteredTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    val perLabelPool = labels.values.groupBy(identity).view.mapValues(_.size).toMap
    rows.foreach { r =>
      val q = r.getLong(0); val lbl = r.getLong(1); val cand = r.getLong(2)
      assert(labels(q).toLong == lbl, s"row carries label $lbl but query $q has ${labels(q)}")
      assert(labels(cand).toLong == lbl, s"candidate $cand leaked through the label filter")
      assert(cand != q)
      // n_eligible = same-label vectors minus the query itself
      assert(r.getLong(5) == perLabelPool(labels(q)).toLong - 1)
    }
    // ranks contiguous from 1 and cosine non-increasing per query
    rows.groupBy(_.getLong(0)).values.foreach { qr =>
      val sorted = qr.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to sorted.length))
      val cos = sorted.map(_.getDouble(4))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("nprobe sweep: recall is monotone in nprobe and the full probe recovers everything") {
    val rows = Similarity.filteredNprobeSweep(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val gtN = Similarity.filteredTopK(spark, dir).count()
    rows.foreach { r =>
      assert(r.getLong(3) == gtN)
      assert(r.getLong(2) <= r.getLong(1), "hits cannot exceed returned rows")
      assert(r.getLong(4) == (r.getLong(2) * 1000 + gtN / 2) / gtN)
    }
    val recalls = rows.map(_.getLong(4))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall not monotone in nprobe: ${recalls.mkString(",")}")
    // the sweep must actually discriminate: nprobe=1 below nprobe=8
    assert(recalls.head < recalls.last, s"sweep is flat: ${recalls.mkString(",")}")
  }

  test("post-filter IVF: survivors pass the filter; hit flags match the exact answer") {
    val exact = Similarity.filteredTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.filteredIvfTopK(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getLong(0); val cand = r.getLong(1)
      assert(labels(cand) == labels(q), s"candidate $cand has the wrong label for query $q")
      assert((r.getLong(4) == 1L) == exact.contains((q, cand)),
        s"hit flag for ($q,$cand) disagrees with the exact filtered top-k")
    }
    // the whole point of the table: post-filtering on a selective predicate
    // must surface at least SOME of the exact answer here (recall floor),
    // while any starvation shows up as missing ranks — assert both are
    // observable rather than silently empty
    val hits = rows.count(_.getLong(4) == 1L)
    assert(hits >= rows.length / 4, s"filtered recall collapsed: $hits/${rows.length}")
  }
}
