package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Planted-graph exactness for the parallel-peel k-core (the fixture-scale
  * summary is rows-only at the driver; the property gate is oracle-gated).
  */
class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    var cur = edges
    var changed = true
    while (changed) {
      val deg = cur.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != cur.size
      cur = next
    }
    cur.toSet
  }

  private def core(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.kCoreOf(edges.toDF("id_a", "id_b"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("nested peel: the 3-core of the 2-core equals the 3-core of the full graph (r17 sharedKCore shape)") {
    import spark.implicits._
    // K4 + triangle + pendant chains: distinct 2-core and 3-core layers
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L), (4L, 10L))
    val chain = Seq((12L, 20L), (20L, 21L), (21L, 22L))
    val g = k4 ++ tri ++ chain
    val fromScratch = core(g, 3)
    val core2 = Dedup.kCoreOf(g.toDF("id_a", "id_b"), 2)
    val from2core = Dedup.kCoreOf(core2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(from2core == fromScratch)
    assert(fromScratch == bruteKCore(g, 3))
  }

  test("k-core: triangle with a pendant chain peels to the triangle at k=2") {
    // triangle 1-2-3 plus chain 3-4-5: peeling 5 exposes 4, which peels too
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, 2) == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    assert(core(g, 3).isEmpty) // a triangle has degree 2, no 3-core
  }

  test("k-core: K4 survives k=3; cascade removal needs multiple rounds") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // long pendant chain off node 1 forces round-by-round cascade
    val chain = (1L to 6L).map(i => (if (i == 1) 1L else 100L + i - 1, 100L + i))
    val g = k4 ++ chain
    assert(core(g, 2) == k4.toSet)
    assert(core(g, 3) == k4.toSet)
  }

  test("k-core: matches brute force on a planted random graph") {
    val rnd = new scala.util.Random(42)
    val edges = (1 to 300).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    for (k <- Seq(2, 3, 4))
      assert(core(edges, k) == bruteKCore(edges, k), s"k=$k mismatch")
  }

  test("k-core gate holds on fixtures and the summary is consistent") {
    val gate = Dedup.kCoreGate(spark, SparkSuite.Sf0001).collect().head
    assert(gate.getAs[Boolean]("every_core_node_deg_ge_k"))
    assert(gate.getAs[Boolean]("no_single_node_addable"))
    val rows = Dedup.kCoreSummary(spark, SparkSuite.Sf0001).collect()
    val byK = rows.map(r => r.getAs[Long]("k") ->
      (r.getAs[Long]("n_core_nodes"), r.getAs[Long]("n_core_edges"))).toMap
    // cores are nested: the 3-core is a subgraph of the 2-core
    assert(byK(3L)._1 <= byK(2L)._1 && byK(3L)._2 <= byK(2L)._2)
    // min degree >= k forces n_edges >= n_nodes * k / 2
    byK.foreach { case (k, (n, e)) => assert(2 * e >= n * k, s"k=$k n=$n e=$e") }
  }
}
