package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Session-free property battery for the Misra-Gries aggregate: the
  * update/merge/serialize contract is driven DIRECTLY (BoundReference +
  * InternalRow), so hundreds of random (stream, k, partitioning, merge
  * order) cases run in milliseconds and the n/(k+1) guarantee is checked
  * against exact counts on every one — including with a serde round-trip
  * on every partial buffer, the path shuffles exercise.
  */
class MisraGriesPropertySpec extends AnyFunSuite {

  /** Run the aggregate over `stream` split into `parts` contiguous chunks,
    * merging the partial buffers in a random order. */
  private def run(stream: IndexedSeq[String], k: Int, parts: Int,
      rnd: scala.util.Random, serde: Boolean): Map[String, Long] = {
    val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), k)
    val cuts = (Seq(0, stream.size) ++ Seq.fill(parts - 1)(rnd.nextInt(stream.size + 1))).sorted
    val chunks = cuts.sliding(2).collect { case Seq(a, b) => stream.slice(a, b) }.toSeq
    val buffers = chunks.map(_.foldLeft(agg.createAggregationBuffer()) { (b, v) =>
      agg.update(b, InternalRow(UTF8String.fromString(v)))
    }).map(b => if (serde) agg.deserialize(agg.serialize(b)) else b)
    rnd.shuffle(buffers).reduce(agg.merge).toMap
  }

  test("property: guarantee holds for random streams, k, partitionings, merge orders") {
    val rnd = new scala.util.Random(1234)
    (1 to 300).foreach { i =>
      val alphabet = 1 + rnd.nextInt(30)
      val n = rnd.nextInt(2000)
      // Zipf-ish skew: value j drawn with weight ~ 1/(j+1)
      val stream = IndexedSeq.fill(n) {
        val j = (math.exp(rnd.nextDouble() * math.log(alphabet + 1.0)) - 1.0).toInt
        s"v${math.min(j, alphabet - 1)}"
      }
      val k = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(8)
      val truth = stream.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      val mg = run(stream, k, parts, rnd, serde = i % 2 == 0)
      assert(mg.size <= k, s"case $i: ${mg.size} counters > k=$k")
      mg.foreach { case (v, c) =>
        assert(c <= truth(v), s"case $i: $v over-counted (mg=$c true=${truth(v)})")
        assert((truth(v) - c) * (k + 1) <= n,
          s"case $i: $v under-counted past n/(k+1) (mg=$c true=${truth(v)} n=$n k=$k)")
      }
      truth.foreach { case (v, c) =>
        if (c * (k + 1) > n)
          assert(mg.contains(v), s"case $i: heavy $v (true=$c, n=$n, k=$k) evicted")
      }
      if (k >= alphabet) assert(mg == truth, s"case $i: k covers the domain but summary != exact")
    }
  }

  test("property: serde round-trip is the identity on partial buffers") {
    val rnd = new scala.util.Random(99)
    val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), 6)
    (1 to 100).foreach { i =>
      val b = (1 to rnd.nextInt(200)).foldLeft(agg.createAggregationBuffer()) { (b, _) =>
        agg.update(b, InternalRow(UTF8String.fromString(s"u${rnd.nextInt(10)}")))
      }
      assert(agg.deserialize(agg.serialize(b)) == b, s"case $i")
    }
  }

  test("nulls are skipped, empty input yields an empty summary") {
    val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), 4)
    val b = agg.update(agg.update(agg.createAggregationBuffer(),
      InternalRow(null)), InternalRow(UTF8String.fromString("x")))
    assert(b.toMap == Map("x" -> 1L))
    assert(agg.createAggregationBuffer().isEmpty)
  }
}
