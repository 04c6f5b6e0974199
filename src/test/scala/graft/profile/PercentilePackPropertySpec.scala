package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Randomized property batteries for the weighted-percentile operator and
  * the FFD packer — hundreds of cases against brute-force definitions.
  * Weighted percentiles go through the real DataFrame path (a handful of
  * Spark jobs); the packer is session-free.
  */
class PercentilePackPropertySpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def bruteLowerWeighted(data: Seq[(Double, Double)], q4: Int): Double = {
    // smallest value whose inclusive cumulative weight reaches ceil(q4/4 * W),
    // in the operator's own integer units
    val grp = data.groupBy(p => math.floor(p._1 * 100 + 0.5).toLong)
      .view.mapValues(_.map(p => math.floor(p._2 * 100 + 0.5).toLong).sum)
      .toSeq.sortBy(_._1)
    val w = grp.map(_._2).sum
    var cum = 0L
    for ((cents, c) <- grp) {
      cum += c
      if (cum * 4 >= w * q4) return cents.toDouble / 100
    }
    grp.last._1.toDouble / 100
  }

  test("weighted percentiles match brute force on random weighted multisets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(60)
      val data = Seq.fill(n)(
        (math.floor(rnd.nextDouble() * 10000) / 100,
          1.0 + math.floor(rnd.nextDouble() * 500) / 100))
      val row = ProfileQueries
        .weightedPercentilesOf(data.toDF("v", "w"), "v", "w")
        .collect().head
      assert(row.getAs[Double]("wp25") == bruteLowerWeighted(data, 1), s"trial $trial p25")
      assert(row.getAs[Double]("wp50") == bruteLowerWeighted(data, 2), s"trial $trial p50")
      assert(row.getAs[Double]("wp75") == bruteLowerWeighted(data, 3), s"trial $trial p75")
    }
  }

  test("packFFD bounds hold on random file sets") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 200) {
      val target = 50L + rnd.nextInt(1000)
      val files = Seq.tabulate(1 + rnd.nextInt(40))(i =>
        s"f$i" -> (1L + rnd.nextInt(2 * target.toInt)))
      val bins = CompactionPlan.packFFD(files, target)
      // conservation
      assert(bins.map(_.bytes).sum == files.map(_._2).sum, s"trial $trial bytes")
      assert(bins.map(_.files).sum == files.size.toLong, s"trial $trial files")
      // no packed bin overflows; big files ride alone
      bins.foreach { b =>
        if (b.alreadyCompact) assert(b.files == 1L && b.bytes >= target)
        else assert(b.bytes <= target, s"trial $trial overflow $b")
      }
      // bin count lower bound: can't beat ceil(smallBytes/target) + bigCount
      val (bigB, smallB) = files.map(_._2).partition(_ >= target)
      val lower = bigB.size + ((smallB.sum + target - 1) / target)
      assert(bins.size >= lower, s"trial $trial impossible packing")
      // any-fit guarantee: at most one packed bin can be <= half full,
      // so (packed - 1) * target / 2 < smallBytes
      val packed = bins.count(!_.alreadyCompact)
      assert(packed <= 2 * smallB.sum / target + 1,
        s"trial $trial too many bins: $packed for ${smallB.sum}/$target")
    }
  }
}
