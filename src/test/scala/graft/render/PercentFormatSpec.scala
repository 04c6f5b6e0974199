package graft.render

import org.scalatest.funsuite.AnyFunSuite

class PercentFormatSpec extends AnyFunSuite {
  import PercentFormat._

  test("README worked example: 28000/14000 -> 66.7% / 33.3%") {
    val (tp, fp) = booleanPercents(BigInt(28000), BigInt(14000))
    assert(tp == "66.7%")
    assert(fp == "33.3%")
  }

  test("0/0 denominator renders 0.0%") {
    assert(formatPercentOneDecimal(0, 0) == "0.0%")
    assert(booleanPercents(0, 0) == (("0.0%", "0.0%")))
  }

  test("half-up rounding at the 0.05% boundary") {
    // 1/2000 = 0.05% -> permille (1*1000 + 1000)/2000 = 1 -> 0.1%
    assert(formatPercentOneDecimal(1, 2000) == "0.1%")
    // 1/2001 < 0.05% -> 0.0%
    assert(formatPercentOneDecimal(1, 2001) == "0.0%")
  }

  test("exact thirds") {
    assert(formatPercentOneDecimal(1, 3) == "33.3%")
    assert(formatPercentOneDecimal(2, 3) == "66.7%")
  }

  test("100% and 0%") {
    assert(formatPercentOneDecimal(5, 5) == "100.0%")
    assert(formatPercentOneDecimal(0, 5) == "0.0%")
  }

  test("property: rendered percents sum to ~100% (99.9–100.1)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val t = rnd.nextLong(1000000L)
      val f = rnd.nextLong(1000000L)
      if (t + f > 0) {
        val (tp, fp) = booleanPercents(BigInt(t), BigInt(f))
        val sum = tp.stripSuffix("%").toDouble + fp.stripSuffix("%").toDouble
        assert(sum >= 99.89 && sum <= 100.11, s"t=$t f=$f -> $tp + $fp")
      }
    }
  }

  test("property: matches BigDecimal HALF_UP reference formula") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val d = 1L + rnd.nextLong(100000L)
      val n = rnd.nextLong(d + 1)
      val expected = new java.math.BigDecimal(n)
        .multiply(new java.math.BigDecimal(100))
        .divide(new java.math.BigDecimal(d), 1, java.math.RoundingMode.HALF_UP)
        .toPlainString + "%"
      assert(formatPercentOneDecimal(BigInt(n), BigInt(d)) == expected, s"n=$n d=$d")
    }
  }
}
