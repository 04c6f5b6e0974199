package graft.render

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

class RangeFormatSpec extends AnyFunSuite {
  import RangeFormat._

  test("month-year range like the README demo: Jan 2020-Oct 2025") {
    val mn = LocalDateTime.of(2020, 1, 15, 10, 30)
    val mx = LocalDateTime.of(2025, 10, 2, 0, 0)
    assert(temporalRange(mn, mx).contains("Jan 2020-Oct 2025"))
  }

  test("java.sql.Timestamp endpoints format in UTC") {
    // 2020-01-31T23:59:59Z
    val ts1 = new java.sql.Timestamp(1580514000000L - 1000L)
    val ts2 = new java.sql.Timestamp(1760000000000L) // 2025-10-09T...Z
    assert(temporalRange(ts1, ts2).contains("Jan 2020-Oct 2025"))
  }

  test("java.sql.Date and LocalDate endpoints") {
    assert(temporalRange(LocalDate.of(2021, 3, 1), LocalDate.of(2022, 12, 31))
      .contains("Mar 2021-Dec 2022"))
  }

  test("nanos-since-epoch long endpoints") {
    val jan2020 = 1577836800L * 1000000000L + 123456789L
    val oct2025 = 1759276800L * 1000000000L
    assert(temporalRange(java.lang.Long.valueOf(jan2020), java.lang.Long.valueOf(oct2025))
      .contains("Jan 2020-Oct 2025"))
  }

  test("unparseable endpoints yield None (rendered as empty range)") {
    assert(temporalRange("garbage", "junk").isEmpty)
  }

  test("numeric ranges: integral, double trimming, negatives") {
    assert(numericRange(java.lang.Long.valueOf(1L), java.lang.Long.valueOf(1500L)) == "1-1500")
    assert(numericRange(java.lang.Double.valueOf(-999.99), java.lang.Double.valueOf(9999.0)) == "-999.99-9999")
    assert(numericRange(java.lang.Double.valueOf(0.02), java.lang.Double.valueOf(0.1)) == "0.02-0.1")
    assert(numericValueString(java.lang.Integer.valueOf(42)) == "42")
    assert(numericValueString(new java.math.BigDecimal("10.500")) == "10.5")
  }

  test("time-of-day range zero-pads HH:MM") {
    assert(timeOfDayRange(8 * 3600, 17 * 3600 + 30 * 60) == "08:00-17:30")
    assert(timeOfDayRange(0, 23 * 3600 + 59 * 60 + 59) == "00:00-23:59")
  }
}
