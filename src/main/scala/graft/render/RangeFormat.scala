package graft.render

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Range-label formatting: numeric `"min-max"`, temporal `"Jan 2020-Oct 2025"`,
  * time-of-day `"08:00-17:30"`.
  *
  * Port of the reference's formatters (`/root/reference/src/listTables.tsx:140-182`,
  * `:414-418`): month names are 3-letter English, all temporal math is UTC
  * (the reference uses `getUTCMonth`/`getUTCFullYear`/`getUTCHours`).
  * Unlike the reference — which round-trips every value through Postgres
  * `::text` and re-parses with `Date` — we keep values typed end-to-end and
  * format directly.
  */
object RangeFormat {

  private val months =
    Array("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  /** `"Jan 2020"` from a (year, month 1-12) pair — `fmtMonthYear`, UTC. */
  def fmtMonthYear(year: Int, month: Int): String = s"${months(month - 1)} $year"

  /** `"08:05"` — `fmtHHMM`, zero-padded, UTC. */
  def fmtHHMM(hour: Int, minute: Int): String = f"$hour%02d:$minute%02d"

  /** Render one numeric endpoint. Integral values print without decoration;
    * floating values print shortest-round-trip with trailing zeros stripped
    * (`-999.99`, `0.02`, `150000`), mirroring Postgres `::text` of numerics. */
  def numericValueString(v: Any): String = v match {
    case d: java.lang.Double  => trimFloating(d.doubleValue())
    case f: java.lang.Float   => trimFloating(f.floatValue().toString.toDouble)
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case bd: BigDecimal       => bd.underlying.stripTrailingZeros.toPlainString
    case n                    => String.valueOf(n)
  }

  private def trimFloating(d: Double): String =
    if (d.isNaN || d.isInfinite) d.toString
    else {
      val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
      bd.stripTrailingZeros.toPlainString
    }

  /** `"1-1500"` — numeric range label (listTables.tsx:414-415). */
  def numericRange(min: Any, max: Any): String =
    s"${numericValueString(min)}-${numericValueString(max)}"

  /** Extract (UTC year, month) from any temporal value Spark hands back on
    * collect: `java.sql.Timestamp` (TimestampType), `java.time.LocalDateTime`
    * (TimestampNTZType), `java.sql.Date`/`LocalDate` (DateType),
    * `Instant`, or a `Long` of nanos-since-epoch (parquet TIMESTAMP(NANOS)
    * read under `nanosAsLong`). */
  def yearMonth(v: Any): Option[(Int, Int)] = v match {
    case ts: java.sql.Timestamp =>
      val ldt = LocalDateTime.ofInstant(Instant.ofEpochMilli(ts.getTime), ZoneOffset.UTC)
      Some((ldt.getYear, ldt.getMonthValue))
    case ldt: LocalDateTime => Some((ldt.getYear, ldt.getMonthValue))
    case d: java.sql.Date =>
      val ld = d.toLocalDate
      Some((ld.getYear, ld.getMonthValue))
    case ld: LocalDate => Some((ld.getYear, ld.getMonthValue))
    case i: Instant =>
      val ldt = LocalDateTime.ofInstant(i, ZoneOffset.UTC)
      Some((ldt.getYear, ldt.getMonthValue))
    case nanos: java.lang.Long =>
      val i = Instant.ofEpochSecond(
        Math.floorDiv(nanos.longValue(), 1000000000L),
        Math.floorMod(nanos.longValue(), 1000000000L))
      val ldt = LocalDateTime.ofInstant(i, ZoneOffset.UTC)
      Some((ldt.getYear, ldt.getMonthValue))
    case _ => None
  }

  /** `"Jan 2020-Oct 2025"` — month-year range (formatTemporalRange, date path). */
  def temporalRange(min: Any, max: Any): Option[String] =
    for {
      (y1, m1) <- yearMonth(min)
      (y2, m2) <- yearMonth(max)
    } yield s"${fmtMonthYear(y1, m1)}-${fmtMonthYear(y2, m2)}"

  /** `"08:00-17:30"` — time-of-day range (formatTemporalRange, time path).
    * Spark has no time-of-day column type (FIXTURES.md gotcha); endpoints are
    * seconds-of-day, kept for reference parity and unit-tested. */
  def timeOfDayRange(minSecondOfDay: Long, maxSecondOfDay: Long): String = {
    def hm(s: Long) = fmtHHMM(((s / 3600) % 24).toInt, ((s % 3600) / 60).toInt)
    s"${hm(minSecondOfDay)}-${hm(maxSecondOfDay)}"
  }

  /** Second-of-day from the timestamp a JDBC TIME column surfaces as (the
    * value sits on 1970-01-01 in the reader's wall clock — `toLocalDateTime`
    * recovers exactly the wall time the database sent, the typed analog of
    * the reference parsing the `::text` time string). */
  def secondOfDay(v: Any): Option[Long] = v match {
    case ts: java.sql.Timestamp => Some(ts.toLocalDateTime.toLocalTime.toSecondOfDay.toLong)
    case ldt: LocalDateTime => Some(ldt.toLocalTime.toSecondOfDay.toLong)
    case _ => None
  }

  /** `"08:00-17:30"` from two time-carrying timestamps — the end-to-end form
    * of [[timeOfDayRange]] used by the renderer for TIME columns scanned
    * over JDBC (formatTemporalRange's `isTimeOnly` path, listTables.tsx:169-175). */
  def timeRange(min: Any, max: Any): Option[String] =
    for {
      s1 <- secondOfDay(min)
      s2 <- secondOfDay(max)
    } yield timeOfDayRange(s1, s2)
}
