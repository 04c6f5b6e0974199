package graft.render

/** Exact-integer percentage formatting with half-up rounding to 0.1%.
  *
  * Reproduces the reference's bigint permille math
  * (`/root/reference/src/listTables.tsx:51-79`): percentages are computed in
  * pure integer arithmetic — `permille = (n*1000 + d/2) / d` — so no float
  * error can creep in, and `0/0` renders as `"0.0%"`.
  */
object PercentFormat {

  /** `formatPercentOneDecimal` (listTables.tsx:51-57): half-up to 0.1%. */
  def formatPercentOneDecimal(n: BigInt, d: BigInt): String =
    if (d == 0) "0.0%"
    else {
      val permille = (n * 1000 + d / 2) / d
      s"${permille / 10}.${permille % 10}%"
    }

  /** `booleanPercents` (listTables.tsx:59-79): denominator is `t + f` —
    * NULLs were already excluded by the tri-state counting predicates
    * (listTables.tsx:314-315), so they count toward neither bucket nor the
    * denominator.
    */
  def booleanPercents(trueCount: BigInt, falseCount: BigInt): (String, String) = {
    val d = trueCount + falseCount
    (formatPercentOneDecimal(trueCount, d), formatPercentOneDecimal(falseCount, d))
  }
}
