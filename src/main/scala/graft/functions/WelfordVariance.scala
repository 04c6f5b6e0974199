package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` surface (SURVEY §2.8) — the third custom-aggregation
  * API next to built-ins and `TypedImperativeAggregate` ([[MinHashAgg]]):
  * single-pass mean/variance via Welford's update with Chan's parallel
  * merge, the numerically-stable form that two-pass `sum(x²)` variance is
  * not (catastrophic cancellation when mean² ≈ mean-of-squares).
  *
  * The buffer is 24 bytes and the merge is O(1), so partial aggregation
  * and AQE coalescing work exactly as for built-in aggregates; used as
  * `ds.select(WelfordVariance.toColumn)` on a `Dataset[Double]`.
  */
case class WelfordState(n: Long, mean: Double, m2: Double)
case class WelfordResult(n: Long, mean: Double, var_samp: Double)

object WelfordVariance extends Aggregator[Double, WelfordState, WelfordResult] {
  type State = WelfordState
  type Result = WelfordResult
  private def State(n: Long, mean: Double, m2: Double) = WelfordState(n, mean, m2)
  private def Result(n: Long, mean: Double, v: Double) = WelfordResult(n, mean, v)

  def zero: State = State(0L, 0.0, 0.0)

  def reduce(s: State, x: Double): State = {
    val n = s.n + 1
    val delta = x - s.mean
    val mean = s.mean + delta / n
    State(n, mean, s.m2 + delta * (x - mean))
  }

  /** Chan et al. pairwise combination — what makes this distributable. */
  def merge(a: State, b: State): State =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val delta = b.mean - a.mean
      val mean = a.mean + delta * b.n / n
      val m2 = a.m2 + b.m2 + delta * delta * a.n * b.n / n
      State(n, mean, m2)
    }

  def finish(s: State): Result =
    Result(s.n, s.mean, if (s.n < 2) Double.NaN else s.m2 / (s.n - 1))

  def bufferEncoder: Encoder[State] = Encoders.product[State]
  def outputEncoder: Encoder[Result] = Encoders.product[Result]
}
