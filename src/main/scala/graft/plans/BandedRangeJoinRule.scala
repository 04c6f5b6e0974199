package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite a naive bounded range join into a banded
  * equi-join — the tier-c Catalyst extension of the ladder (custom
  * `Rule[LogicalPlan]` via `SparkSessionExtensions` /
  * `spark.experimental.extraOptimizations`).
  *
  * Spark plans an inner join whose only usable condition is a range
  * predicate as a broadcast-nested-loop or cartesian join — O(|A|·|B|) and
  * a driver OOM at scale. But the very common "point in a FIXED-WIDTH
  * trailing interval" shape
  *
  * {{{ b.t <= a.t  AND  b.t > a.t - w           (w literal)
  *     b.t >= a.t - w1 AND b.t <= a.t + w2      (two-sided window) }}}
  *
  * admits the classic banding rewrite that `EventOps
  * .purchaseClickAttribution` applies by hand (SURVEY §2.9 "Interval/range
  * join"): bucket time into width-w bands, replicate the b side into its
  * two candidate bands, and join on band equality plus the original
  * predicate. This rule performs that rewrite AUTOMATICALLY, so a user can
  * write the naive join and still get the linear plan:
  *
  *  - a side: `Project` adding `__graft_band_a = a.t div w`
  *  - b side: `Generate(Explode(array(b.t div w, b.t div w + 1)))`
  *  - join condition: original conjuncts AND band_a = band_b — the new
  *    equality makes `ExtractEquiJoinKeys` pick a hash/sort-merge join
  *  - top: `Project` back to the original output (band columns hidden)
  *
  * Correctness: `div` jump points are ≥ w apart, so any interval of width
  * ≤ w crosses at most one — for every matching pair, `a.t div w` equals
  * one (and only one) of b's two replicas, and the original range
  * conjuncts stay in the condition as the exact filter. Matching pairs
  * survive exactly once; non-matching pairs are cut by the kept original
  * predicate. NULL times produce NULL bands and drop from the match set,
  * as in the naive join. Applies to INNER joins (either orientation) and
  * LEFT/RIGHT OUTER joins (only when the replicated side is the
  * NON-preserved side — replicating the preserved side would duplicate
  * its unmatched rows), on LongType attributes with a positive literal
  * width.
  *
  * GUARD: if the join condition already carries an equality between
  * opposite-side attributes, `ExtractEquiJoinKeys` will already plan a
  * hash/sort-merge join — the banding rewrite would only replicate one
  * side 2-3× for no planning benefit, so the rule skips such joins. Set
  * `spark.graft.bandedRangeJoin.force=true` to band anyway: worth it when
  * an equi key is heavily skewed (a hot key's within-key pairing is
  * quadratic; the band key divides it by the number of bands the hot
  * key's rows span).
  *
  * Reference behavior this accelerates: the same attribution/as-of family
  * the composed operators cover; DuckDB gets the equivalent via its IEJoin
  * (the oracle for `events_range_join`).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BandPrefix = "__graft_band"
  val ForceConf = "spark.graft.bandedRangeJoin.force"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, jt, Some(_), _) if supportedJoinType(jt) && eligible(j) =>
      rewrite(j).getOrElse(j)
  }

  private def supportedJoinType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter => true
    case _ => false
  }

  /** Fixed-point guard (never re-band a join we already rewrote) + the
    * equi-key guard documented above. */
  private def eligible(j: Join): Boolean =
    !(j.left.output ++ j.right.output).exists(_.name.startsWith(BandPrefix)) &&
      (conf.getConfString(ForceConf, "false").toBoolean || !hasEquiKey(j))

  /** True iff `ExtractEquiJoinKeys` would already find a hash-join key. */
  private def hasEquiKey(j: Join): Boolean =
    splitConjunctivePredicates(j.condition.get).exists {
      case EqualTo(l: Attribute, r: Attribute) =>
        (j.left.outputSet.contains(l) && j.right.outputSet.contains(r)) ||
          (j.right.outputSet.contains(l) && j.left.outputSet.contains(r))
      case _ => false
    }

  /** `attr - w` / `attr + w` with an integral literal, as left by the
    * analyzer (int literals are type-promoted before reaching us). */
  private object AttrMinusLit {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case Subtract(a: Attribute, Literal(w: Long, LongType), _) => Some((a, w))
      case Subtract(a: Attribute, Literal(w: Int, IntegerType), _) => Some((a, w.toLong))
      case _ => None
    }
  }
  private object AttrPlusLit {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case Add(b: Attribute, Literal(w: Long, LongType), _) => Some((b, w))
      case Add(b: Attribute, Literal(w: Int, IntegerType), _) => Some((b, w.toLong))
      case Add(Literal(w: Long, LongType), b: Attribute, _) => Some((b, w))
      case Add(Literal(w: Int, IntegerType), b: Attribute, _) => Some((b, w.toLong))
      case _ => None
    }
  }

  /** b.t bounded above by a.t + w (w = 0 for the plain `b <= a` forms). */
  private def upperTriple(e: Expression): Option[(Attribute, Attribute, Long)] = e match {
    case LessThan(b: Attribute, a: Attribute) => Some((b, a, 0L))
    case LessThanOrEqual(b: Attribute, a: Attribute) => Some((b, a, 0L))
    case GreaterThan(a: Attribute, b: Attribute) => Some((b, a, 0L))
    case GreaterThanOrEqual(a: Attribute, b: Attribute) => Some((b, a, 0L))
    case LessThan(b: Attribute, AttrPlusLit(a, w)) => Some((b, a, w))
    case LessThanOrEqual(b: Attribute, AttrPlusLit(a, w)) => Some((b, a, w))
    case GreaterThan(AttrPlusLit(a, w), b: Attribute) => Some((b, a, w))
    case GreaterThanOrEqual(AttrPlusLit(a, w), b: Attribute) => Some((b, a, w))
    case LessThan(AttrMinusLit(b, w), a: Attribute) => Some((b, a, w))
    case LessThanOrEqual(AttrMinusLit(b, w), a: Attribute) => Some((b, a, w))
    case GreaterThan(a: Attribute, AttrMinusLit(b, w)) => Some((b, a, w))
    case GreaterThanOrEqual(a: Attribute, AttrMinusLit(b, w)) => Some((b, a, w))
    case _ => None
  }

  /** b.t bounded below by a.t - w (any of the eight spellings). */
  private def lowerTriple(e: Expression): Option[(Attribute, Attribute, Long)] = e match {
    case GreaterThan(b: Attribute, AttrMinusLit(a, w)) => Some((b, a, w))
    case GreaterThanOrEqual(b: Attribute, AttrMinusLit(a, w)) => Some((b, a, w))
    case LessThan(AttrMinusLit(a, w), b: Attribute) => Some((b, a, w))
    case LessThanOrEqual(AttrMinusLit(a, w), b: Attribute) => Some((b, a, w))
    case LessThan(a: Attribute, AttrPlusLit(b, w)) => Some((b, a, w))
    case LessThanOrEqual(a: Attribute, AttrPlusLit(b, w)) => Some((b, a, w))
    case GreaterThan(AttrPlusLit(b, w), a: Attribute) => Some((b, a, w))
    case GreaterThanOrEqual(AttrPlusLit(b, w), a: Attribute) => Some((b, a, w))
    case _ => None
  }

  /** Normalize `abs(b − a) ≤ w` (the nearest-neighbour spelling) into its
    * two one-sided conjuncts so the triple matchers see it; the ORIGINAL
    * abs predicate stays in the rewritten join's condition as the exact
    * filter, so this expansion is matching-only. */
  private def expandAbs(e: Expression): Seq[Expression] = {
    def lits(l: Expression): Option[Expression] = l match {
      case lit @ Literal(_, LongType | IntegerType) => Some(lit)
      case _ => None
    }
    def split(x: Attribute, y: Attribute, w: Expression): Seq[Expression] =
      Seq(LessThanOrEqual(x, Add(y, w)), GreaterThanOrEqual(x, Subtract(y, w)))
    e match {
      case LessThanOrEqual(Abs(Subtract(x: Attribute, y: Attribute, _), _), l) if lits(l).isDefined =>
        split(x, y, l)
      case LessThan(Abs(Subtract(x: Attribute, y: Attribute, _), _), l) if lits(l).isDefined =>
        split(x, y, l)
      case GreaterThanOrEqual(l, Abs(Subtract(x: Attribute, y: Attribute, _), _)) if lits(l).isDefined =>
        split(x, y, l)
      case GreaterThan(l, Abs(Subtract(x: Attribute, y: Attribute, _), _)) if lits(l).isDefined =>
        split(x, y, l)
      case other => Seq(other)
    }
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get).flatMap(expandAbs)
    val uppers = conjuncts.flatMap(upperTriple)
    val lowers = conjuncts.flatMap(lowerTriple)
    val matched = for {
      (ub, ua, wHigh) <- uppers
      (lb, la, wLow) <- lowers
      if ub.exprId == lb.exprId && ua.exprId == la.exprId
      if wLow >= 0 && wHigh >= 0 && wLow + wHigh > 0
      if ua.dataType == LongType && ub.dataType == LongType
      aOnLeft = j.left.outputSet.contains(ua) && j.right.outputSet.contains(ub)
      aOnRight = j.right.outputSet.contains(ua) && j.left.outputSet.contains(ub)
      // the exploded (replicated) side is always b's side; an outer join's
      // preserved side must never be replicated
      if (j.joinType match {
        case Inner => aOnLeft || aOnRight
        case LeftOuter => aOnLeft // b on the right = non-preserved side
        case RightOuter => aOnRight
        case _ => false
      })
    } yield (ua, ub, wLow, wHigh, aOnLeft)
    matched.headOption.map { case (tA, tB, wLow, wHigh, aOnLeft) =>
      // band width = total interval width; b replicates to the band offsets
      // its interval can reach relative to its own band (interval width ≤ W
      // ⇒ at most one div-boundary crossed in each covered direction)
      val w = Literal(wLow + wHigh, LongType)
      val offsets: Seq[Long] =
        if (wHigh == 0) Seq(0L, 1L)      // b ∈ [a-W, a]: k_a ∈ {k_b, k_b+1}
        else if (wLow == 0) Seq(-1L, 0L) // b ∈ [a, a+W]: k_a ∈ {k_b-1, k_b}
        else Seq(-1L, 0L, 1L)            // two-sided window
      val bandA = Alias(IntegralDivide(tA, w), s"${BandPrefix}_a")()
      val kB = IntegralDivide(tB, w)
      val arr = CreateArray(offsets.map(o =>
        if (o == 0L) kB else Add(kB, Literal(o)): Expression))
      val genOut = AttributeReference(s"${BandPrefix}_b", LongType, nullable = true)()
      val gen = (child: LogicalPlan) =>
        Generate(Explode(arr), Nil, outer = false, None, Seq(genOut), child)
      val proj = (child: LogicalPlan) =>
        Project(child.output :+ bandA, child)
      val (newLeft, newRight) =
        if (aOnLeft) (proj(j.left), gen(j.right)) else (gen(j.left), proj(j.right))
      val newCond = And(j.condition.get, EqualTo(bandA.toAttribute, genOut))
      Project(j.output, Join(newLeft, newRight, j.joinType, Some(newCond), j.hint))
    }
  }
}
