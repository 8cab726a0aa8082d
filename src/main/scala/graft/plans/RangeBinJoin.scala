package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a band (range) join into a binned
  * equi-join automatically.
  *
  * A band join —
  * {{{
  *   a.join(b, a("k") === b("k") &&
  *     b("ts") >= a("ts") && b("ts") <= a("ts") + W)
  * }}}
  * — has no usable equi-condition on the range pair, so Spark plans it
  * as a sort-merge join on `k` whose per-key match loop is quadratic in
  * the key's row count (or, with no equi key at all, a broadcast
  * nested-loop / cartesian join: quadratic in the whole input). At
  * 100 TB either shape is the job that never finishes.
  *
  * The standard fix is manual: bucket both sides into width-`W` bins of
  * the range axis, explode the interval side into the (at most two)
  * bins its `[lo, hi]` window overlaps, and equi-join on the bin before
  * re-checking the exact range predicate. This rule performs that
  * rewrite IN THE OPTIMIZER, so the user writes the declarative
  * inequality join above and the engine picks the scalable plan — the
  * same service Databricks' range-join binning hint provides, except
  * the bin width is inferred from the band itself rather than asked of
  * the user.
  *
  * Shape matched: an inner join whose condition contains two conjuncts
  * {{{ x >= lo   and   x <= hi }}}
  * (strict variants accepted) where `x` is an integral- or
  * timestamp-typed expression from one side and `lo`/`hi` are
  * `core + c1` / `core + c2` over a shared same-axis `core` from the
  * other side with foldable offsets `c1 < c2` — integral literals on
  * an integral axis, `INTERVAL` additions (day-time, or micros-only
  * calendar — month/day components are calendar-dependent, not a
  * fixed width) on a timestamp axis, where bins are computed on exact
  * epoch microseconds. `b.ts BETWEEN a.ts AND a.ts + INTERVAL 10
  * MINUTES` — the natural event-time band-join phrasing — rewrites
  * without the user extracting epoch numbers first. The bin width is the band span `W = c2 − c1`:
  * then `floorDiv(hi, W) = floorDiv(lo, W) + 1` exactly, so the
  * interval side explodes into EXACTLY two bins and the point side
  * lands in one — each qualifying pair meets in precisely one bin (no
  * duplicate outputs, no dedup pass). The original predicates are kept
  * in the rewritten join, so strictness and boundary semantics are
  * preserved bit-for-bit; the bins only restrict the candidate space.
  *
  * Bins are computed with exact integer floor-division
  * (`(v − pmod(v, W)) div W` — correct for negatives, no double
  * rounding above 2^53 the way `floor(v / W)` on casts would be).
  *
  * The rule leaves the plan alone when: the band shape is absent, a
  * broadcast hint names either side (the user chose replication — a
  * broadcast nested-loop join over a small side is fine and the hint
  * must win), the types are non-integral, or a previous application
  * already planted its bin column (the rule runs inside the operator-
  * optimization fixpoint batch, so it must be idempotent).
  *
  * Disable with `spark.graft.rangeBinJoin.enabled=false`.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeBinJoin.enabled"
  private[plans] val BinCol = "__graft_range_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), hint)
          if j.resolved && !broadcastHinted(hint) && !alreadyBinned(j) =>
        findBand(j, cond).map(rewrite(j, cond, _)).getOrElse(j)
    }
  }

  private def broadcastHinted(h: JoinHint): Boolean =
    Seq(h.leftHint, h.rightHint).flatten.exists(_.strategy.contains(BROADCAST))

  private def alreadyBinned(j: Join): Boolean =
    j.children.exists(_.output.exists(_.name.startsWith(BinCol)))

  /** A matched band: point `x` on one side, interval `[core+c1, core+c2]`
    * on the other; `intervalOnLeft` says which join child the interval
    * (explode) side is. */
  private case class Band(x: Expression, core: Expression,
                          c1: Long, c2: Long, intervalOnLeft: Boolean)

  private def integral(t: DataType): Boolean =
    t == IntegerType || t == LongType

  /** Normalize an inequality conjunct to (small, large): small ≤ large
    * (strictness folded away — the exact predicate is re-applied after
    * the bin cut, so only the bounding direction matters here). */
  private def asLeq(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case LessThan(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case GreaterThan(a, b) => Some((b, a))
    case _ => None
  }

  /** Strip a trailing foldable offset: core + c / c + core / core − c
    * for integral axes, and `ts + INTERVAL …` (analyzer:
    * TimestampAddInterval with a day-time or micros-only calendar
    * interval — month/day components are calendar-dependent, not a
    * fixed width, so they don't qualify) for timestamp axes;
    * anything else → (e, 0). Offsets are in axis units (raw for
    * integrals, microseconds for timestamps). */
  private def strip(e: Expression): (Expression, Long) = e match {
    case Add(c, Literal(v, t), _) if integral(t) => (c, toL(v))
    case Add(Literal(v, t), c, _) if integral(t) => (c, toL(v))
    case Subtract(c, Literal(v, t), _) if integral(t) => (c, -toL(v))
    case TimestampAddInterval(c, Literal(v: Long, _: DayTimeIntervalType), _)
      => (c, v)
    case TimestampAddInterval(c,
        Literal(i: org.apache.spark.unsafe.types.CalendarInterval,
          CalendarIntervalType), _)
        if i.months == 0 && i.days == 0 => (c, i.microseconds)
    case other => (other, 0L)
  }

  private def toL(v: Any): Long = v match {
    case i: Int => i.toLong
    case l: Long => l
  }

  private def findBand(j: Join, cond: Expression): Option[Band] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val leqs = conjuncts.flatMap(asLeq)
    // pair a lower bound (lo, x) with an upper bound (x, hi) on the same x
    val pairs = for {
      (lo, x1) <- leqs
      (x2, hi) <- leqs
      if x1.semanticEquals(x2)
    } yield (x1, lo, hi)
    pairs.iterator.flatMap { case (x, lo, hi) =>
      val (coreLo, c1) = strip(lo)
      val (coreHi, c2) = strip(hi)
      if (!coreLo.semanticEquals(coreHi) || c2 <= c1) None
      else if (axisLong(x).isEmpty || axisLong(coreLo).isEmpty) None
      else if (!x.deterministic || !coreLo.deterministic) None
      else {
        val xRefs = x.references
        val cRefs = coreLo.references
        if (xRefs.isEmpty || cRefs.isEmpty) None
        else if (xRefs.subsetOf(j.right.outputSet) &&
                 cRefs.subsetOf(j.left.outputSet))
          Some(Band(x, coreLo, c1, c2, intervalOnLeft = true))
        else if (xRefs.subsetOf(j.left.outputSet) &&
                 cRefs.subsetOf(j.right.outputSet))
          Some(Band(x, coreLo, c1, c2, intervalOnLeft = false))
        else None
      }
    }.nextOption()
  }

  /** The band axis as a long: integrals widen, timestamps become
    * exact epoch microseconds (the unit interval offsets strip to);
    * any other type disqualifies the band. */
  private def axisLong(e: Expression): Option[Expression] = e.dataType match {
    case LongType => Some(e)
    case IntegerType => Some(Cast(e, LongType))
    case TimestampType => Some(UnixMicros(e))
    case _ => None
  }

  /** Exact floor(v / w) for longs: (v − pmod(v, w)) div w. pmod is
    * non-negative for positive w, so the subtraction lands on the
    * largest multiple of w ≤ v and the integral divide is exact —
    * correct for negative v, no 2^53 double-precision cliff. (Exact
    * for every v above Long.MinValue + w; the wrap at the very bottom
    * of the long range is unreachable for real bin axes.) */
  private def floorDiv(v: Expression, w: Long): Expression = {
    val wl = Literal(w, LongType)
    new IntegralDivide(new Subtract(v, new Pmod(v, wl)), wl)
  }

  private def rewrite(j: Join, cond: Expression, b: Band): LogicalPlan = {
    val w = b.c2 - b.c1
    val core = axisLong(b.core).get
    // interval [core+c1, core+c2] spans exactly bins floorDiv(lo) and
    // floorDiv(lo)+1 (= floorDiv(hi), since the span equals the width)
    val lo = new Add(core, Literal(b.c1, LongType))
    val hi = new Add(core, Literal(b.c2, LongType))
    val gen = Explode(CreateArray(Seq(floorDiv(lo, w), floorDiv(hi, w))))
    val binAttr = AttributeReference(BinCol, LongType, nullable = true)()
    val ptAlias = Alias(floorDiv(axisLong(b.x).get, w), BinCol + "_pt")()

    val (newLeft, newRight) =
      if (b.intervalOnLeft)
        (Generate(gen, Nil, outer = false, None, Seq(binAttr), j.left),
         Project(j.right.output :+ ptAlias, j.right))
      else
        (Project(j.left.output :+ ptAlias, j.left),
         Generate(gen, Nil, outer = false, None, Seq(binAttr), j.right))

    val newCond = And(EqualTo(binAttr, ptAlias.toAttribute), cond)
    // restore the original output (the bin columns are plumbing)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
  }
}
