package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
  * Join types: besides Inner, the rewrite covers LEFT OUTER, RIGHT
  * OUTER, LEFT SEMI and LEFT ANTI band joins — the "events with no
  * match within the window" family, which otherwise plans BNLJ. The
  * explode must land on the NON-PRESERVED side (duplicating a
  * preserved row would corrupt outer/semi/anti semantics), so the
  * rule picks per join type which side carries it: an interval
  * `[core+c1, core+c2]` spans exactly bins `floorDiv(lo)` and
  * `floorDiv(lo)+1`, and dually a point in bin `p` can only meet
  * intervals whose low bin is `p−1` or `p` — EITHER side can be the
  * exploded one, and each qualifying pair still meets in exactly one
  * bin pair. FULL OUTER has both sides preserved — nowhere to put
  * the explode — so it decomposes instead:
  * `A FULL B ≡ (A LEFT-OUTER B) ∪ (nulls ++ (B ANTI A))`, two legs
  * this rule then bins individually; each side scans twice (linear)
  * where the BNLJ it replaces was quadratic.
  *
  * The rule leaves the plan alone when: the band shape is absent, a
  * broadcast hint names either side (the user chose replication — a
  * broadcast nested-loop join over a small side is fine and the hint
  * must win), the types are non-integral, a previous application
  * already planted its bin column (the rule runs inside the operator-
  * optimization fixpoint batch, so it must be idempotent), or the
  * join is ALREADY manually binned — an equi conjunct that is a
  * floor-division of the band axis at the band width means the user
  * hand-built the rewrite, and re-binning would double the explode
  * on the interval side for nothing.
  *
  * Disable with `spark.graft.rangeBinJoin.enabled=false`.
  */
object RangeBinJoin extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledKey = "spark.graft.rangeBinJoin.enabled"
  private[plans] val BinCol = "__graft_range_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "true").toBoolean) return plan
    plan.transformUp {
      // FULL OUTER: both sides preserved, so NEITHER may carry the
      // explode — no direct rewrite exists. Decompose instead:
      //   A FULL B ≡ (A LEFT-OUTER B) ∪ (nulls ++ (B ANTI A))
      // — each leg is a band join this rule covers (explode lands on
      // the leg's non-preserved side on the next fixpoint pass), so
      // the full-outer family gets the shuffle-bounded plan too, at
      // the price of scanning each side twice (linear; the BNLJ this
      // replaces is quadratic). Guarded by the same band match as
      // the direct rewrite: a non-band full outer is left alone.
      case j @ Join(l, r, FullOuter, Some(cond), hint)
          if j.resolved && !broadcastHinted(hint) && !alreadyBinned(j)
            && findBand(j, cond).exists(!preBinned(j, cond, _)) =>
        val leftLeg = Join(l, r, LeftOuter, Some(cond), hint)
        val rightLeg = Project(
          l.output.map(a =>
            Alias(Literal(null, a.dataType), a.name)()) ++ r.output,
          Join(r, l, LeftAnti, Some(cond), JoinHint.NONE))
        Union(Seq(leftLeg, rightLeg))
      case j @ Join(_, _, jt, Some(cond), hint)
          if j.resolved && supportedType(jt) && !broadcastHinted(hint) &&
            !alreadyBinned(j) =>
        findBand(j, cond)
          .filterNot(b => preBinned(j, cond, b))
          .map(rewrite(j, cond, _)).getOrElse(j)
    }
  }

  private def supportedType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
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

  /** The join is ALREADY manually binned: some equi conjunct is a
    * floor-division of the band axis at the band width — the
    * hand-built version of this rule's own rewrite (`qJoinRange`'s
    * idiom: explode into `floor(v/W)`±1 bins, equi-join on the bin,
    * re-check the band). Firing again would stack a second ×2
    * explode on the interval side: same answers, doubled candidate
    * volume — the optimizer penalizing exactly the users who already
    * did the right thing. Detection is best-effort over both common
    * idioms (`floor(v / W)` via double division, `v div W`, and this
    * rule's own exact form), resolving condition attributes through
    * each side's projections and explode elements; a miss merely
    * costs the redundancy, never correctness. */
  private def preBinned(j: Join, cond: Expression, b: Band): Boolean = {
    val w = b.c2 - b.c1
    // the band's axes (point and interval core), alias-resolved into
    // each side so they compare equal to a bin expression's argument
    val axes = Seq(b.x, b.core).flatMap(ax =>
      Seq(ax, resolveThrough(j.left, ax), resolveThrough(j.right, ax)))
      .map(stripCasts)
    def isAxis(v: Expression): Boolean = {
      val s = stripCasts(v)
      axes.exists(_.semanticEquals(s))
    }
    splitConjunctivePredicates(cond).exists {
      case EqualTo(l, r) =>
        Seq(l, r).exists(side =>
          Seq(resolveThrough(j.left, side), resolveThrough(j.right, side))
            .flatMap(binArg(_, w)).exists(isAxis))
      case _ => false
    }
  }

  /** Best-effort resolution of `e`'s attributes to their defining
    * expressions inside `plan` — through Project aliases, Generate
    * explode elements, and pass-through unary nodes. Used only by
    * [[preBinned]], where an unresolved attribute just means the
    * guard doesn't fire. */
  private def resolveThrough(plan: LogicalPlan, e: Expression): Expression = {
    def defOf(p: LogicalPlan, a: Attribute, depth: Int): Expression =
      if (depth <= 0) a
      else p match {
        case pr: Project =>
          pr.projectList.collectFirst {
            case al: Alias if al.exprId == a.exprId =>
              resolveThrough(pr.child, al.child)
          }.getOrElse(defOf(pr.child, a, depth - 1))
        case g: Generate if g.generatorOutput.exists(_.exprId == a.exprId) =>
          g.generator match {
            case Explode(CreateArray(els, _)) if els.nonEmpty =>
              resolveThrough(g.child, els.head)
            case _ => a
          }
        case u: UnaryNode => defOf(u.child, a, depth - 1)
        case _ => a
      }
    e.transformUp { case a: Attribute => defOf(plan, a, 12) }
  }

  private def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case _ => e
  }

  /** If `e` is semantically `floor(axis / w)` — in any common idiom,
    * with an optional trailing ± integer bin shift (the explode's
    * neighbor bin) and outer casts — the raw axis argument. */
  private def binArg(e0: Expression, w: Long): Option[Expression] = {
    def isW(l: Literal): Boolean = l match {
      case Literal(d: Double, DoubleType) => d == w.toDouble
      case Literal(v, t) if integral(t) => toL(v) == w
      case _ => false
    }
    // strip casts and ± integer bin shifts, remembering whether an
    // integral cast was crossed (a bare double division only counts
    // as binning when something truncates it back to an integer)
    def peel(e: Expression, sawIntCast: Boolean): (Expression, Boolean) =
      e match {
        case Cast(c, t, _, _) => peel(c, sawIntCast || integral(t))
        case Add(c, Literal(_, t), _) if integral(t) => peel(c, sawIntCast)
        case Add(Literal(_, t), c, _) if integral(t) => peel(c, sawIntCast)
        case Subtract(c, Literal(_, t), _) if integral(t) =>
          peel(c, sawIntCast)
        case other => (other, sawIntCast)
      }
    // `v − pmod(v, w)` is the largest multiple of w ≤ v — dividing
    // it by w bins v itself (this rule's own exact form)
    def deMultiple(e: Expression): Expression = stripCasts(e) match {
      case Subtract(v, Pmod(v2, l: Literal, _), _)
          if isW(l) && stripCasts(v).semanticEquals(stripCasts(v2)) =>
        stripCasts(v)
      case other => other
    }
    val (core, sawIntCast) = peel(e0, sawIntCast = false)
    core match {
      case IntegralDivide(v, l: Literal, _) if isW(l) =>
        Some(deMultiple(v))
      case Floor(Divide(v, l: Literal, _)) if isW(l) =>
        Some(deMultiple(v))
      case Divide(v, l: Literal, _) if isW(l) && sawIntCast =>
        Some(deMultiple(v))
      case _ => None
    }
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
    val x = axisLong(b.x).get
    // which child carries the explode: for inner either side works
    // (keep the interval side — the canonical two-bin formulation);
    // for outer/semi/anti it MUST be the non-preserved side, because
    // duplicating a preserved row corrupts the join's semantics
    val explodeLeft = j.joinType match {
      case RightOuter => true
      case LeftOuter | LeftSemi | LeftAnti => false
      case _ => b.intervalOnLeft
    }
    val explodeInterval = explodeLeft == b.intervalOnLeft
    // interval [core+c1, core+c2] spans exactly bins floorDiv(lo) and
    // floorDiv(lo)+1 (= floorDiv(hi), since the span equals the
    // width); dually, a point in bin p meets only intervals whose low
    // bin is p−1 or p. Explode whichever side must carry it; each
    // qualifying pair still meets in exactly one bin pair.
    val lo = new Add(core, Literal(b.c1, LongType))
    val hi = new Add(core, Literal(b.c2, LongType))
    val (genBins, singleBin) =
      if (explodeInterval)
        (Seq(floorDiv(lo, w), floorDiv(hi, w)), floorDiv(x, w))
      else
        (Seq(new Subtract(floorDiv(x, w), Literal(1L, LongType)),
          floorDiv(x, w)), floorDiv(lo, w))
    val gen = Explode(CreateArray(genBins))
    val binAttr = AttributeReference(BinCol, LongType, nullable = true)()
    val single = Alias(singleBin, BinCol + "_pt")()

    val (newLeft, newRight) =
      if (explodeLeft)
        (Generate(gen, Nil, outer = false, None, Seq(binAttr), j.left),
         Project(j.right.output :+ single, j.right))
      else
        (Project(j.left.output :+ single, j.left),
         Generate(gen, Nil, outer = false, None, Seq(binAttr), j.right))

    val newCond = And(EqualTo(binAttr, single.toAttribute), cond)
    // restore the original output (the bin columns are plumbing)
    Project(j.output,
      Join(newLeft, newRight, j.joinType, Some(newCond), j.hint))
  }
}
