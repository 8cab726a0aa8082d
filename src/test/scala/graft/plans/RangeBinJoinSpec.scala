package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins for the [[RangeBinJoin]] optimizer rule: the rewrite fires on
  * the band shape (bin equi-key in the optimized join, no quadratic
  * physical fallback), preserves semantics bit-for-bit against the
  * rule-disabled plan, honors broadcast hints and non-band shapes, and
  * computes exact bins across negative values. The differential gate
  * (`q_join_range_auto` vs the DuckDB oracle) separately proves the
  * rewrite on real data at sf0.01. */
class RangeBinJoinSpec extends SparkSpec {

  import spark.implicits._

  private def points = Seq(
    // (id, k, v) — k an equi key, v the band axis incl. negatives
    (1L, 1, -25L), (2L, 1, -10L), (3L, 1, 0L), (4L, 1, 3L), (5L, 1, 9L),
    (6L, 1, 10L), (7L, 1, 21L), (8L, 2, 0L), (9L, 2, 5L), (10L, 2, 40L),
    (11L, 3, -3L), (12L, 3, 7L)
  ).toDF("id", "k", "v")

  private def binned(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.exists(
        _.references.exists(_.name.startsWith("__graft_range_bin"))) => j
    }.nonEmpty

  private def withRuleDisabled[T](body: => T): T = {
    spark.conf.set(RangeBinJoin.EnabledKey, "false")
    try body finally spark.conf.set(RangeBinJoin.EnabledKey, "true")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq.toVector: Seq[Any]).toSet

  private def bandJoin(): DataFrame = {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    a.join(b, col("k") === col("k_b") && col("id") =!= col("id_b") &&
      col("v_b") >= col("v") && col("v_b") <= col("v") + 10L)
      .select(col("id"), col("id_b"))
  }

  test("band join is rewritten to a binned equi-join and matches the naive plan") {
    val df = bandJoin()
    assert(binned(df), "expected the bin equi-key in the optimized join")
    val naive = withRuleDisabled { rows(bandJoin()) }
    assert(rows(df) === naive)
    assert(naive.contains(Seq(3L, 4L)) && naive.contains(Seq(3L, 6L)) &&
      !naive.contains(Seq(3L, 7L)), "fixture sanity: boundary in, past-band out")
  }

  test("pure range join (no equi key) avoids the quadratic physical fallback") {
    val a = points.select(col("id"), col("v"))
    val b = points.select(col("id").as("id_b"), col("v").as("v_b"))
    val df = a.join(b, col("v_b") >= col("v") && col("v_b") <= col("v") + 10L)
      .select(col("id"), col("id_b"))
    assert(binned(df))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop") &&
      !phys.contains("CartesianProduct"),
      s"expected an equi join on the bin, got:\n$phys")
    assert(rows(df) === withRuleDisabled { rows(df) })
  }

  test("interval on the right side binds the same (orientation flip)") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    // point (a.v) vs interval [b.v_b - 4, b.v_b + 6]
    def q = a.join(b, col("k") === col("k_b") &&
        col("v") >= col("v_b") - 4L && col("v") <= col("v_b") + 6L)
      .select(col("id"), col("id_b"))
    assert(binned(q))
    assert(rows(q) === withRuleDisabled { rows(q) })
  }

  test("strict bounds keep their strictness through the rewrite") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("v").as("v_b"))
    def q = a.join(b, col("v_b") > col("v") && col("v_b") <= col("v") + 9L)
      .select(col("id"), col("id_b"))
    assert(binned(q))
    val got = rows(q)
    assert(got === withRuleDisabled { rows(q) })
    // v=0 (id 3): v_b in (0, 9] — 3 (id 4) and 9 (id 5) yes, 0 (id 8) no
    assert(got.contains(Seq(3L, 5L)) && !got.contains(Seq(3L, 8L)))
  }

  test("non-band shapes and hinted joins are left alone") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    // plain equi join: no range pair
    assert(!binned(a.join(b, col("k") === col("k_b"))))
    // one-sided inequality: no band
    assert(!binned(a.join(b, col("v_b") >= col("v"))))
    // non-constant width: b.v in [a.v, a.v + a.id] — span not foldable
    assert(!binned(a.join(b,
      col("v_b") >= col("v") && col("v_b") <= col("v") + col("id"))))
    // broadcast hint wins: the user chose replication
    val hinted = a.join(broadcast(b), col("k") === col("k_b") &&
      col("v_b") >= col("v") && col("v_b") <= col("v") + 10L)
    assert(!binned(hinted))
    assert(rows(hinted.select(col("id"), col("id_b"))) ===
      withRuleDisabled { rows(hinted.select(col("id"), col("id_b"))) })
  }

  test("exactly two bins per interval row: no duplicate pair output") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("v").as("v_b"))
    val df = a.join(b, col("v_b") >= col("v") && col("v_b") <= col("v") + 10L)
      .groupBy(col("id"), col("id_b")).agg(count(lit(1)).as("n"))
    assert(df.where(col("n") > 1).isEmpty,
      "a (interval, point) pair met in more than one bin")
  }

  test("timestamp band join (INTERVAL bounds) binds on exact epoch micros") {
    val ts = Seq(1L, 2L, 3L, 4L, 5L, 6L).zip(Seq(
        "2024-01-01 00:00:00", "2024-01-01 00:04:00",
        "2024-01-01 00:09:59", "2024-01-01 00:10:00",
        "2024-01-01 00:10:01", "2024-01-01 01:00:00"))
      .toDF("id", "s")
      .select(col("id"), col("s").cast("timestamp").as("ts"))
    val b = ts.select(col("id").as("id_b"), col("ts").as("ts_b"))
    def q = ts.join(b,
        col("id") =!= col("id_b") &&
          col("ts_b") >= col("ts") &&
          col("ts_b") <= col("ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("id"), col("id_b"))
    assert(binned(q), "timestamp band must bind through the interval form")
    val got = rows(q)
    assert(got === withRuleDisabled { rows(q) })
    // inclusive 10-minute boundary in, one second past out
    assert(got.contains(Seq(1L, 4L)) && !got.contains(Seq(1L, 5L)))
  }

  test("q_join_range_auto fires the rule and matches the manual binned query") {
    val auto = graft.ops.Relational.qJoinRangeAuto(spark, sf)
    assert(binned(auto), "the gated query must plan through the rewrite")
    val manual = graft.ops.Relational.qJoinRange(spark, sf)
    assert(rows(auto) === rows(manual))
  }

  test("manually-binned joins are NOT re-binned: qJoinRange keeps " +
    "exactly one Generate while qJoinRangeAuto keeps rewriting") {
    val manual = graft.ops.Relational.qJoinRange(spark, sf)
    val gens = manual.queryExecution.optimizedPlan.collect {
      case g: Generate => g }
    assert(gens.size == 1,
      s"expected the user's single bin explode, got ${gens.size} — " +
        "the rule re-binned a hand-binned join")
    val auto = graft.ops.Relational.qJoinRangeAuto(spark, sf)
    val autoGens = auto.queryExecution.optimizedPlan.collect {
      case g: Generate => g }
    assert(autoGens.size == 1 && binned(auto),
      "the declarative query must still rewrite (guard overreach)")
    assert(rows(manual) === rows(auto))
  }

  test("the in-JVM pre-binned idiom (long div) is recognized too") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("v").as("v_b"))
    // hand-binned with integer division: explode a.v's bins, equi on
    // bin, residual band — the rule must leave it alone
    val e1 = a.select(col("id"), col("v"),
      explode(array((col("v") - pmod(col("v"), lit(10L))) / lit(10L)
          cast "long",
        ((col("v") - pmod(col("v"), lit(10L))) / lit(10L) cast "long")
          + 1L)).as("bin"))
    val e2 = b.select(col("id_b"), col("v_b"),
      ((col("v_b") - pmod(col("v_b"), lit(10L))) / lit(10L) cast "long")
        .as("bin"))
    val q = e1.join(e2, e1("bin") === e2("bin") &&
        col("v_b") >= col("v") && col("v_b") <= col("v") + 10L)
      .select(col("id"), col("id_b"))
    val gens = q.queryExecution.optimizedPlan.collect {
      case g: Generate => g }
    assert(gens.size == 1,
      s"hand-binned (div idiom) join re-binned: ${gens.size} Generates")
  }

  test("left-outer band join rewrites (explode on the non-preserved " +
    "side), keeps unmatched rows, avoids BNLJ") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    // each a-row with its strict followers within 10; id 7 (v=21,k=1),
    // id 10 (v=40,k=2), id 12 (v=7,k=3) have none → preserved as null
    def q = a.join(b, col("k") === col("k_b") &&
        col("v_b") > col("v") && col("v_b") <= col("v") + 10L,
      "left_outer").select(col("id"), col("id_b"))
    assert(binned(q), "left-outer band must rewrite")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop") &&
      !phys.contains("CartesianProduct"),
      s"expected an equi join on the bin, got:\n$phys")
    val got = rows(q)
    assert(got === withRuleDisabled { rows(q) })
    assert(got.contains(Seq(7L, null)) && got.contains(Seq(10L, null)) &&
      got.contains(Seq(12L, null)), "unmatched interval rows must survive")
    assert(!got.exists { r => r.head == 3L && r(1) == null },
      "a matched row must not also appear null-extended")
  }

  test("right-outer band join rewrites with the explode on the left") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    def q = a.join(b, col("k") === col("k_b") &&
        col("v_b") > col("v") && col("v_b") <= col("v") + 10L,
      "right_outer").select(col("id"), col("id_b"))
    assert(binned(q))
    assert(rows(q) === withRuleDisabled { rows(q) })
  }

  test("left-semi and left-anti band joins rewrite without " +
    "duplicating or losing preserved rows") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    def semi = a.join(b, col("k") === col("k_b") &&
        col("v_b") > col("v") && col("v_b") <= col("v") + 10L,
      "left_semi").select(col("id"))
    def anti = a.join(b, col("k") === col("k_b") &&
        col("v_b") > col("v") && col("v_b") <= col("v") + 10L,
      "left_anti").select(col("id"))
    assert(binned(semi) && binned(anti))
    // semi: a row appears AT MOST once even when it matches b rows
    // through both of its candidate bins
    val semiIds = semi.collect().map(_.getLong(0)).toSeq
    assert(semiIds.size == semiIds.distinct.size,
      "semi duplicated a preserved row")
    assert(rows(semi) === withRuleDisabled { rows(semi) })
    assert(rows(anti) === withRuleDisabled { rows(anti) })
    // anti ∪ semi = all of a, disjoint
    assert(rows(semi) ++ rows(anti) === rows(a.select(col("id"))))
    assert(rows(semi).intersect(rows(anti)).isEmpty)
  }

  test("full-outer band join decomposes into binned left-outer + " +
    "null-padded anti legs — no quadratic physical join, rows " +
    "bit-identical to the naive full outer") {
    val a = points.where(col("id") <= 8L)
    val b = points.where(col("id") >= 5L)
      .select(col("id").as("id_b"), col("k").as("k_b"),
        col("v").as("v_b"))
    def q = a.join(b, col("k") === col("k_b") &&
        col("v_b") >= col("v") && col("v_b") <= col("v") + 10L,
      "full_outer").select(col("id"), col("id_b"))
    assert(binned(q),
      "expected the decomposition's legs to carry the bin equi-key")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop") &&
      !phys.contains("CartesianProduct"),
      s"full-outer band join still plans a quadratic join:\n$phys")
    assert(phys.contains("Union"),
      s"expected the left-outer ∪ anti decomposition:\n$phys")
    val got = rows(q)
    assert(got === withRuleDisabled { rows(q) },
      "decomposition changed the full-outer answer")
    // non-vacuous: unmatched rows survive from BOTH sides
    assert(got.exists(r => r.head != null && r(1) == null),
      "fixture vacuous: no left-unmatched row")
    assert(got.exists(r => r.head == null && r(1) != null),
      "fixture vacuous: no right-unmatched row")
  }

  test("non-band full-outer joins are left alone") {
    val a = points
    val b = points.select(col("id").as("id_b"), col("k").as("k_b"),
      col("v").as("v_b"))
    def q = a.join(b, col("k") === col("k_b") && col("v") < col("v_b"),
      "full_outer").select(col("id"), col("id_b"))
    assert(!binned(q), "no band shape — nothing to decompose")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("Union"),
      s"non-band full outer must not decompose:\n$phys")
    assert(rows(q) === withRuleDisabled { rows(q) })
  }

  test("q_join_range_left: the gated left-outer band query rewrites, " +
    "avoids BNLJ, keeps follower-less events, equals the naive plan") {
    def q = graft.ops.Relational.qJoinRangeLeft(spark, sf)
    assert(binned(q), "gated left-outer band query must rewrite")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoop") &&
      !phys.contains("CartesianProduct"),
      s"expected an equi join on the bin, got:\n$phys")
    val got = q.collect()
    assert(got.nonEmpty)
    val unmatched = got.count(_.getAs[Long]("n_follow") == 0L)
    assert(unmatched > 0,
      "fixture vacuous: every event has a follower — the outer leg " +
        "is untested")
    assert(rows(q) === withRuleDisabled { rows(q) })
  }

  test("rewritten plan carries the generate + both original range predicates") {
    val df = bandJoin()
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty, "expected the bin explode in the optimized plan")
    val joinConds = df.queryExecution.optimizedPlan.collect {
      case j: Join => j.condition.map(_.toString).getOrElse("")
    }.mkString("\n")
    assert(joinConds.contains(">=") && joinConds.contains("<="),
      "the exact band predicates must survive as join residuals")
  }
}
