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
