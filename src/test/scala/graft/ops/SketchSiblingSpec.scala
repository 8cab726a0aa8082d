package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-vs-anchor agreement floors for the two gated scale paths
  * (`q_winsorize_sketch`, `q_dist_drift_sketch`), cited by the
  * [[Relational]] docstrings. The siblings are approximate by design
  * (GK `approx_percentile` bounds → rows-only driver check), so THIS
  * spec is their quantitative gate: the sketch output must track the
  * hash-gated exact anchor within the stated floors at every SF,
  * driven through the same gated entry points the driver runs.
  *
  * Floors (from the Relational docstrings):
  *  - winsorize: per-type clip counts within 1% of that type's n and
  *    winsorized sum within 1% of the anchor's;
  *  - drift: per-bucket `psi_term` within ±0.02 and bucket
  *    populations within 2% of their population totals.
  *
  * The planted fixtures target the two failure modes a rows-only gate
  * cannot see: a swapped `element_at` index in
  * [[Relational.winsorizeSketchBounds]] (p01/p99 exchanged → clip
  * counts explode) and an off-by-one in
  * [[Relational.distDriftSketchEdges]]' k-mapping (edges shifted one
  * decile → bucket populations off by ~10% of the total).
  */
class SketchSiblingSpec extends SparkSpec {

  import spark.implicits._

  private val sfDirs = Seq(
    "/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  // ---------- winsorize sibling: real data, all SFs ----------

  for (dir <- sfDirs) {
    val sfName = dir.split('/').last
    test(s"winsorize sketch: per-type clip counts within 1% of n and " +
      s"winsor_sum within 1% of the exact anchor at $sfName") {
      val anchor = Relational.qWinsorize(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r).toMap
      val sketch = Relational.qWinsorizeSketch(spark, dir).collect()
        .map(r => r.getAs[String]("event_type") -> r).toMap
      assert(sketch.keySet == anchor.keySet,
        "sketch and anchor must cover the same event types")
      for ((tpe, a) <- anchor) {
        val s = sketch(tpe)
        val n = a.getAs[Long]("n")
        assert(s.getAs[Long]("n") == n,
          s"$tpe: n is exact on both paths (same input rows)")
        // a swapped element_at index makes p01 > p99 and the clip
        // counts jump to ~n — the 1% floor is far below that
        assert(s.getAs[Double]("p01") <= s.getAs[Double]("p99"),
          s"$tpe: sketch bounds must be ordered")
        val tol = math.max(1L, n / 100)
        val dLo = math.abs(
          s.getAs[Long]("n_clip_lo") - a.getAs[Long]("n_clip_lo"))
        val dHi = math.abs(
          s.getAs[Long]("n_clip_hi") - a.getAs[Long]("n_clip_hi"))
        assert(dLo <= tol, s"$tpe: low-clip count off by $dLo > $tol")
        assert(dHi <= tol, s"$tpe: high-clip count off by $dHi > $tol")
        val aSum = a.getAs[Double]("winsor_sum")
        val sSum = s.getAs[Double]("winsor_sum")
        assert(math.abs(sSum - aSum) <= 0.01 * math.abs(aSum),
          s"$tpe: winsor_sum $sSum vs anchor $aSum exceeds 1%")
      }
    }

    test(s"dist drift sketch: per-bucket psi_term within ±0.02 and " +
      s"bucket populations within 2% of totals at $sfName") {
      val anchor = Relational.qDistDrift(spark, dir).collect()
        .map(r => r.getAs[Int]("bucket") -> r).toMap
      val sketch = Relational.qDistDriftSketch(spark, dir).collect()
        .map(r => r.getAs[Int]("bucket") -> r).toMap
      assert(sketch.keySet == anchor.keySet,
        "sketch and anchor must produce the same bucket ids")
      val te = anchor.values.map(_.getAs[Long]("n_early")).sum
      val tl = anchor.values.map(_.getAs[Long]("n_late")).sum
      assert(sketch.values.map(_.getAs[Long]("n_early")).sum == te &&
        sketch.values.map(_.getAs[Long]("n_late")).sum == tl,
        "bucketing is a partition of the same rows — totals are exact")
      for ((b, a) <- anchor) {
        val s = sketch(b)
        val dE = math.abs(a.getAs[Long]("n_early") - s.getAs[Long]("n_early"))
        val dL = math.abs(a.getAs[Long]("n_late") - s.getAs[Long]("n_late"))
        assert(dE <= 0.02 * te,
          s"bucket $b: early population off by $dE > 2% of $te")
        assert(dL <= 0.02 * tl,
          s"bucket $b: late population off by $dL > 2% of $tl")
        val dPsi = math.abs(a.getAs[Double]("psi_term") -
          s.getAs[Double]("psi_term"))
        assert(dPsi <= 0.02, s"bucket $b: psi_term off by $dPsi > 0.02")
      }
    }
  }

  // ---------- planted fixtures through the factored cores ----------

  private def plantedEvents(values: Seq[Double], tpe: String = "a") =
    values.zipWithIndex
      .map { case (v, i) => (tpe, v, i.toLong) }
      .toDF("event_type", "value", "event_id")

  test("winsorize sketch bounds on planted uniform 1..1000 land on " +
    "the exact-rank deciles (±1 value) and are ordered") {
    val ev = plantedEvents((1 to 1000).map(_.toDouble))
    val b = Relational.winsorizeSketchBounds(ev).collect()
    assert(b.length == 1)
    val (p01, p99) = (b.head.getAs[Double]("p01"), b.head.getAs[Double]("p99"))
    // exact anchor ranks: (1000+99) DIV 100 = 10, (99*1001) DIV 100 = 990;
    // accuracy 1e4 > n makes the GK summary exact up to rank convention
    assert(math.abs(p01 - 10.0) <= 1.0, s"p01 $p01 not at the 1% rank")
    assert(math.abs(p99 - 990.0) <= 1.0, s"p99 $p99 not at the 99% rank")
    assert(p01 < p99, "a swapped element_at index would invert the band")
  }

  test("winsorize sketch pipeline on planted data clips within 1% of " +
    "the exact pipeline (identical winsorizeFrom downstream)") {
    val ev = plantedEvents((1 to 1000).map(_.toDouble))
    val exact = Relational
      .winsorizeFrom(ev, Relational.winsorizeExactBounds(ev)).collect().head
    val sk = Relational
      .winsorizeFrom(ev, Relational.winsorizeSketchBounds(ev)).collect().head
    assert(exact.getAs[Long]("n_clip_lo") == 9L &&
      exact.getAs[Long]("n_clip_hi") == 10L,
      "anchor self-check: values below 10 / above 990 on 1..1000")
    assert(math.abs(
      sk.getAs[Long]("n_clip_lo") - exact.getAs[Long]("n_clip_lo")) <= 10)
    assert(math.abs(
      sk.getAs[Long]("n_clip_hi") - exact.getAs[Long]("n_clip_hi")) <= 10)
    val eSum = exact.getAs[Double]("winsor_sum")
    val sSum = sk.getAs[Double]("winsor_sum")
    assert(math.abs(sSum - eSum) <= 0.01 * eSum)
  }

  private def plantedDrift(early: Seq[Double], late: Seq[Double]) =
    (early.map((_, true)) ++ late.map((_, false))).zipWithIndex
      .map { case ((v, e), i) => (v, i.toLong, e) }
      .toDF("value", "event_id", "early")

  test("drift sketch edges on planted uniform early 1..1000 are the " +
    "nine deciles in k order (a k-mapping off-by-one shifts them ~100)") {
    val ev = plantedDrift((1 to 1000).map(_.toDouble),
      (501 to 1500).map(_.toDouble))
    val edges = Relational.distDriftSketchEdges(ev)
      .orderBy("k").collect()
    assert(edges.map(_.getAs[Long]("k")).toSeq == (1L to 9L),
      "edge keys must be k = 1..9")
    val exact = Relational.distDriftExactEdges(ev)
      .orderBy("k").collect().map(_.getAs[Double]("edge"))
    edges.map(_.getAs[Double]("edge")).zip(exact).zipWithIndex.foreach {
      case ((s, e), i) =>
        assert(math.abs(s - e) <= 1.0,
          s"decile ${i + 1}: sketch edge $s vs exact $e — a shifted " +
            "index would be ~100 off")
    }
  }

  test("drift sketch pipeline detects a planted 50% shift like the " +
    "anchor does, and a no-shift population stays flat on both paths") {
    val early = (1 to 1000).map(_.toDouble)
    val shifted = plantedDrift(early, (501 to 1500).map(_.toDouble))
    val ex = Relational.psiFrom(shifted,
      Relational.distDriftExactEdges(shifted)).collect()
      .map(r => r.getAs[Int]("bucket") -> r).toMap
    val sk = Relational.psiFrom(shifted,
      Relational.distDriftSketchEdges(shifted)).collect()
      .map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(sk.keySet == ex.keySet && ex.size == 10)
    // early buckets are deciles of the population that defined the
    // edges — exactly 100 each on the anchor, within 2% on the sketch
    ex.values.foreach(r => assert(r.getAs[Long]("n_early") == 100L))
    sk.values.foreach(r =>
      assert(math.abs(r.getAs[Long]("n_early") - 100L) <= 20L))
    for ((b, a) <- ex)
      assert(math.abs(a.getAs[Double]("psi_term") -
        sk(b).getAs[Double]("psi_term")) <= 0.02, s"bucket $b")
    // the classic scorecard trigger: a half-range shift is PSI > 0.2
    // on BOTH paths — the sketch must not wash out a real drift
    assert(ex.values.map(_.getAs[Double]("psi_term")).sum > 0.2)
    assert(sk.values.map(_.getAs[Double]("psi_term")).sum > 0.2)

    val flat = plantedDrift(early, early)
    val flatSk = Relational.psiFrom(flat,
      Relational.distDriftSketchEdges(flat)).collect()
    flatSk.foreach(r =>
      assert(math.abs(r.getAs[Double]("psi_term")) <= 0.001,
        s"bucket ${r.getAs[Int]("bucket")}: identical populations " +
          "must show no drift"))
  }
}
