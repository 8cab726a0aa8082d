package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated property tests over tiny frames (SURVEY.md
  * §5.2-3): algebraic laws the engine must preserve at any scale.
  * Sampling is driven manually (fixed seeds, 5 cases per law) — the
  * scalatest↔scalacheck bridge isn't on the offline classpath, and
  * Spark jobs are slow enough that few-but-deterministic beats many.
  */
class RelationalPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Int, Long)]] = Gen.listOfN(30,
    Gen.zip(Gen.choose(0, 5), Gen.choose(0L, 20L)))

  test("dropDuplicates is idempotent") {
    for (data <- samples(rowsGen)) {
      import spark.implicits._
      val once = data.toDF("k", "v").dropDuplicates()
      assert(once.count() == once.dropDuplicates().count())
    }
  }

  test("explode row count == sum of array sizes") {
    for (arrs <- samples(Gen.listOfN(10, Gen.listOf(Gen.choose(0, 9))))) {
      import spark.implicits._
      val exploded = arrs.toDF("arr").select(explode(col("arr"))).count()
      assert(exploded == arrs.map(_.size).sum)
    }
  }

  test("unionAll count is additive; except removes all matches") {
    for ((a, b) <- samples(Gen.zip(rowsGen, rowsGen))) {
      import spark.implicits._
      val da = a.toDF("k", "v")
      val db = b.toDF("k", "v")
      assert(da.union(db).count() == a.size + b.size)
      val ex = da.distinct().except(db).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(ex == (a.toSet -- b.toSet))
    }
  }

  test("inner join cardinality == sum over keys of |A_k|*|B_k|") {
    for ((a, b) <- samples(Gen.zip(rowsGen, rowsGen))) {
      import spark.implicits._
      val joined = a.toDF("k", "va").join(b.toDF("k", "vb"), "k").count()
      val expected = a.groupBy(_._1).map { case (k, as) =>
        as.size.toLong * b.count(_._1 == k) }.sum
      assert(joined == expected)
    }
  }

  test("left join preserves left cardinality when right is unique-keyed") {
    for (a <- samples(rowsGen)) {
      import spark.implicits._
      val dim = (0 to 5).map(k => (k, s"name$k")).toDF("k", "name")
      assert(a.toDF("k", "v").join(dim, Seq("k"), "left").count() == a.size)
    }
  }

  test("HLL sketch re-aggregation: union of daily sketches == single-pass " +
    "sketch, and tracks the exact count within HLL error") {
    val t = graft.io.Tables.load(spark, sf, "events")
    val reagg = Relational.qSketchReagg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val single = t.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reagg.keySet == exact.keySet)
    reagg.foreach { case (k, est) =>
      // re-aggregability: daily-union estimate == one-shot estimate,
      // EXACTLY (same sketch state, just merged in a different order)
      assert(est == single(k), s"$k: union=$est single=${single(k)}")
      // default lgConfigK=12 -> relative error ~1.6%; allow 5%
      assert(math.abs(est - exact(k)).toDouble / exact(k) <= 0.05,
        s"$k: est=$est exact=${exact(k)}")
    }
  }

  test("approx_top_k: exact at capacity >= distinct, combine == global " +
    "build, and the eviction path keeps the heavy hitter with a " +
    "bounded overestimate") {
    val t = graft.io.Tables.load(spark, sf, "events")
    // capacity 8192 >= every SF's distinct users -> sketch is exact:
    // the gated query's counts must EQUAL the exact group-by counts
    val est = Relational.qApproxTopk(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = t.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty && est.size <= 10)
    est.foreach { case (u, n) =>
      assert(exact(u) == n, s"user $u: sketch $n != exact ${exact(u)}")
    }
    // every reported hitter is at least as frequent as the best
    // non-reported one (top-k SET is right when counts are exact,
    // modulo ties at the boundary)
    val floor = est.values.min
    val boundary = exact.filterNot { case (u, _) => est.contains(u) }
      .values.maxOption.getOrElse(0L)
    assert(boundary <= floor,
      s"missed a hitter: unreported count $boundary > reported $floor")
    // re-aggregability: combining per-day sketches reports the same
    // hitters as one single-pass global sketch (no boundary tie at
    // this SF, so the sets are comparable)
    val global = t.agg(expr("approx_top_k(user_id, 10, 8192)").as("tk"))
      .select(expr("inline(tk)")).toDF("uid", "n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(global == est, s"daily-combine $est != single-pass $global")

    // eviction path: tiny capacity, planted 40% heavy hitter among
    // many distinct keys — the hitter must survive eviction and its
    // estimate may only OVERCOUNT, by at most the sketch error bound
    import spark.implicits._
    val n = 3000
    val skewed = ((1 to n / 2).map(_ => 777L) ++
      (1 to n / 2).map(i => (i % 1000).toLong)).toDF("uid")
    val hit = skewed
      .agg(expr("approx_top_k_accumulate(uid, 16)").as("sk"))
      .select(expr("inline(approx_top_k_estimate(sk, 1))"))
      .toDF("uid", "est").collect().head
    assert(hit.getLong(0) == 777L, s"heavy hitter evicted: $hit")
    val estHit = hit.getLong(1)
    // DataSketches ItemsSketch: estimate in [true, true + n/maxMapSize
    // * c]; be generous on the constant, strict on the direction
    assert(estHit >= n / 2, s"frequent-items must never undercount")
    assert(estHit <= n / 2 + n / 4, s"overestimate out of bound: $estHit")
  }

  test("data checks: clean on the shipped tables; every planted " +
    "violation class is counted exactly once") {
    val clean = Relational.qDataChecks(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.size == 6 && clean.values.forall(_ == 0L),
      s"shipped testdata fails its own quality gate: $clean")

    // planted twin: minimal tables carrying exactly one violation per
    // check, written where Tables.load finds them
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-checks").toString
    def put(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    put("customer", Seq(Tuple1(1L)).toDF("c_custkey"))
    put("orders", Seq((10L, 1L), (11L, 999L)) // 999 -> orphan custkey
      .toDF("o_orderkey", "o_custkey"))
    put("lineitem", Seq(10L, 10L, 99L) // 99 -> orphan orderkey
      .toDF("l_orderkey"))
    put("documents", Seq(
      (1L, "fine text", 9L),
      (2L, "", 0L),            // empty text (n_chars consistent)
      (3L, "mismatch", 999L),  // n_chars wrong
      (7L, "dup a", 5L), (7L, "dup b", 5L)) // duplicate key
      .toDF("doc_id", "text", "n_chars"))
    put("events", Seq((1L, "click"), (2L, "oops")) // unknown type
      .toDF("ts", "event_type"))
    val planted = Relational.qDataChecks(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(planted == Map(
      "fk_lineitem_orders" -> 1L, "fk_orders_customer" -> 1L,
      "doc_text_nonempty" -> 1L, "doc_nchars_consistent" -> 1L,
      "event_type_domain" -> 1L, "doc_id_unique" -> 1L),
      s"planted violations miscounted: $planted")
  }

  test("dist drift: early deciles are uniform by construction, a " +
    "planted shift concentrates PSI in its target bucket, and " +
    "identical populations score ~zero") {
    import spark.implicits._
    // early: 1..100 evenly; late: all mass at 95.5 → bucket 9
    val shifted =
      (1 to 100).map(i => (i.toDouble, i.toLong, true)) ++
        (1 to 100).map(i => (95.5, 200L + i, false))
    val out = Relational.distDriftFrom(
      shifted.toDF("value", "event_id", "early"))
      .orderBy("bucket").collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("n_early") == 10L),
      "deciles of the defining population must be exactly uniform")
    val b9 = out.find(_.getAs[Int]("bucket") == 9).get
    assert(b9.getAs[Long]("n_late") == 100L,
      "planted mass must land entirely in the top bucket")
    assert(b9.getAs[Double]("psi_term") > 0.2,
      "a hard shift must clear the classic PSI retrain threshold alone")
    // no drift: the same population on both sides → every term ≈ 0
    val same =
      (1 to 100).map(i => (i.toDouble, i.toLong, true)) ++
        (1 to 100).map(i => (i.toDouble, 200L + i, false))
    val flat = Relational.distDriftFrom(
      same.toDF("value", "event_id", "early")).collect()
    assert(flat.forall(r => math.abs(r.getAs[Double]("psi_term")) < 1e-9),
      "identical populations must score zero drift in every bucket")
  }

  test("winsorize: discrete rank bounds land on exact data points and " +
    "degenerate groups clip nothing") {
    import spark.implicits._
    val ev =
      // type a: 1.0..100.0 → p01 = rank ⌈100/100⌉ = 1.0, p99 = rank
      // ⌈99·101/100⌉ = 99.0; only 100.0 clips high
      (1 to 100).map(i => ("a", i.toDouble, i.toLong)) ++
        // type b: 3 values → bounds collapse to min/max, no clipping
        Seq(("b", 10.0, 201L), ("b", 20.0, 202L), ("b", 30.0, 203L)) ++
        // type c: all-equal values → both bounds 5.0, nothing clips
        (1 to 10).map(i => ("c", 5.0, 300L + i))
    val out = Relational.winsorizeStats(
      ev.toDF("event_type", "value", "event_id")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Double]("p01") == 1.0)
    assert(out("a").getAs[Double]("p99") == 99.0)
    assert(out("a").getAs[Long]("n_clip_lo") == 0L)
    assert(out("a").getAs[Long]("n_clip_hi") == 1L)
    assert(out("a").getAs[Double]("winsor_sum") == 5049.0) // Σ1..99 + 99
    assert(out("b").getAs[Double]("p01") == 10.0)
    assert(out("b").getAs[Double]("p99") == 30.0)
    assert(out("b").getAs[Long]("n_clip_lo") == 0L)
    assert(out("b").getAs[Long]("n_clip_hi") == 0L)
    assert(out("c").getAs[Double]("p01") == 5.0)
    assert(out("c").getAs[Double]("p99") == 5.0)
    assert(out("c").getAs[Double]("winsor_sum") == 50.0)
  }
}
