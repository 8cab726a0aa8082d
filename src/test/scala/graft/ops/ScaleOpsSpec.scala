package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics of the scale-technique queries beyond what the DuckDB
  * oracle pins: upsert row classes and hash-sampling determinism. */
class ScaleOpsSpec extends SparkSpec {

  test("upsert merge: untouched, updated and inserted classes all present; " +
    "exactly one row per key; latest wins") {
    val rows = ScaleOps.qUpsertMerge(spark, sf)
      .select("o_orderkey", "o_totalprice", "src").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, grp) =>
      assert(grp.length == 1, s"key $k merged to ${grp.length} rows")
    }
    rows.foreach { case (k, _, src) =>
      // incoming (key % 2 == 0) must win over base; keys in neither
      // branch (key % 3 == 0 && odd) must be absent
      if (k % 2 == 0) assert(src == "update", s"key $k kept base over update")
      else {
        assert(k % 3 != 0, s"key $k should not exist in the merge")
        assert(src == "base")
      }
    }
    val srcs = rows.map(_._3).toSet
    assert(srcs == Set("base", "update"))
    // updated rows carry the re-priced value, not the base price
    val orig = graft.io.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .where(col("o_orderkey") % 2 === 0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // every update row (sf0.001 is small) — a sorted-head sample would
    // always check the same smallest keys
    rows.filter(_._3 == "update").foreach { case (k, p, _) =>
      val expected = math.floor(orig(k) * 1.1 * 100 + 0.5) / 100
      assert(p == expected, s"key $k: $p != re-priced $expected")
    }
  }

  test("scd2History: insert, update, delete and unchanged keys each get " +
    "the right version rows") {
    import spark.implicits._
    // key 1 unchanged, key 2 updated, key 3 deleted (tombstone at t2),
    // key 4 inserted at t2
    val snaps = Seq(
      ("2024-01-01", 1L, Some("a"), 1),
      ("2024-02-01", 1L, Some("a"), 1),
      ("2024-01-01", 2L, Some("x"), 1),
      ("2024-02-01", 2L, Some("y"), 1),
      ("2024-01-01", 3L, Some("z"), 1),
      ("2024-02-01", 3L, None, 0),
      ("2024-02-01", 4L, Some("n"), 1),
    ).toDF("sd", "k", "attr", "alive")
      .select(to_date(col("sd")).as("snapshot_date"), col("k"),
        col("attr"), col("alive"))
    val got = ScaleOps.scd2History(snaps, "k", Seq("attr"))
      .orderBy("k", "effective_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      (1L, "a", "2024-01-01", None, true), // unchanged: one open row
      (2L, "x", "2024-01-01", Some("2024-02-01"), false), // closed
      (2L, "y", "2024-02-01", None, true), // reopened with new attr
      (3L, "z", "2024-01-01", Some("2024-02-01"), false), // deleted
      (4L, "n", "2024-02-01", None, true), // inserted
    ), s"unexpected history: ${got.mkString("\n")}")
  }

  test("q_scd2_dims covers all four change classes on the real dim") {
    val rows = ScaleOps.qScd2Dims(spark, sf).collect()
    val byKey = rows.groupBy(_.getLong(0))
    // updated keys (in both snaps, % 3 == 0 → re-priced) have 2 versions
    val updated = byKey.filter { case (k, _) =>
      k % 7 != 0 && k % 5 != 0 && k % 3 == 0 }
    assert(updated.nonEmpty, "no updated keys in testdata")
    updated.foreach { case (k, vs) =>
      assert(vs.length == 2, s"updated key $k has ${vs.length} versions")
      assert(vs.count(_.getBoolean(6)) == 1,
        s"updated key $k should have exactly one current version")
    }
    // unchanged keys: one open current version
    val unchanged = byKey.filter { case (k, _) =>
      k % 7 != 0 && k % 5 != 0 && k % 3 != 0 }
    assert(unchanged.nonEmpty)
    unchanged.foreach { case (k, vs) =>
      assert(vs.length == 1 && vs.head.getBoolean(6), s"key $k not 1 open row")
    }
    // deleted keys (snap1 only): one closed, nothing current
    val deleted = byKey.filter { case (k, _) => k % 7 != 0 && k % 5 == 0 }
    assert(deleted.nonEmpty)
    deleted.foreach { case (k, vs) =>
      assert(vs.length == 1 && !vs.head.getBoolean(6),
        s"deleted key $k should have one closed version")
      assert(vs.head.getDate(5) != null, s"deleted key $k version not closed")
    }
    // inserted keys (snap2 only): one open version starting at d2
    val inserted = byKey.filter { case (k, _) => k % 7 == 0 && k % 5 != 0 }
    assert(inserted.nonEmpty)
    inserted.foreach { case (k, vs) =>
      assert(vs.length == 1 && vs.head.getBoolean(6) &&
        vs.head.getDate(4).toString == "2024-02-01",
        s"inserted key $k wrong: ${vs.toSeq}")
    }
  }

  test("hash sampling is deterministic and lands near the 2/16 rate") {
    val a = ScaleOps.qSampleHash(spark, sf).collect().map(_.toSeq).toSeq
    val b = ScaleOps.qSampleHash(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "two runs of the hash sample differ")
    val sampled = a.map(_(1).asInstanceOf[Long]).sum.toDouble
    val total = graft.io.Tables.load(spark, sf, "lineitem").count().toDouble
    val rate = sampled / total
    assert(rate > 0.08 && rate < 0.17, s"sample rate $rate far from 2/16")
  }

  test("scalable ntile equals the global-window anchor row for row") {
    // same contract as the q_topk_heap/q_topk_per_group twin: the
    // one-reducer-free formulation must be indistinguishable in output
    val anchor = Relational.qQuantileBins(spark, sf)
      .collect().map(_.toString).toSeq
    val scalable = ScaleOps.qNtileScalable(spark, sf)
      .collect().map(_.toString).toSeq
    assert(scalable == anchor)
  }

  test("AQE splits a skewed join partition at runtime — the automatic " +
    "sibling of the salted join") {
    // q_skew_join is the MANUAL skew treatment (salting); AQE's
    // skew-join is the runtime one — a planted-hot-key shuffled join
    // under aggressive skew thresholds must come back with an
    // AQEShuffleRead marked `skewed=`, and the result must equal the
    // untreated join (AQE may only re-plan, never change semantics)
    // 80% of rows under ONE key → that key's shuffle partition is ~8×
    // the median, unambiguously past factor=1. sf0.1 (15k events):
    // skew detection reads COMPRESSED shuffle bytes, and a 1 500-row
    // run-length-friendly partition can dip under any sane threshold
    val ev = graft.io.Tables.load(spark, "/root/testdata/sf0.1", "events")
      .withColumn("k", when(pmod(col("user_id"), lit(10)) < 8, lit("hot"))
        .otherwise(concat(lit("cold_"), pmod(col("user_id"), lit(10)))))
    // literal dim: OptimizeSkewedJoin pattern-matches
    // SMJ(sort(shuffle), sort(shuffle)) EXACTLY — a distinct()-built
    // dim leaves its aggregate inside the join stage and the rule
    // bails; so would an agg keyed on k above the join (it would
    // REQUIRE the join's partitioning)
    val dim = {
      import spark.implicits._
      Seq("hot", "cold_8", "cold_9").toDF("k")
        .withColumn("w", length(col("k")))
    }
    // sort-merge (broadcast disabled below): SMJ streams BOTH sides,
    // so the skewed one is splittable — a shuffled-hash join with the
    // fact as build side would be ineligible (build can't split)
    // repartition(8) first: a skewed reduce partition is split at
    // MAPPER-output boundaries, and the one-file events scan is a
    // single map task — with one mapper there is nothing to split
    // (the same one-file trap the similarity module documents)
    def run(): org.apache.spark.sql.DataFrame =
      ev.select(col("k"), col("event_id")).repartition(8)
        .hint("merge").join(dim, "k")
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100b",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100b",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      // coalescing merges the small partitions FIRST and masks the
      // skew decision — turn it off so the split is observable
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = run()
      // collect THIS df (a separate count() would execute its own
      // plan and leave df's AQE un-finalized); inner join against the
      // complete key dim keeps every row — AQE re-planning must not
      // change the result
      val got = df.collect().length
      assert(got == ev.count(), s"AQE changed the join result: $got")
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead skewed") &&
        finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("scalable ntile reproduces SQL's remainder rule when N % k != 0") {
    // every gated SF has orders counts divisible by 10, so the gated
    // query can't see the remainder path — a review caught the naive
    // floor((rank-1)*k/N)+1 identity passing all gates while diverging
    // from SQL ntile on any non-divisible N. Pin it per-row on N=1499.
    import org.apache.spark.sql.functions._
    val ord = Seq(col("o_totalprice"), col("o_orderkey"))
    val orders = graft.io.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .where(col("o_orderkey") =!= 0)
    assert(orders.count() % 10 != 0, "fixture must hit the remainder path")
    val anchor = orders
      .withColumn("ntile", ntile(10).over(
        org.apache.spark.sql.expressions.Window.orderBy(ord: _*)))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val scalable = ScaleOps.ntileScalable(orders, ord, 10)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(scalable == anchor)
  }

  test("maintenance-due policy: tombstone mass trips the fold rule " +
    "on its own (no excess epochs), a clean store trips nothing, " +
    "and each gated stage trips exactly its documented rules") {
    import org.apache.spark.sql.functions._
    import graft.SparkSpec.spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-due").toString
    try {
      // heavy store: ONE epoch layer, but 6/40 > 1/20 of rows masked
      // — the fold is due for tombstone mass alone
      graft.io.Tables.writeManifested(
        (0L until 40L).toDF("id").withColumn("ingest_epoch", lit(0L)),
        s"$root/heavy", Seq("ingest_epoch"))
      graft.io.Tables.ingestTombstones(
        (0L until 6L).toDF("id"), s"$root/heavy_tomb", epoch = 1L)
      val heavy = ScaleOps.maintenanceDue(ScaleOps.archiveHealth(
        spark, "heavy", s"$root/heavy", s"$root/heavy_tomb", "id"))
      assert(heavy == ((true, "tombstone_mass", false, "none")),
        s"heavy store verdict: $heavy")
      // clean store: one epoch, no tombstones, one version
      graft.io.Tables.writeManifested(
        (0L until 40L).toDF("id").withColumn("ingest_epoch", lit(0L)),
        s"$root/clean", Seq("ingest_epoch"))
      val clean = ScaleOps.maintenanceDue(ScaleOps.archiveHealth(
        spark, "clean", s"$root/clean", s"$root/clean_tomb", "id"))
      assert(clean == ((false, "none", false, "none")),
        s"clean store verdict: $clean")
      // the gated three-stage construction trips exactly as documented
      val due = ScaleOps.qMaintenanceDue(spark, sf).collect()
        .map(r => r.getString(0) ->
          (r.getBoolean(6), r.getString(7), r.getBoolean(8),
            r.getString(9))).toMap
      assert(due("staged") == ((true, "epoch_layers", true,
        "superseded_versions")), s"staged: ${due("staged")}")
      assert(due("folded") == ((false, "none", true,
        "superseded_versions")), s"folded: ${due("folded")}")
      assert(due("vacuumed") == ((false, "none", false, "none")),
        s"vacuumed: ${due("vacuumed")}")
    } finally org.apache.hadoop.fs.FileUtil.fullyDelete(
      new java.io.File(root))
  }
}
