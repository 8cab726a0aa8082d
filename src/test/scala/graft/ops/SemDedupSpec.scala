package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Falsifiability net for [[Similarity.dedupSemantic]] (SemDeDup):
  * the planted fixture pins the drop rule exactly (lower-id witness,
  * within-cell only, inclusive θ boundary with an EXACT-FP cosine),
  * and the real-data test replays the whole dropped-set computation
  * with an independent in-memory Scala reference over the same cell
  * assignment — a wrong join side, a strict instead of inclusive
  * comparison, or a cross-cell leak each flips a concrete assert. */
class SemDedupSpec extends SparkSpec {

  // Pythagorean vectors: every norm and cosine below is an exact
  // double (dot and norms are small integers; 24/25 is one correctly
  // rounded division both here and in the engine), so the inclusive
  // θ-boundary case is deterministic — no sqrt-of-irrational epsilon.
  private val theta = 24.0 / 25.0

  private def fixture = {
    import SparkSpec.spark.implicits._
    Seq(
      // cell 0: 1 is the minimum id; 2 sits EXACTLY at θ (24/25);
      // 3 is colinear with 1 (cos 1.0); 4 orthogonal to all
      (1L, 0L, Seq(3.0, 4.0), 5.0),
      (2L, 0L, Seq(4.0, 3.0), 5.0),
      (3L, 0L, Seq(6.0, 8.0), 10.0),
      (4L, 0L, Seq(-4.0, 3.0), 5.0),
      // cell 1: 5 is IDENTICAL in direction to 1 but in another cell
      // (must survive — SemDeDup only compares within a cluster);
      // 6 at cos 0.6 < θ from 5
      (5L, 1L, Seq(3.0, 4.0), 5.0),
      (6L, 1L, Seq(5.0, 0.0), 5.0),
    ).toDF("vec_id", "cell", "emb", "nrm")
  }

  test("planted cells: lower-id wins, θ inclusive, within-cell only") {
    val dropped = Similarity.semDedupDropped(fixture, theta)
      .collect().map(_.getLong(0)).toSet
    // 2 dropped at the exact boundary (cos == θ), 3 via the colinear
    // witness; 4 (orthogonal), 5 (cross-cell twin of 1), 6 (< θ) kept
    assert(dropped == Set(2L, 3L))
  }

  test("strictly-below-θ pair survives") {
    val dropped = Similarity.semDedupDropped(fixture, theta + 1e-12)
      .collect().map(_.getLong(0)).toSet
    // nudging θ above 24/25 must flip ONLY the boundary pair: 3 still
    // falls (cos 1.0), 2 now survives — proves the comparison is on
    // the raw cosine against θ, not a pre-rounded value
    assert(dropped == Set(3L))
  }

  test("real data: dropped set equals an independent in-memory replay") {
    val kept = Similarity.dedupSemantic(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // same corpus + same trained cells the query path used (memoized)
    val cents = Similarity.trainedCents(spark, sf)
      .withColumn("cnrm",
        sqrt(graft.expr.VectorExprs.dotProduct(col("cemb"), col("cemb"))))
    val assigned = Similarity.coarseAssign(
        Similarity.unitCorpus(spark, sf).select("vec_id", "emb", "nrm"),
        cents)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray, r.getDouble(3)))
    // reference rule, recomputed from scratch: drop v iff some same-
    // cell u with u.id < v.id has cosine >= θ. Dot is the same
    // array-order sequential sum the engine's DotProduct uses, so the
    // comparison is bit-identical.
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byCell = assigned.groupBy(_._2)
    val refDropped = byCell.values.flatMap { members =>
      val sorted = members.sortBy(_._1)
      sorted.zipWithIndex.collect { case ((vid, _, emb, nrm), i)
        if sorted.take(i).exists { case (_, _, wEmb, wNrm) =>
          dot(wEmb, emb) / (wNrm * nrm) >= 0.25 } => vid
      }
    }.toSet
    val all = assigned.map(_._1).toSet
    assert(kept == all -- refDropped)
    // the drop path is exercised for real at this SF, and something
    // survives — the semantics are non-vacuous in both directions
    assert(refDropped.nonEmpty && kept.nonEmpty)
  }

  // ---------- boundary-miss recall audit ----------

  test("planted recall: exact vs cell-bounded counts, to the row") {
    val corpus = fixture.select("vec_id", "emb", "nrm")
    val row = Similarity.semDedupRecallFrom(corpus,
        Similarity.semDedupDropped(fixture, theta), theta)
      .collect().head
    // exact cell-blind dropped = {2 (cos=θ inclusive), 3 (colinear),
    // 5 (cross-cell twin of 1)}; cell-bounded = {2, 3} — vector 5's
    // only witness sits in the other cell, so it is THE boundary miss
    assert(row.getDouble(0) == 0.96)          // theta (24/25 rounds to 0.96)
    assert(row.getLong(1) == 6L)              // n_vectors
    assert(row.getLong(2) == 3L)              // n_dup_exact
    assert(row.getLong(3) == 2L)              // n_dup_cell
    assert(row.getLong(4) == 1L)              // n_boundary_miss
    assert(row.getDouble(5) == 0.6667)        // recall = roundQ(2/3)
  }

  test("planted recall: a hand-expanded witness recovers the miss") {
    val corpus = fixture.select("vec_id", "emb", "nrm")
    // vector 1 additionally witnesses in cell 1 (its "second probe"):
    // exactly what semDedupWitnessesMp emits when cell 1's centroid
    // is 1's second-nearest — and vector 5, 1's cross-cell twin, now
    // has an in-cell witness below it
    val mpWitnesses = fixture.select(col("cell"),
        col("vec_id").as("wit_id"), col("emb").as("wemb"),
        col("nrm").as("wnrm"))
      .unionAll(fixture.where(col("vec_id") === 1L)
        .select(lit(1L).as("cell"), col("vec_id").as("wit_id"),
          col("emb").as("wemb"), col("nrm").as("wnrm")))
    val row = Similarity.semDedupRecallFrom(corpus,
        Similarity.semDedupDroppedBy(fixture, mpWitnesses, theta), theta)
      .collect().head
    assert(row.getLong(2) == 3L && row.getLong(3) == 3L)
    assert(row.getLong(4) == 0L)              // no boundary miss left
    assert(row.getDouble(5) == 1.0)
  }

  test("mp witnesses: probe 1 is the coarse assignment, probe rows strictly widen") {
    val e = Similarity.unitCorpus(spark, sf).select("vec_id", "emb", "nrm")
    val cents = Similarity.trainedCents(spark, sf)
      .withColumn("cnrm",
        sqrt(graft.expr.VectorExprs.dotProduct(col("cemb"), col("cemb"))))
    val single = Similarity.coarseAssign(e, cents)
      .select(col("cell"), col("vec_id").as("wit_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = Similarity.semDedupWitnessesMp(e, cents, 2)
      .select(col("cell"), col("wit_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every top-1 witness row survives in the mp table (superset),
    // and with ≥2 cells each witness gains exactly one more cell
    assert(single.subsetOf(mp))
    assert(mp.size == 2 * single.size)
    val cellsPerWit = mp.groupBy(_._2).map(_._2.size).toSet
    assert(cellsPerWit == Set(2))
  }

  test("real data: count identities, replayed exact set, mp ≥ single recall") {
    val exact = Similarity.qSemdedupRecall(spark, sf).collect().head
    val mp = Similarity.qSemdedupRecallMp(spark, sf).collect().head
    // the audit's internal arithmetic holds on both rows
    for (r <- Seq(exact, mp)) {
      assert(r.getLong(2) == r.getLong(3) + r.getLong(4))
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0)
    }
    // same exact baseline, and the second probe can only help
    assert(exact.getLong(2) == mp.getLong(2))
    assert(mp.getLong(3) >= exact.getLong(3))
    assert(mp.getDouble(5) >= exact.getDouble(5))
    // n_dup_exact replayed by an independent in-memory all-pairs scan
    val corpus = Similarity.unitCorpus(spark, sf)
      .select("vec_id", "emb", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val refExact = corpus.zipWithIndex.count { case ((_, emb, nrm), i) =>
      corpus.take(i).exists { case (_, wEmb, wNrm) =>
        dot(wEmb, emb) / (wNrm * nrm) >= 0.25 }
    }
    assert(exact.getLong(2) == refExact.toLong)
    assert(exact.getLong(1) == corpus.length.toLong)
  }

  test("mp kept corpus: subset of single-probe kept, same cell labels") {
    val kept = Similarity.dedupSemantic(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val keptMp = Similarity.dedupSemanticMp(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // extra witnesses only ADD drops — mp keeps a subset — and the
    // cell assignment itself is untouched by witness expansion
    assert(keptMp.keySet.subsetOf(kept.keySet))
    assert(keptMp.forall { case (id, cell) => kept(id) == cell })
    assert(keptMp.nonEmpty)
  }

  // ---------- Incremental (batch-vs-archive) SemDeDup ----------

  /** Planted two-cell geometry for the incremental path. Centroids at
    * the axes; every vector is a Pythagorean direction so each cosine
    * below is an exact double. Archive ids {10,20,30,40}; batch ids
    * deliberately INTERLEAVED ({5,25,50,60}) so the id-order predicate
    * is exercised in both directions. */
  private def incCents = {
    import SparkSpec.spark.implicits._
    Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("cent_id", "cemb")
  }
  private def incArchive = {
    import SparkSpec.spark.implicits._
    Seq( // raw (vec_id, embedding) — the ingest-facing schema
      (10L, Seq(3.0, 4.0)),   // cell 0 (cos .6 to x-axis > cos .8? no:
                              //  cos to c0 = 3/5=.6, to c1 = 4/5=.8 → cell 1
      (20L, Seq(4.0, 3.0)),   // → cell 0 (cos .8 to c0)
      (30L, Seq(5.0, 0.0)),   // cell 0, pure x
      (40L, Seq(0.0, 5.0)))   // cell 1, pure y
      .toDF("vec_id", "embedding")
  }

  test("incremental verdicts equal the full SemDeDup run on the union " +
    "corpus under the frozen centroids — whatever the id interleaving") {
    import SparkSpec.spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("graft-seminc-spec").toString
    try {
      Similarity.buildSemDedupArchiveTo(incArchive, incCents, idx)
      val batch = Seq(
        (5L, Seq(8.0, 6.0)),   // cell 0, colinear with 20 — but 5 < 20:
                               // the archive twin has a LARGER id → kept
        (25L, Seq(10.0, 0.0)), // cell 0, colinear with 30 (30 > 25 → no)
                               // BUT cos(25,20)=0.8 ≥ θ? θ=0.8 below: dup
        (50L, Seq(0.0, 9.0)),  // cell 1, colinear with 40 → dup of 40
        (60L, Seq(6.0, 8.0)))  // cell 1 (cos .8 to c1); witness 10 is
                               // colinear (cos 1.0), 10 < 60 → dup
        .toDF("vec_id", "embedding")
      val theta = 0.8
      val got = Similarity.dedupSemanticIncrementalFrom(batch, idx, 1L, theta)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

      // independent full run: assign the UNION under the same frozen
      // centroids, apply the exact drop rule, restrict to batch ids
      val cents = incCents.withColumn("cnrm",
        sqrt(graft.expr.VectorExprs.dotProduct(col("cemb"), col("cemb"))))
      val union = incArchive.unionByName(batch)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("emb"))
        .withColumn("nrm",
          sqrt(graft.expr.VectorExprs.dotProduct(col("emb"), col("emb"))))
      val fullDropped = Similarity.semDedupDropped(
          Similarity.coarseAssign(union, cents), theta)
        .collect().map(_.getLong(0)).toSet
      val batchIds = Set(5L, 25L, 50L, 60L)
      assert(got.keySet == batchIds)
      assert(got.filter(_._2).keySet == fullDropped.intersect(batchIds),
        s"incremental verdicts ${got.filter(_._2).keySet} != full-run " +
          s"${fullDropped.intersect(batchIds)}")
      // the planted geometry itself: 5 kept (twin has larger id),
      // 25/50/60 dropped
      assert(got == Map(5L -> false, 25L -> true,
        50L -> true, 60L -> true), s"planted verdicts: $got")

      // replay idempotence: same epoch, same verdicts, archive stable
      val rows = graft.io.Tables
        .readBucketedArchive(spark, s"$idx/assigned").count()
      val again = Similarity.dedupSemanticIncrementalFrom(batch, idx, 1L, theta)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      assert(again == got, "epoch replay changed the verdicts")
      assert(graft.io.Tables
        .readBucketedArchive(spark, s"$idx/assigned").count() == rows,
        "epoch replay grew the archive")
    } finally org.apache.hadoop.fs.FileUtil.fullyDelete(
      new java.io.File(idx))
  }

  test("real data: incremental batch verdicts equal the full run on " +
    "the union, and batch recall vs the exact all-pairs audit clears " +
    "its floor") {
    import SparkSpec.spark.implicits._
    val got = Similarity.dedupSemanticIncremental(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got.nonEmpty && got.values.exists(identity),
      "batch verdicts are vacuous — no dup was ever flagged")

    // full-run reference under the SAME frozen (old-corpus) centroids
    val cents = Similarity.semIncCentsForSpec(spark, sf)
    val union = Similarity.unitCorpus(spark, sf)
      .select("vec_id", "emb", "nrm")
    val fullDropped = Similarity.semDedupDropped(
        Similarity.coarseAssign(union, cents), 0.25)
      .collect().map(_.getLong(0)).toSet
    val batchIds = got.keySet
    assert(got.filter(_._2).keySet == fullDropped.intersect(batchIds),
      "real-data incremental verdicts diverge from the full run")

    // recall floor vs the EXACT all-pairs audit, restricted to the
    // batch: the cell-bounded probe may miss cross-cell twins (the
    // SemDeDup trade) but must catch most — info() reports the
    // measured fraction
    val exactBatch = Similarity.semDedupExactDropped(union, 0.25)
      .collect().map(_.getLong(0)).toSet.intersect(batchIds)
    assert(exactBatch.nonEmpty, "audit denominator is empty")
    val caught = got.filter(_._2).keySet.intersect(exactBatch).size
    val recall = caught.toDouble / exactBatch.size
    info(s"incremental batch recall: $caught/${exactBatch.size} = $recall")
    assert(recall >= 0.6,
      s"incremental recall $recall = $caught/${exactBatch.size} < 0.6")
  }
}
