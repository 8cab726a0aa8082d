package graft.ops

import graft.SparkSpec

/** Near-dup pipeline invariants that the DuckDB oracle can't check
  * (MinHash/SimHash use xxhash64, not portable to the oracle). */
class DedupSpec extends SparkSpec {

  test("minhash-LSH candidates are verified: every emitted pair meets " +
    "the exact-Jaccard threshold (no false positives)") {
    val truth = TextOps.dedupNgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = TextOps.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(lsh.nonEmpty)
    lsh.foreach { case (pair, j) =>
      assert(truth.contains(pair), s"LSH pair $pair not in ground truth")
      assert(math.abs(truth(pair) - j) < 1e-9)
    }
  }

  test("minhash-LSH recall vs exact n-gram Jaccard at j>=0.5") {
    // 16 perms / 4 bands: P(candidate) = 1-(1-j^4)^4 ≈ 0.22 at j=0.5,
    // ≈ 0.93 at j=0.8. Planted near-dups in the testdata sit high, so
    // recall on the j≥0.5 slice should be strong.
    val truth = TextOps.dedupNgramJaccard(spark, sf)
      .where(org.apache.spark.sql.functions.col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = TextOps.dedupMinhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "testdata should contain strong near-dups")
    val recall = truth.count(lsh.contains).toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall < 0.8 on ${truth.size} pairs")
  }

  test("simhash pairs are at Hamming distance <= 3 and symmetric-free") {
    val rows = TextOps.dedupSimhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // canonical orientation
      assert(r.getInt(2) <= 3)
    }
  }

  test("df cap keeps candidate volume linear under a planted stop-shingle") {
    import spark.implicits._
    // k docs all share one boilerplate shingle; everything else unique.
    // Uncapped, that single hot shingle alone yields k(k-1)/2 candidate
    // pairs (the quadratic blow-up); with df cap < k the hot shingle is
    // dropped and candidate volume collapses to the true near-dups (0).
    val k = 40
    val docs = (0 until k).map(i =>
      (i.toLong, s"common boiler plate u$i a$i b$i c$i d$i"))
      .toDF("doc_id", "text")
    val sh = TextOps.shingles(docs)
    val uncapped = TextOps.jaccardCandidates(sh, Int.MaxValue).count()
    val capped = TextOps.jaccardCandidates(sh, 10).count()
    assert(uncapped == k.toLong * (k - 1) / 2,
      s"planted stop-shingle should go quadratic uncapped: $uncapped")
    assert(capped == 0, s"df cap should drop hot-shingle candidates: $capped")
  }

  test("capped Jaccard equals the exact ground truth when no shingle is hot") {
    // testdata has no shingle above the df cap (max df 25 at sf0.1),
    // so the capped feature space IS the full space and the results
    // must be identical — the cap's effect is pinned separately by the
    // planted-stop-shingle test above
    val truth = TextOps.dedupNgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = TextOps.dedupJaccardCapped(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.nonEmpty)
    assert(capped == truth,
      s"capped=${capped.size} truth=${truth.size} — results must match exactly")
  }

  test("corpus-clean pipeline: every verdict class fires with correct precedence") {
    import spark.implicits._
    val en = "the cat sat on the mat and then the dog ran far away today"
    val docs = Seq(
      (0L, "one two"), // short (< 5 words)
      (1L, "xyz qqq www rrr ttt uuu vvv"), // lang: no en markers, no zh
      (2L, en), // kept — canonical of the exact-dup group
      (3L, en), // exact_dup of 2
      (4L, en + " extra tail words here"), // near_dup of 2 (j >= 0.5)
      (5L, "the sun is bright and the sky is blue over the hills now")
      // 5: kept — en, unique
    ).toDF("doc_id", "text")
    val verdicts = TextOps.corpusCleanVerdicts(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts == Map(0L -> "short", 1L -> "lang", 2L -> "kept",
      3L -> "exact_dup", 4L -> "near_dup", 5L -> "kept"), s"got $verdicts")
  }

  test("exact dedup: canonical_id is the min doc_id of its text group") {
    val rows = TextOps.dedupExact(spark, sf).collect()
    val byCanon = rows.groupBy(_.getLong(1))
    byCanon.foreach { case (canon, grp) =>
      assert(grp.map(_.getLong(0)).min == canon)
      assert(grp.count(_.getBoolean(2)) == 1) // exactly one keeper
    }
  }
}
