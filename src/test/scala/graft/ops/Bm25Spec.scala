package graft.ops

import graft.SparkSpec

/** The BM25 gate's safety case (see [[TextOps.bm25Raw]]): the oracle
  * hash-compare survives the cross-engine ln() ulp gap ONLY if no
  * score sits near a 4-dp rounding boundary — this spec PROVES that
  * margin on every SF's fixture, and checks the scores against an
  * independent scalar BM25 written with plain math.log (no Spark). */
class Bm25Spec extends SparkSpec {

  private val queries = Map(
    1 -> Seq("spark", "join"),
    2 -> Seq("window", "hash", "scan"),
    3 -> Seq("vector", "stream", "filter"))

  /** Independent reference: scalar BM25 (k1=1.2, b=0.75, Lucene
    * non-negative IDF) over the collected corpus. */
  private def referenceScores(dir: String): Map[(Int, Long), Double] = {
    val rows = graft.io.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // split(" ", -1): Spark's split keeps trailing empty tokens;
    // Scala's 1-arg split drops them — mirror Spark exactly
    val toks = rows.map { case (id, t) => id -> t.split(" ", -1) }
    val dl = toks.map { case (id, w) => id -> w.length.toDouble }.toMap
    val n = rows.length.toDouble
    val avgdl = dl.values.sum / n
    val allTerms = queries.values.flatten.toSet
    val df = allTerms.map(t =>
      t -> toks.count(_._2.contains(t)).toDouble).toMap
    val tf = toks.map { case (id, w) =>
      id -> w.groupBy(identity).map { case (k, v) =>
        k -> v.length.toDouble }
    }.toMap
    (for {
      (qid, terms) <- queries.toSeq
      (id, _) <- rows
      scores = terms.flatMap(t => tf(id).get(t).map { f =>
        math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
      })
      if scores.nonEmpty
    } yield (qid, id) -> scores.sum).toMap
  }

  test("raw BM25 scores match the independent scalar reference and " +
    "never graze a 4-dp rounding boundary — at every SF the gate runs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { d =>
      val ref = referenceScores(d)
      val got = TextOps.bm25Raw(spark, d).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == ref.keySet,
        s"$d: candidate sets diverge (${got.size} vs ${ref.size})")
      var minMargin = Double.MaxValue
      got.foreach { case (k, raw) =>
        assert(math.abs(raw - ref(k)) < 1e-9,
          s"$d $k: spark=$raw ref=${ref(k)}")
        // distance of raw*1e4+0.5 to the nearest integer = distance to
        // the nearest floor(x*1e4+0.5) flip point; the cross-engine
        // ln() divergence is ≤ ~1e-11 at this scale, so 1e-6 is five
        // orders of safety
        val y = raw * 10000 + 0.5
        minMargin = math.min(minMargin, math.abs(y - math.rint(y)))
      }
      info(s"$d: ${got.size} scores, min boundary margin $minMargin")
      assert(minMargin > 1e-6,
        s"$d: a score sits $minMargin from a rounding boundary — " +
          "the hash gate would be one ulp from flipping")
    }
  }

  test("q_bm25_topk reproduces the reference ranking exactly " +
    "(rounded score desc, doc_id tiebreak)") {
    val ref = referenceScores(sf)
    val expected = ref.groupBy(_._1._1).flatMap { case (qid, scores) =>
      scores.toSeq
        .map { case ((_, id), s) =>
          (id, math.floor(s * 10000 + 0.5) / 10000) }
        .sortBy { case (id, s) => (-s, id) }
        .take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, id, s, i + 1) }
    }.toSet
    val got = TextOps.qBm25Topk(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == expected,
      s"ranking diverged:\nonly-spark: ${got -- expected}\n" +
        s"only-ref: ${expected -- got}")
  }
}
