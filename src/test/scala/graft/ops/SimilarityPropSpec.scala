package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated corpora for the SemDeDup drop/audit family —
  * random vectors, random cell assignments, random witness
  * expansions, random thresholds — checked against independent
  * in-memory references. The planted SemDedupSpec fixtures pin
  * chosen boundary cases (exact-FP θ, cross-cell twins); these sweep
  * assignments and witness tables nobody chose, the regions where a
  * wrong join side or a leaked cell comparison would hide. Manual
  * sampling with fixed seeds, same rationale as RelationalPropSpec.
  */
class SimilarityPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9042L + i)))

  // small-int coordinates: every dot, norm and cosine below is the
  // same IEEE arithmetic on exactly representable inputs in both the
  // engine's codegen'd DotProduct and the reference loop
  private val vecGen: Gen[Seq[Double]] =
    Gen.listOfN(3, Gen.choose(-3, 3).map(_.toDouble))
      .suchThat(_.exists(_ != 0.0)).map(_.toSeq)
  private val corpusGen: Gen[List[(Long, Long, Seq[Double])]] =
    Gen.choose(5, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(0L, 2L), vecGen))
        .map(_.zipWithIndex.map { case ((cell, v), i) =>
          ((i + 1).toLong, cell, v)
        }))
  private val thetaGen: Gen[Double] =
    Gen.oneOf(0.0, 0.25, 0.5, 0.8)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def nrm(a: Seq[Double]): Double = math.sqrt(dot(a, a))
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (nrm(a) * nrm(b))

  private def toAssigned(corpus: Seq[(Long, Long, Seq[Double])]) = {
    import SparkSpec.spark.implicits._
    corpus.map { case (id, cell, v) => (id, cell, v, nrm(v)) }
      .toDF("vec_id", "cell", "emb", "nrm")
  }

  test("cell-bounded drop rule matches an in-memory replay on random " +
    "corpora and thresholds") {
    for (((corpus, theta), i) <-
        samples(Gen.zip(corpusGen, thetaGen)).zipWithIndex) {
      val got = Similarity.semDedupDropped(toAssigned(corpus), theta)
        .collect().map(_.getLong(0)).toSet
      val ref = corpus.collect { case (id, cell, v)
        if corpus.exists { case (w, wc, wv) =>
          wc == cell && w < id && cos(wv, v) >= theta } => id
      }.toSet
      assert(got == ref,
        s"sample $i (θ=$theta): engine $got vs reference $ref " +
          s"on corpus $corpus")
    }
  }

  test("any witness table yields a subset of the exact dropped set, " +
    "supersets only add drops, and the audit row stays consistent") {
    val witGen = Gen.zip(corpusGen, thetaGen,
      Gen.listOfN(6, Gen.zip(Gen.choose(1L, 12L), Gen.choose(0L, 2L))))
    for (((corpus, theta, extra), i) <- samples(witGen).zipWithIndex) {
      import SparkSpec.spark.implicits._
      val assigned = toAssigned(corpus)
      val byId = corpus.map(c => c._1 -> c._3).toMap
      // random extra witness rows: existing vectors re-witnessing in
      // arbitrary cells (the mp expansion, fuzzed)
      val extraRows = extra.collect { case (id, cell) if byId.contains(id) =>
        (cell, id, byId(id), nrm(byId(id)))
      }
      val witnesses = corpus
        .map { case (id, cell, v) => (cell, id, v, nrm(v)) }
        .++(extraRows)
        .toDF("cell", "wit_id", "wemb", "wnrm")
      val defaultDropped = Similarity.semDedupDropped(assigned, theta)
        .collect().map(_.getLong(0)).toSet
      val widenedDropped = Similarity
        .semDedupDroppedBy(assigned, witnesses, theta)
        .collect().map(_.getLong(0)).toSet
      val exact = corpus.collect { case (id, _, v)
        if corpus.exists { case (w, _, wv) =>
          w < id && cos(wv, v) >= theta } => id
      }.toSet
      assert(defaultDropped.subsetOf(widenedDropped),
        s"sample $i: witness superset removed a drop")
      assert(widenedDropped.subsetOf(exact),
        s"sample $i: widened witnesses invented a non-duplicate drop " +
          s"($widenedDropped vs exact $exact)")
      // audit row arithmetic on the widened set
      val corpusDf = assigned.select(col("vec_id"), col("emb"), col("nrm"))
      val row = Similarity.semDedupRecallFrom(corpusDf,
          Similarity.semDedupDroppedBy(assigned, witnesses, theta), theta)
        .collect().head
      assert(row.getLong(1) == corpus.length.toLong)
      assert(row.getLong(2) == exact.size.toLong)
      assert(row.getLong(3) == widenedDropped.size.toLong)
      assert(row.getLong(4) == (exact.size - widenedDropped.size).toLong)
    }
  }
}
