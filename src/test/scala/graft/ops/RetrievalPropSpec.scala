package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated corpora differentially checked against an
  * independent in-memory BM25 for the persisted token index —
  * TokenIndexSpec pins the laws on the driver fixture; these sweep
  * random corpora, random build/epoch splits, and random deletions
  * (the regions a fixed fixture under-samples). Sampling is manual
  * (fixed seeds, few deterministic Spark jobs) for the same reasons
  * as the other *PropSpecs here.
  *
  * The vocab mixes the gated query's terms with filler so hit/miss
  * docs, zero-hit corpora, and shared-score ties are all common. */
class RetrievalPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 4): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(9137L + i)))

  private val queries = Map(
    1 -> Seq("spark", "join"),
    2 -> Seq("window", "hash", "scan"),
    3 -> Seq("vector", "stream", "filter"))

  private val vocab = Vector("spark", "join", "window", "hash", "scan",
    "vector", "stream", "filter", "noise", "pad", "blank")
  private val docGen: Gen[String] =
    Gen.choose(1, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, docGen).map(_.zipWithIndex.map {
        case (t, i) => ((i + 1).toLong, t)
      }))

  /** Independent scalar BM25 top-10 (Lucene non-negative IDF,
    * k1=1.2, b=0.75, 4-dp floor rounding, doc_id tiebreak) — no
    * Spark, no shared code with the engine. */
  private def referenceTopk(corpus: Seq[(Long, String)])
      : Set[(Int, Long, Double, Int)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1) }
    val dl = toks.map { case (id, w) => id -> w.length.toDouble }.toMap
    val n = corpus.length.toDouble
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
      (id, _) <- corpus
      scores = terms.flatMap(t => tf(id).get(t).filter(_ => df(t) > 0)
        .map { f =>
          math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
            (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
        })
      if scores.nonEmpty
    } yield (qid, id, math.floor(scores.sum * 10000 + 0.5) / 10000))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, id, s) => (-s, id) }.take(10).zipWithIndex
          .map { case ((qid, id, s), i) => (qid, id, s, i + 1) }
      }.toSet
  }

  private def tmp(p: String): String = {
    val d = java.nio.file.Files.createTempDirectory(p).toFile
    d.deleteOnExit(); d.toString
  }

  private def ranked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getLong(1),
      r.getDouble(2), r.getInt(3))).toSet

  test("random corpora: indexed retrieval equals the scalar reference, " +
    "and random deletions shift ranking AND stats exactly like " +
    "excluding the docs from the reference corpus") {
    import SparkSpec.spark.implicits._
    samples(Gen.zip(corpusGen, Gen.choose(0, 3))).zipWithIndex.foreach {
      case ((corpus, nDel), i) =>
        val idx = tmp(s"graft-retprop-$i")
        TextOps.buildTokenIndexTo(corpus.toDF("doc_id", "text"), idx)
        assert(ranked(TextOps.bm25IndexedFrom(spark, idx)) ==
          referenceTopk(corpus), s"case $i diverged on the full corpus")
        val victims = corpus.map(_._1).take(nDel)
        if (victims.nonEmpty && victims.size < corpus.size) {
          graft.io.Tables.ingestTombstones(
            victims.toDF("doc_id"), s"$idx/tombstones", epoch = 1L)
          val expect = referenceTopk(
            corpus.filterNot(d => victims.contains(d._1)))
          assert(ranked(TextOps.bm25IndexedFrom(spark, idx)) == expect,
            s"case $i diverged after deleting $victims")
        }
    }
  }

  test("random build/epoch splits: however the corpus is split into " +
    "build layer + ingest epochs, the merged index serves the " +
    "reference ranking") {
    import SparkSpec.spark.implicits._
    samples(Gen.zip(corpusGen, Gen.choose(0, 2))).zipWithIndex.foreach {
      case ((corpus, splitMod), i) =>
        val idx = tmp(s"graft-retprop-split-$i")
        val (e1, rest) = corpus.partition(_._1 % 3 == splitMod)
        val (base, e2) = rest.partition(_._1 % 2 == 0)
        // build layer must be non-empty; fold stragglers into it
        val b = if (base.nonEmpty) base else rest
        TextOps.buildTokenIndexTo(b.toDF("doc_id", "text"), idx)
        if (base.nonEmpty && e2.nonEmpty)
          TextOps.ingestTokenIndex(e2.toDF("doc_id", "text"), idx, 1L)
        if (e1.nonEmpty)
          TextOps.ingestTokenIndex(e1.toDF("doc_id", "text"), idx, 2L)
        assert(ranked(TextOps.bm25IndexedFrom(spark, idx)) ==
          referenceTopk(corpus),
          s"case $i split (${b.size}/${e2.size}/${e1.size}) diverged")
    }
  }
}
