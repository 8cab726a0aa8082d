package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated corpora differentially checked against
  * independent in-memory references for the dedup/cluster family —
  * the planted fixtures in DedupSpec/CurationSpec pin chosen corner
  * cases; these properties sweep corpora nobody chose. Sampling is
  * driven manually (fixed seeds, 5 cases per law) for the same
  * reasons as RelationalPropSpec: the scalatest↔scalacheck bridge is
  * not on the offline classpath, and few-but-deterministic Spark
  * jobs beat many.
  *
  * The generator leans into collisions on purpose: an 8-word vocab
  * over 1–9-word docs makes shared 3-gram shingles, exact-boundary
  * Jaccard ratios, one-word docs (no shingles — must still cluster
  * as singletons), and punctuated tokens (nonzero punct_ratio) all
  * common, exactly the regions a hand-planted fixture under-samples.
  */
class DedupPropSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7042L + i)))

  // two punctuated tokens so quality's punct_ratio term is exercised
  private val vocab = Vector("alpha", "beta", "gamma", "delta",
    "eps", "zeta", "omega!", "iota,")
  private val docGen: Gen[String] =
    Gen.choose(1, 9).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(4, 10).flatMap(n =>
      Gen.listOfN(n, docGen).map(_.zipWithIndex.map {
        case (t, i) => ((i + 1).toLong, t)
      }))

  // ---------- independent references (no Spark, no shared code) ----

  private def shinglesOf(text: String): Set[String] = {
    val ws = text.split(" ")
    if (ws.length < 3) Set.empty
    else ws.sliding(3).map(_.mkString(" ")).toSet
  }

  /** Pairs at raw-double Jaccard ≥ 0.2 over 3-gram shingle sets —
    * the same IEEE division the engine's count/cast performs. */
  private def refPairs(corpus: Seq[(Long, String)]): Map[(Long, Long), Double] = {
    val sh = corpus.map { case (id, t) => id -> shinglesOf(t) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh
      if a < b && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size
      if inter > 0
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.2
    } yield (a, b) -> math.floor(j * 10000 + 0.5) / 10000).toMap
  }

  /** Union-find with the smaller root winning, so every component's
    * label is its minimum member — the engine's labeling contract. */
  private def refClusters(ids: Seq[Long],
                          pairs: Iterable[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.map(i => i -> find(i)).toMap
  }

  /** The TextOps.qualityScore formula, recomputed from scratch. */
  private def refScore(text: String): Double = {
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val ws = text.split(" ")
    val ttr = r4(ws.distinct.length.toDouble / ws.length)
    val punct = r4(text.replaceAll("[a-z\\s]", "").length.toDouble
      / text.length)
    r4(ttr - punct)
  }

  // ---------- properties ----------

  test("jaccard pair generation matches an independent set-algebra " +
    "replay on random corpora (pairs AND rounded values)") {
    for ((corpus, i) <- samples(corpusGen).zipWithIndex) {
      import spark.implicits._
      val got = TextOps.jaccardJoin(
          TextOps.shingles(corpus.toDF("doc_id", "text")), 0.2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == refPairs(corpus),
        s"sample $i: engine pairs $got vs reference ${refPairs(corpus)} " +
          s"on corpus $corpus")
    }
  }

  test("cluster canonicals match an independent union-find + argmax " +
    "replay on random corpora (labels, sizes, scores, keepers)") {
    for ((corpus, i) <- samples(corpusGen).zipWithIndex) {
      import spark.implicits._
      val got = Curation
        .clusterCanonicalFrom(corpus.toDF("doc_id", "text"),
          s"prop_cluster_$i")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getLong(4), r.getBoolean(5))).toMap
      val labels = refClusters(corpus.map(_._1), refPairs(corpus).keys)
      val scores = corpus.map { case (id, t) => id -> refScore(t) }.toMap
      val byCluster = labels.groupBy(_._2)
      val expected = corpus.map { case (id, _) =>
        val members = byCluster(labels(id)).keys.toSeq
        val canon = members.sortBy(m => (-scores(m), m)).head
        id -> ((labels(id), members.size.toLong, scores(id), canon,
          id == canon))
      }.toMap
      assert(got == expected,
        s"sample $i: engine $got vs reference $expected on corpus $corpus")
    }
  }
}
