package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Curation-surface invariants the row-level DuckDB oracle doesn't
  * express: connected-components graph semantics on planted graphs,
  * cluster/dedup verdict laws, decontamination sensitivity, chunk
  * coverage, packing feasibility, stratified-sample exactness. */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("connectedComponents labels a planted multi-component graph") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // components: {1,2,3} (via 1-2, 2-3), {5,6}, singletons {4}, {7}
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Curation.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("connectedComponents converges on a path graph (diameter > 1 " +
    "iteration)") {
    // 0-1-2-...-9: min label must walk the whole chain — exercises the
    // iterate-until-fixpoint loop, not just one propagation round
    val n = 10
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("src", "dst")
    val got = Curation.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until n).map(_.toLong -> 0L).toMap)
  }

  test("alternating (large-star/small-star) CC matches min-label " +
    "propagation and converges in O(log n) rounds on a long path") {
    // the adversarial case for min-label: a 60-node path needs 59
    // propagation rounds; the alternating algorithm must land the
    // same labels in ~log2(60) ≈ 6 rounds (allow slack to 12)
    val n = 60
    val vertices = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L))
      .toDF("src", "dst")
    val (labels, rounds) =
      Curation.connectedComponentsAlternating(vertices, edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0 until n).map(_.toLong -> 0L).toMap)
    assert(rounds <= 12,
      s"alternating CC took $rounds rounds on a $n-path — not O(log n)")

    // and on the multi-component graph, both algorithms agree exactly
    val v2 = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val e2 = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val (alt, _) = Curation.connectedComponentsAlternating(v2, e2)
    val simple = Curation.connectedComponents(v2, e2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == simple)
  }

  test("connectedComponents refuses to return a partial labeling " +
    "(distributed loop, forced via the cap override)") {
    val vertices = (0 until 10).map(_.toLong).toDF("id")
    val edges = (0 until 9).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    // the 10-chain needs 9 min-propagation rounds; 3 must fail LOUDLY
    // (the guard protects the DISTRIBUTED loop — the in-driver
    // union-find below the cap has no rounds to run out of)
    val e = intercept[IllegalArgumentException] {
      Curation.connectedComponents(vertices, edges, maxIter = 3,
        driverCap = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("connectedComponents size-adaptive execution: the in-driver " +
    "union-find and the distributed loop emit identical labels " +
    "(multi-component graph, path graph, edges touching non-vertices)") {
    // multi-component + singleton + an edge whose endpoint (99) is
    // NOT a vertex: labels exist only for vertices, and the stray
    // edge must propagate nothing on either path
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 99L))
      .toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drv = m(Curation.connectedComponents(vertices, edges))
    val dist = m(Curation.connectedComponents(vertices, edges,
      driverCap = 0))
    assert(drv == dist, s"paths diverge: driver=$drv distributed=$dist")
    assert(drv(7L) == 7L, "a stray-edge vertex must label itself")
    // 20-node path: 19 min-label rounds, inside the distributed
    // loop's 25-round default budget
    val n = 20
    val pv = (0 until n).map(_.toLong).toDF("id")
    val pe = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("src", "dst")
    assert(m(Curation.connectedComponents(pv, pe))
      == m(Curation.connectedComponents(pv, pe, driverCap = 0)))
  }

  test("dedup_clusters verdicts: every doc exactly once, one keeper " +
    "per cluster, cluster_id is the cluster min, sizes consistent") {
    val rows = Curation.dedupClusters(spark, sf).collect()
    val docs = rows.map(_.getLong(0))
    assert(docs.length == docs.distinct.length, "a doc appeared twice")
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid,
        s"cluster $cid is not its member min")
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $cid must keep exactly one doc")
      assert(members.forall(_.getLong(3) == members.length),
        s"cluster $cid size column disagrees with membership")
    }
    // clustering must be consistent with the pair graph: every
    // ground-truth near-dup pair lands in the same cluster
    val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextOps.dedupNgramJaccard(spark, sf).collect().foreach { p =>
      assert(label(p.getLong(0)) == label(p.getLong(1)),
        s"near-dup pair ${p.getLong(0)},${p.getLong(1)} split " +
          "across clusters")
    }
  }

  test("cluster canonical: the best-quality member wins, not the min " +
    "id; ties break to the smaller id; isolated docs keep themselves") {
    import SparkSpec.spark.implicits._
    // docs 1,2 near-dup (3-gram Jaccard 3/5 = 0.6 ≥ 0.2); doc 2 has
    // the higher TTR (6/6 vs 5/6, zero punctuation in both) so the
    // CANONICAL is 2 even though the cluster min — and dedupClusters'
    // keeper — is 1. Doc 3 shares no shingle: cluster of one.
    val docs = Seq(
      (1L, "a b c d e a"),
      (2L, "a b c d e g"),
      (3L, "z z z z z z"),
    ).toDF("doc_id", "text")
    val rows = Curation
      .clusterCanonicalFrom(docs, "spec_cluster_canonical")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(rows(1L) == ((1L, 2L, 0.8333, 2L, false)))
    assert(rows(2L) == ((1L, 2L, 1.0, 2L, true)))
    assert(rows(3L) == ((3L, 1L, 0.1667, 3L, true)))
    // equal scores: identical twins must fall to the smaller id
    val tied = Seq((10L, "p q r s t"), (11L, "p q r s t"))
      .toDF("doc_id", "text")
    val tiedRows = Curation
      .clusterCanonicalFrom(tied, "spec_cluster_canonical_tie")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(4), r.getBoolean(5))).toMap
    assert(tiedRows(10L) == ((10L, true)))
    assert(tiedRows(11L) == ((10L, false)))
  }

  test("cluster canonical on real data: one keeper per cluster, " +
    "keeper score is the cluster max, same clustering as dedup_clusters") {
    val rows = Curation.qClusterCanonical(spark, sf).collect()
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      val keepers = members.filter(_.getBoolean(5))
      assert(keepers.length == 1,
        s"cluster $cid must keep exactly one doc")
      val best = keepers.head
      assert(members.forall(m => m.getDouble(3) < best.getDouble(3) ||
          (m.getDouble(3) == best.getDouble(3) &&
            m.getLong(0) >= best.getLong(0))),
        s"cluster $cid keeper is not the score/id argmax")
      assert(members.forall(_.getLong(4) == best.getLong(0)),
        s"cluster $cid canonical_id column disagrees with keeper")
    }
    // identical partition of the corpus as the min-id variant
    val minIdLabels = Curation.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(minIdLabels(r.getLong(0)) == r.getLong(1),
        s"doc ${r.getLong(0)} clustered differently than dedup_clusters")
    }
  }

  test("decontamination flags a planted benchmark copy and clears " +
    "disjoint text") {
    // doc 97 is benchmark (97 % 97 == 0); doc 1 repeats its text →
    // overlap ratio 1.0; doc 2 shares nothing → ratio 0. Planted via
    // the same shingle substrate the query uses.
    val docs = Seq(
      (97L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val sh = TextOps.shingles(docs)
    val bench = sh.where(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val overlap = sh.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(overlap(1L) == 4) // 6 words → 4 tri-gram shingles, all shared
    assert(!overlap.contains(2L))
  }

  test("chunking covers every token and respects the stride/overlap " +
    "contract") {
    val rows = Curation.qChunkDocs(spark, sf)
      .select("doc_id", "chunk_id", "n_tokens").collect()
      .groupBy(_.getLong(0))
    val nWords = graft.io.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    nWords.foreach { case (doc, n) =>
      val chunks = rows(doc).sortBy(_.getLong(1))
      assert(chunks.length == (n + 23) / 24, s"doc $doc chunk count")
      // every chunk but the last is full-length OR ends at the doc end
      chunks.dropRight(1).foreach(c => assert(c.getInt(2) == 32 ||
        c.getLong(1) * 24 + c.getInt(2) == n))
      val last = chunks.last
      assert(last.getLong(1) * 24 + last.getInt(2) == n,
        s"doc $doc last chunk must end at the last token")
    }
  }

  test("sequence packing: no batch except per-shard stragglers starts " +
    "over budget, batches are contiguous in hash order") {
    val rows = Curation.qPackSequences(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(2))) // shard,batch,n
    rows.groupBy { case (shard, batch, _) => (shard, batch) }
      .foreach { case ((shard, batch), docs) =>
        val total = docs.map(_._3).sum
        val maxDoc = docs.map(_._3).max
        // streaming fill: a batch exceeds the budget only by less than
        // its own last doc (the doc that crossed the boundary)
        assert(total < 256 + maxDoc,
          s"shard $shard batch $batch holds $total tokens")
      }
    // batch ids are dense per shard (0..max with no gaps)
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      val ids = docs.map(_._2).distinct.sorted.toSeq
      assert(ids == (0L until ids.length.toLong),
        s"shard $shard batch ids not dense: $ids")
    }
  }

  test("stratified sample is exact: min(cap, stratum size) rows per " +
    "lang, deterministic across runs") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val strata = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = Curation.qSampleStratified(spark, sf).collect()
    val b = Curation.qSampleStratified(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "sample must be reproducible")
    a.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      assert(rows.length == math.min(50L, strata(lang)),
        s"lang $lang sampled ${rows.length} of ${strata(lang)}")
    }
  }

  test("train-prep pipeline composes its stages consistently: only " +
    "kept+clean docs, all their chunks, feasible batches") {
    val out = Curation.pipelineTrainPrep(spark, sf).collect()
    val outDocs = out.map(_.getLong(0)).toSet
    val keepers = Curation.dedupClusters(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val clean = Curation.qDecontaminate(spark, sf).collect()
      .filterNot(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(outDocs == (keepers intersect clean),
      "pipeline docs must be exactly the kept-and-clean set")
    // all chunks of every survivor are present (none lost in packing)
    val chunkCounts = Curation.qChunkDocs(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    out.groupBy(_.getLong(0)).foreach { case (doc, rows) =>
      assert(rows.length == chunkCounts(doc), s"doc $doc lost chunks")
    }
    // batch feasibility: same streaming-fill law as qPackSequences
    out.groupBy(r => (r.getLong(3), r.getLong(4))).foreach {
      case ((shard, batch), rows) =>
        val total = rows.map(_.getInt(2).toLong).sum
        val maxChunk = rows.map(_.getInt(2).toLong).max
        assert(total < 256 + maxChunk,
          s"shard $shard batch $batch overfull: $total")
    }
  }

  test("domain mix: greedy fill meets every source's token budget " +
    "exactly at the crossing doc, or exhausts the source") {
    val rows = Curation.qDomainMix(spark, sf).collect()
    assert(rows.nonEmpty)
    val perSourceDocs = graft.io.Tables.load(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val budget = rs.head.getAs[Long]("budget")
      val weight = rs.head.getAs[Long]("weight")
      assert(weight >= 1L && weight <= 4L, s"$src weight $weight")
      val total = rs.map(_.getAs[Long]("n_tokens")).sum
      val exhausted = rs.length.toLong == perSourceDocs(src)
      // budget met (greedy crossing) unless the source ran dry
      assert(total >= budget || exhausted,
        s"$src undershot: $total < $budget with docs left")
      // minimality: dropping the LAST-TAKEN doc must undershoot —
      // i.e. the fill stopped at the first crossing, not beyond it
      val last = rs.maxBy(_.getAs[Int]("rn"))
      assert(total - last.getAs[Long]("n_tokens") < budget,
        s"$src took a doc past the crossing")
      // take order is gap-free from 1
      assert(rs.map(_.getAs[Int]("rn")).sorted.toSeq ==
        (1 to rs.length).toSeq, s"$src rn sequence has gaps")
    }
  }

  test("length buckets: boundary docs land in the inclusive bucket " +
    "and padding arithmetic is exact") {
    import spark.implicits._
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // 16 words → bucket 16 (inclusive edge); 17 → 32; 32 → 32; 33 → 64
    val out = Curation.lengthBucketStats(
      Seq(doc(16), doc(17), doc(32), doc(33)).toDF("text"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(16).getAs[Long]("n_docs") == 1L)
    assert(out(32).getAs[Long]("n_docs") == 2L) // 17 and 32 words
    assert(out(64).getAs[Long]("n_docs") == 1L)
    assert(out(32).getAs[Long]("sum_tokens") == 49L)
    assert(out(32).getAs[Long]("padded_tokens") == 64L)
    assert(out(32).getAs[Double]("pad_waste") == 0.2344) // 15/64
    assert(out(16).getAs[Double]("pad_waste") == 0.0)
  }

  test("pagerank: uniform on a cycle, hub beats leaves on a star, " +
    "mass conserved, and an independent power-iteration replay agrees") {
    import spark.implicits._
    // 3-cycle: perfectly symmetric → ranks stay exactly uniform
    val cycle = Curation.pageRank(
      Seq(("a", "b"), ("b", "c"), ("a", "c")).toDF("name_a", "name_b"),
      iters = 10, damping = 0.85).collect()
    assert(cycle.length == 3)
    cycle.foreach(r =>
      assert(r.getAs[Double]("pagerank") == 0.3333,
        s"cycle node ${r.getString(0)} not uniform"))
    // star: the hub aggregates its leaves' full rank each round
    val star = Curation.pageRank(
      Seq(("hub", "l1"), ("hub", "l2"), ("hub", "l3"), ("hub", "l4"))
        .toDF("name_a", "name_b"),
      iters = 10, damping = 0.85).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    val leafRanks = star.filterNot(_._1 == "hub").values.toSet
    assert(leafRanks.size == 1, "leaves must tie exactly")
    assert(star("hub") > leafRanks.head * 2, "hub must dominate")
    // real linkage graph: mass conservation + discrimination + replay
    val out = Curation.qPageRank(spark, sf).collect()
    assert(out.nonEmpty)
    val ranks = out.map(r => r.getString(0) -> r.getAs[Double]("pagerank"))
    assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-2,
      "rank mass must sum to ~1 (no dangling nodes on a symmetric graph)")
    assert(ranks.map(_._2).distinct.length > 1,
      "ranks must discriminate on the real graph")
    // independent scalar power iteration, same rounds and damping
    val und = Curation.qFuzzyMatch(spark, sf)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val adj = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = adj.size
    var rk = adj.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 10) {
      val contrib = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      rk.foreach { case (u, r) =>
        val out = adj(u); out.foreach(v => contrib(v) += r / out.length)
      }
      rk = adj.keys.map(u => u -> (0.15 / n + 0.85 * contrib(u))).toMap
    }
    ranks.foreach { case (name, got) =>
      assert(math.abs(got - rk(name)) < 2e-4,
        s"$name: engine $got vs replay ${rk(name)}")
    }
  }

  test("directed pagerank: star-with-dangling-leaves closed form, " +
    "mass conserved WITH sinks, early stop fires, and an independent " +
    "replay agrees on the real oriented graph") {
    import spark.implicits._
    // center a -> 3 dangling leaves. Fixpoint (d=0.85, n=4, D = 3L):
    //   A = 0.0375 + 0.85·(3L/4)          (only dangling mass reaches a)
    //   L = A + 0.85·A/3                  (leaf = a's share + a's edge)
    //   A + 3L = 1  →  A = 1/4.85 ≈ 0.2062, L ≈ 0.2646
    val star = Curation.pageRankDirected(
      Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("name_a", "name_b"),
      maxIters = 100, damping = 0.85, tol = 1e-9).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("pagerank"), r.getAs[Boolean]("is_dangling")))
      .toMap
    assert(!star("a")._2 && star("b")._2 && star("c")._2 && star("d")._2,
      "leaves are the out-degree-0 sinks, the center is not")
    assert(math.abs(star("a")._1 - 1.0 / 4.85) < 1e-3,
      s"center ${star("a")._1} off the closed form ${1.0 / 4.85}")
    Seq("b", "c", "d").foreach(l =>
      assert(math.abs(star(l)._1 - (1.0 / 4.85) * (1 + 0.85 / 3)) < 1e-3,
        s"leaf $l ${star(l)._1} off the closed form"))
    // dropping the dangling term would leak: here Σ must still be 1
    assert(math.abs(star.values.map(_._1).sum - 1.0) < 1e-2,
      "rank mass must be conserved despite every leaf being a sink")

    // real oriented linkage graph through the gated path
    val out = Curation.qPageRankDirected(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getAs[Boolean]("is_dangling")),
      "the a<b orientation must produce real sinks or the term is idle")
    val got = out.map(r => r.getString(0) -> r.getAs[Double]("pagerank"))
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-2,
      "mass conservation on the real graph (sinks redistributed)")
    // independent scalar power iteration with dangling completion and
    // the same Σ|Δ| stop — also certifies the stop fires well inside
    // the 100-round budget (~18 rounds here)
    val dirEdges = Curation.qFuzzyMatch(spark, sf)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = dirEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = dirEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nodes.length
    var rk = nodes.map(_ -> 1.0 / n).toMap
    var rounds = 0
    var moved = Double.MaxValue
    while (rounds < 100 && moved > Curation.PageRankTol) {
      val dang = nodes.filterNot(adj.contains).map(rk).sum
      val contrib = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      adj.foreach { case (u, outs) =>
        outs.foreach(v => contrib(v) += rk(u) / outs.length)
      }
      val next = nodes.map(u =>
        u -> (0.15 / n + 0.85 * (dang / n + contrib(u)))).toMap
      moved = nodes.map(u => math.abs(next(u) - rk(u))).sum
      rk = next
      rounds += 1
    }
    assert(rounds < 100,
      s"replay did not early-stop within budget (moved=$moved)")
    got.foreach { case (name, g) =>
      assert(math.abs(g - rk(name)) < 2e-4,
        s"$name: engine $g vs replay ${rk(name)}")
    }
  }

  test("pagerank size-adaptive execution: the in-driver small-graph " +
    "path and the distributed loop emit identical rows on planted " +
    "graphs (uniform and personalized restart)") {
    import spark.implicits._
    val st = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "e"))
      .toDF("name_a", "name_b")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getInt(2), r.getBoolean(3))).toMap
    val drv = m(Curation.pageRankDirected(st, 100, 0.85, 1e-9))
    val dist = m(Curation.pageRankDirected(st, 100, 0.85, 1e-9,
      driverCap = 0))
    assert(drv == dist,
      s"directed paths diverge: driver=$drv distributed=$dist")
    val seeds = Seq(("a", 1.0)).toDF("name", "restart")
    val drvP = m(Curation.pageRankWithRestart(st, Some(seeds), 100,
      0.85, 1e-9, ckptKey = "spec_path_drv"))
    val distP = m(Curation.pageRankWithRestart(st, Some(seeds), 100,
      0.85, 1e-9, ckptKey = "spec_path_dist", driverCap = 0))
    assert(drvP == distP,
      s"personalized paths diverge: driver=$drvP distributed=$distP")
    // the SYMMETRIC variant (fixed rounds, no dangling term) got the
    // same dispatch — pin its two paths identical as well
    def mU(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    val drvU = mU(Curation.pageRank(st, iters = 10, damping = 0.85))
    val distU = mU(Curation.pageRank(st, iters = 10, damping = 0.85,
      driverCap = 0))
    assert(drvU == distU,
      s"symmetric paths diverge: driver=$drvU distributed=$distU")
  }

  test("personalized pagerank: seed-star closed form, mass conserved, " +
    "seeds dominate on real data, and an independent replay agrees") {
    import spark.implicits._
    // seed {a}, star a → 3 dangling leaves. Teleport AND dangling
    // completion re-enter at a (restart = [1,0,0,0]), so:
    //   A = 0.15 + 0.85·(3L)   (leaves are all sinks)
    //   L = 0.85·A/3
    //   → A = 0.15/(1 − 0.85²) = 0.15/0.2775 ≈ 0.5405, L ≈ 0.1532
    val seeds = Seq(("a", 1.0)).toDF("name", "restart")
    val star = Curation.pageRankWithRestart(
      Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("name_a", "name_b"),
      Some(seeds), maxIters = 100, damping = 0.85, tol = 1e-9,
      ckptKey = "spec_ppr_star").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    assert(math.abs(star("a") - 0.15 / 0.2775) < 1e-3,
      s"seed ${star("a")} off the closed form ${0.15 / 0.2775}")
    Seq("b", "c", "d").foreach(l =>
      assert(math.abs(star(l) - 0.85 * (0.15 / 0.2775) / 3) < 1e-3,
        s"leaf $l ${star(l)} off the closed form"))
    assert(math.abs(star.values.sum - 1.0) < 1e-2, "star mass leaked")

    // real oriented graph through the gated path
    val out = Curation.qPageRankPersonalized(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("pagerank")).toMap
    assert(out.nonEmpty)
    assert(math.abs(out.values.sum - 1.0) < 1e-2,
      "mass conservation with seed teleport")
    val dirEdges = Curation.qFuzzyMatch(spark, sf)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = dirEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val seedSet = nodes.sorted.take(5).toSet
    // teleportation bias: the trusted set must outrank the rest on
    // average — that's the point of personalization
    val (sr, nr) = (seedSet.toSeq.map(out),
      nodes.filterNot(seedSet).map(out))
    assert(sr.sum / sr.size > nr.sum / nr.size,
      "seed ranks do not dominate non-seed ranks on average")
    // independent scalar replay: same restart vector, same stop rule
    val adj = dirEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val restart = nodes.map(u =>
      u -> (if (seedSet(u)) 1.0 / seedSet.size else 0.0)).toMap
    var rk = restart
    var rounds = 0
    var moved = Double.MaxValue
    while (rounds < 100 && moved > Curation.PageRankTol) {
      val dang = nodes.filterNot(adj.contains).map(rk).sum
      val contrib = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      adj.foreach { case (u, outs) =>
        outs.foreach(v => contrib(v) += rk(u) / outs.length)
      }
      val next = nodes.map(u =>
        u -> ((0.15 + 0.85 * dang) * restart(u) + 0.85 * contrib(u))).toMap
      moved = nodes.map(u => math.abs(next(u) - rk(u))).sum
      rk = next
      rounds += 1
    }
    out.foreach { case (name, g) =>
      assert(math.abs(g - rk(name)) < 2e-4,
        s"$name: engine $g vs replay ${rk(name)}")
    }
  }

  test("dsir weights: independent scalar replay agrees bit-for-bit, " +
    "every score clears the 4dp rounding boundary, and the target " +
    "class actually scores higher") {
    val B = 1009
    def bucket(gram: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      (java.lang.Long.parseLong(hex, 16) % B).toInt
    }
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = docs.map { case (id, lang, text) =>
      val ws = text.split(" ")
      (id, lang, ws.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).map(bucket).toSeq)
    }
    val tCnt = grams.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val rCnt = grams.flatMap(_._3)
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val nT = tCnt.values.sum; val nR = rCnt.values.sum
    val expect = grams.map { case (id, _, bs) =>
      val byB = bs.groupBy(identity).map { case (b, xs) => b -> xs.length }
      // same term construction, same ASCENDING-order left fold as the
      // query's aggregate(array_sort(collect_list(...)))
      val terms = byB.map { case (b, dcnt) =>
        dcnt * (math.log(tCnt.getOrElse(b, 0L) + 1.0) -
          math.log(rCnt(b) + 1.0))
      }.toSeq.sorted
      val raw = terms.foldLeft(0.0)(_ + _) +
        bs.length * (math.log(nR.toDouble + B) - math.log(nT.toDouble + B))
      id -> raw
    }.toMap
    val out = Curation.qDsirWeights(spark, sf).collect()
    assert(out.length == docs.length)
    var enSum = 0.0; var enN = 0; var otherSum = 0.0; var otherN = 0
    val langOf = docs.map(d => d._1 -> d._2).toMap
    out.foreach { r =>
      val id = r.getLong(0)
      val raw = expect(id)
      val rounded = math.floor(raw * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("dsir_logw") == rounded,
        s"doc $id: engine ${r.getAs[Double]("dsir_logw")} vs replay $rounded")
      // distance of the RAW score to the nearest half-boundary — the
      // slack that absorbs cross-engine ulp differences in ln()
      val scaled = raw * 10000 + 0.5
      val margin = math.abs(scaled - math.rint(scaled))
      assert(margin >= 1e-6, s"doc $id sits $margin from a 4dp boundary")
      if (langOf(id) == "en") { enSum += raw; enN += 1 }
      else { otherSum += raw; otherN += 1 }
    }
    // the weight must DISCRIMINATE: target-language docs resemble the
    // target histogram more than the rest of the pool does
    assert(enSum / enN > otherSum / otherN + 0.5,
      "en docs do not outscore the non-target pool")
  }

  test("pii redaction scrubs every planted pattern") {
    val out = Curation.qPiiRedact(spark, sf).collect()
    out.foreach { r =>
      assert(r.getInt(1) == 1, s"doc ${r.getLong(0)} email count")
      assert(r.getInt(2) == (r.getLong(0) % 3).toInt,
        s"doc ${r.getLong(0)} phone count")
    }
  }
}
