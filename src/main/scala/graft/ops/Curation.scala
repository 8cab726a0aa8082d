package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Training-data curation operators — the steps between "a corpus of
  * documents" and "training batches": near-dup CLUSTERS (pairs alone
  * don't dedup anything), benchmark decontamination, context-window
  * chunking, sequence packing, stratified sampling, PII redaction.
  * The reference has no comparable surface (its only dedup is pandas
  * `drop_duplicates`, songs-etl `cf_transform/main.py:153`); this is
  * the LLM-pipeline north star the engine adds on top.
  *
  * Scale design notes per operator are on each def; the common theme:
  * per-doc work is narrow (zero shuffles), cross-doc work shuffles on
  * small keys (shingle, label, stratum), and the one iterative
  * algorithm (connected components) is bounded by the component
  * DIAMETER, which for near-dup graphs is small — near-dup clusters
  * are quasi-cliques (everything overlaps the template), not paths.
  */
object Curation {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def words(c: Column): Column = split(c, " ")

  // ---------- Connected components → dedup clusters ----------

  /** Minimum-label propagation over an undirected edge list — Pregel
    * shape on DataFrames: each vertex starts labeled with its own id;
    * every round each vertex takes the min of its label and its
    * neighbors' labels; stop when a round changes nothing. Converges
    * in ≤ diameter rounds, each round one shuffle on the vertex id.
    *
    * The per-round `count()` is ITERATION CONTROL (the convergence
    * test), not data movement — the same driver-side role as a Pregel
    * superstep barrier. `localCheckpoint` truncates the lineage every
    * round; without it the plan doubles per iteration and analysis
    * time, not execution, becomes the bottleneck.
    *
    * For 100 TB corpora with adversarial (high-diameter) graphs the
    * upgrade is [[connectedComponentsAlternating]] (large-star/
    * small-star, O(log n) rounds on any graph — implemented below and
    * equivalence-spec'd); near-dup graphs don't need it — dup clusters
    * are quasi-cliques with diameter ~2 — so the simpler algorithm
    * with a loud non-convergence failure is the honest default for
    * the gated query.
    *
    * @param vertices one column `id`
    * @param edges    columns `src`, `dst`, either orientation
    * @return (id, label) — label = min id of the component
    */
  private[ops] def connectedComponents(vertices: DataFrame,
                                       edges: DataFrame,
                                       maxIter: Int = 25,
                                       driverCap: Int = DriverGraphEdgeCap)
      : DataFrame = {
    // materialize the symmetric edge list ONCE: every round's join
    // would otherwise re-run the whole upstream pair computation (the
    // shingle self-join costs more than all CC rounds together —
    // measured 4.5 s vs 1.7 s at sf0.1). At cluster scale this is the
    // persist() every iterative graph job starts with.
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // SIZE-ADAPTIVE execution (the PageRank/BPE driver-cap dispatch):
    // component labels are CANONICAL — min id of the component — so
    // ANY correct algorithm emits bit-identical labels, and below the
    // cap a driver union-find over the collected edge list replaces
    // rounds × (join + aggregate + checkpoint + count) of scheduling
    // latency with one bounded pull (the upstream pair computation is
    // already materialized in the checkpoint either way). Long-id
    // graphs only (every caller today); anything else, or anything
    // past the cap, runs the distributed loop below unchanged.
    // Matching the distributed semantics exactly: labels exist only
    // for VERTICES, and an edge touching a non-vertex id propagates
    // nothing (the distributed join drops it) — so such edges are
    // skipped, not unioned through.
    var checkpointed = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint()
    val longIds = vertices.schema("id").dataType ==
      org.apache.spark.sql.types.LongType
    if (longIds && checkpointed.count() + sym.count() <= 2L * driverCap) {
      // both pulls read the checkpoints just materialized — the
      // upstream pair/vertex computation is paid exactly once on
      // either path
      val vs = checkpointed.select(col("id")).collect().map(_.getLong(0))
      val vset = vs.toSet
      val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
        r
      }
      sym.select(col("src"), col("dst")).collect().foreach { r =>
        val (u, v) = (r.getLong(0), r.getLong(1))
        if (vset.contains(u) && vset.contains(v)) {
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
        }
      }
      Ckpt.release(sym)
      Ckpt.release(checkpointed)
      import vertices.sparkSession.implicits._
      return vs.toSeq.map(v => (v, find(v))).toDF("id", "label")
    }
    var labels = checkpointed
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"),
          (col("nbr_min").isNotNull && col("nbr_min") < col("label"))
            .as("chg"))
        .localCheckpoint()
      changed = next.where(col("chg")).count()
      // the new checkpoint is materialized — the previous round's copy
      // is dead; without this, maxIter full labelings pile up in the
      // block manager for the duration of the job
      Ckpt.release(checkpointed)
      checkpointed = next
      labels = next.drop("chg")
      i += 1
    }
    Ckpt.release(sym)
    // a silent partial labeling would look like a correct answer with
    // too many clusters — refuse instead
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds")
    // the RETURNED labels reference the final round's checkpoint,
    // which this function cannot release (the caller hasn't consumed
    // the result yet) — slot-track it so the NEXT CC invocation frees
    // it deterministically instead of leaving the release to the
    // ContextCleaner's GC schedule (the block-manager-pressure
    // pattern on every CC caller: one labeling leaked per query)
    Ckpt.track("cc_result", checkpointed)
    labels
  }

  /** Connected components by alternating large-star/small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the adversarial-diameter upgrade to
    * [[connectedComponents]]: converges in O(log n) ROUNDS on ANY
    * graph (a path of length n takes ~log n rounds here vs n rounds of
    * min-label propagation), at the price of two grouped passes per
    * round. Each round is two shuffles on the edge endpoint; edges are
    * checkpointed per round like the simple algorithm's labels.
    *
    *   - large-star: per node u, hang every LARGER neighbor off
    *     m = min(Γ(u) ∪ u);
    *   - small-star: orient edges (big → small), then per node u hang
    *     u and all its (smaller) neighbors off m = min(Γ(u) ∪ u).
    *
    * At fixpoint the edge set is a star forest (child → component
    * min). Returns ((id, label), rounds) — rounds exposed so the spec
    * can pin the O(log n) claim. */
  private[ops] def connectedComponentsAlternating(
      vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 25): (DataFrame, Int) = {

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(
        e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      sym.join(mins, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = oriented.groupBy("u").agg(min(col("v")).as("m"))
      oriented.join(mins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(mins.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    var e = edges.select(col("src").as("u"), col("dst").as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      converged = next.count() == e.count() &&
        next.exceptAll(e).isEmpty
      Ckpt.release(e)
      e = next
      rounds += 1
    }
    require(converged,
      s"alternating CC did not converge in $maxIter rounds")
    // star forest: every child points at its component min; roots and
    // isolated vertices label themselves. Aggregated per id so a
    // residual multi-edge could never duplicate a vertex row.
    val labels = vertices.select(col("id"))
      .join(e.select(col("u").as("id"), col("v").as("root")),
        Seq("id"), "left")
      .groupBy(col("id"))
      .agg(min(coalesce(col("root"), col("id"))).as("label"))
    // returned labels reference the star-forest checkpoint — same
    // deterministic-release contract as [[connectedComponents]]
    Ckpt.track("cc_alt_result", e)
    (labels, rounds)
  }

  /** Near-dup pairs → dedup verdicts: cluster the exact-Jaccard pair
    * graph (threshold 0.2, the [[TextOps.dedupNgramJaccard]] ground
    * truth) with connected components, canonical doc = min doc_id of
    * the cluster, keep = is-canonical. This is the step that turns the
    * pair-emitting dedup family into an actual deduplicated corpus;
    * every doc appears exactly once in the output (isolated docs are
    * their own cluster of 1). Oracle: DuckDB recursive CTE reachability
    * over the same symmetric edges.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // one materialized shingle pass — jaccardJoin consumes it thrice
    val sh = TextOps.shingles(docs).localCheckpoint()
    Ckpt.track("dedup_clusters", sh)
    val edges = TextOps.jaccardJoin(sh, 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = connectedComponents(docs.select(col("doc_id").as("id")), edges)
    cc.select(col("id").as("doc_id"), col("label").as("cluster_id"),
        (col("id") === col("label")).as("keep"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .orderBy("doc_id")
  }

  val dedupClustersOracle: String =
    "WITH RECURSIVE " + TextOps.shinglePairsCte + ",\n" +
      """edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
        |        >= 0.2),
        |sym AS (SELECT src, dst FROM edges
        |        UNION SELECT dst, src FROM edges),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS lab FROM documents
        |  UNION
        |  SELECT s.dst AS node, r.lab FROM reach r
        |  JOIN sym s ON s.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
        |       FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep,
        |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM cc ORDER BY doc_id""".stripMargin

  /** [[dedupClusters]] with the production keep rule: the canonical
    * doc of each near-dup cluster is its BEST-QUALITY member
    * ([[TextOps.qualityScore]] argmax, doc_id ascending on ties), not
    * its minimum id — what a curation pipeline actually keeps when a
    * boilerplate page and its clean twin land in one cluster. The
    * argmax is one `min_by` hash aggregate over the scored cluster
    * rows (no per-cluster sort or window rank); the canonical table
    * joins back on cluster_id, the partitioning the cluster_size
    * window already needs, so the tail of the plan reuses one
    * exchange. Edges come from the DF-CAPPED shingle substrate
    * ([[TextOps.prunedShingles]] at the shared cap — the linear
    * production formulation, see dedupJaccardCapped): a corpus-wide
    * stop shingle must not quadratically inflate the pair graph the
    * clustering consumes. On the driver testdata the cap is idle
    * (max shingle df 25 ≤ 100 at every SF, re-measured after the
    * round-7 regeneration) so capped == uncapped there — the spec's
    * clustering-agreement assert against [[dedupClusters]] leans on
    * that measurement. Deterministic end to end → hash-gated: the
    * DuckDB oracle replays the SAME capped chain (shared
    * cappedShinglePairsCte) → recursive-CTE reachability → the same
    * score formula → rank-1 per cluster. */
  private[ops] def clusterCanonicalFrom(docs: DataFrame,
                                        ckptKey: String): DataFrame = {
    val sh = TextOps.shingles(docs).localCheckpoint()
    Ckpt.track(ckptKey, sh)
    val edges = TextOps.jaccardJoin(
        TextOps.prunedShingles(sh, TextOps.ShingleDfCap), 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = connectedComponents(docs.select(col("doc_id").as("id")), edges)
    val scored = cc
      .select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .join(TextOps.qualityScore(docs), "doc_id")
    val canon = scored.groupBy(col("cluster_id"))
      .agg(min_by(col("doc_id"),
        struct((-col("score")).as("d"), col("doc_id"))).as("canonical_id"))
    scored.join(canon, "cluster_id")
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("score"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("keep"))
      .orderBy("doc_id")
  }

  def qClusterCanonical(s: SparkSession, dir: String): DataFrame =
    clusterCanonicalFrom(t(s, dir, "documents"), "q_cluster_canonical")

  val qClusterCanonicalOracle: String =
    "WITH RECURSIVE " + TextOps.cappedShinglePairsCte + ",\n" +
      """edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
        |        >= 0.2),
        |sym AS (SELECT src, dst FROM edges
        |        UNION SELECT dst, src FROM edges),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS lab FROM documents
        |  UNION
        |  SELECT s.dst AS node, r.lab FROM reach r
        |  JOIN sym s ON s.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
        |       FROM reach GROUP BY node),
        |quality AS (SELECT doc_id,
        |  floor((
        |    floor(len(list_distinct(string_split(text, ' ')))
        |      / CAST(len(string_split(text, ' ')) AS DOUBLE)
        |      * 10000 + 0.5) / 10000
        |    - floor(length(regexp_replace(text, '[a-z\s]', '', 'g'))
        |      / CAST(length(text) AS DOUBLE) * 10000 + 0.5) / 10000
        |  ) * 10000 + 0.5) / 10000 AS score FROM documents),
        |scored AS (SELECT c.doc_id, c.cluster_id, q.score
        |           FROM cc c JOIN quality q ON q.doc_id = c.doc_id),
        |canon AS (SELECT cluster_id, doc_id AS canonical_id FROM (
        |  SELECT cluster_id, doc_id,
        |    row_number() OVER (PARTITION BY cluster_id
        |                       ORDER BY score DESC, doc_id) AS rn
        |  FROM scored) WHERE rn = 1)
        |SELECT s.doc_id, s.cluster_id,
        |  count(*) OVER (PARTITION BY s.cluster_id) AS cluster_size,
        |  s.score, c.canonical_id, s.doc_id = c.canonical_id AS keep
        |FROM scored s JOIN canon c ON c.cluster_id = s.cluster_id
        |ORDER BY s.doc_id""".stripMargin

  // ---------- Incremental cluster maintenance ----------

  private val clusterIdxMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val clusterIdxDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      clusterIdxDirs.forEach(d => // best-effort recursive delete
        org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(d)))
    }, "graft-cluster-index-cleanup"))
  }

  /** Bucket-count floor for the label archive — parallelism-sized at
    * the gated SFs; [[graft.io.Tables.bucketsFor]]'s law takes over
    * once the label table outgrows floor × targetBytes. */
  private val LabelBucketsFloor = 16

  /** (doc_id, label, ingest_epoch) is three longs + parquet overhead. */
  private val LabelRowBytes = 32.0

  /** Build the archive from scratch: the corpus' shingle POSTINGS +
    * per-doc sizes ([[TextOps.buildShinglePostingsTo]] — the persisted
    * substrate every later daily run probes instead of re-shingling
    * corpus text), and cluster LABELS from CC over the corpus-only
    * exact-Jaccard pair graph (the [[dedupClusters]] substrate). The
    * POSTINGS are a shingle-bucketed epoch-partitioned archive (the
    * probe-side layout; see [[graft.ops.TextOps.buildShinglePostingsTo]]);
    * the LABELS are a doc_id-BUCKETED epoch-partitioned archive —
    * label epochs are UPDATES resolved by a latest-per-doc aggregate
    * on EVERY read ([[readClusterLabels]]), and bucketing by doc_id
    * lets that aggregate reuse the scan's partitioning with no
    * archive-wide exchange (plan-pinned in ClusterIndexSpec); at
    * 100 TB the daily read was otherwise the one remaining
    * archive-proportional shuffle between folds. Sizes stay
    * manifested epoch-partitioned (tiny). Every epoch commit is
    * replace-or-add, so maintenance is replay-idempotent on all
    * three. One corpus shingle pass feeds everything. */
  private[graft] def buildClusterArchiveTo(corpus: DataFrame,
                                         idx: String): Unit = {
    val sh = TextOps.shingles(corpus).localCheckpoint()
    TextOps.buildShinglePostingsTo(sh, idx)
    val edges = TextOps.jaccardJoin(sh, 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels =
      connectedComponents(corpus.select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("label"))
        .withColumn("ingest_epoch", lit(0L))
        .localCheckpoint() // consumed twice: sizing pass + write
    val n = labels.count()
    val buckets = Tables.bucketsFor(n, LabelRowBytes, LabelBucketsFloor)
    Tables.writeBucketedArchive(labels, s"$idx/labels", "doc_id", buckets,
      sizingNote = s"sized rows=$n avgRowBytes=$LabelRowBytes " +
        s"floor=$LabelBucketsFloor -> buckets=$buckets")
    Ckpt.release(labels)
    Ckpt.release(sh)
  }

  private[ops] def clusterIndex(s: SparkSession, dir: String): String =
    clusterIdxMemo.computeIfAbsent(dir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft-cluster-index").toString
      clusterIdxDirs.add(idx)
      buildClusterArchiveTo(
        t(s, dir, "documents").where(col("doc_id") % 10 =!= 0), idx)
      idx
    })

  /** Incremental cluster maintenance — [[dedupClusters]] run the way
    * a daily 100 TB pipeline runs it: the corpus' cluster labels AND
    * its shingle postings live in a PERSISTED manifested archive
    * (built once; [[buildClusterArchiveTo]]), today's batch
    * (doc_id % 10 = 0) shingles ONLY its own text, probes the
    * postings index with one broadcast-batch join (corpus text is
    * never re-shingled), and connected components re-runs ONLY over
    * the AFFECTED subgraph: batch docs plus the archived components a
    * new edge touches, each contracted to its label star. Untouched
    * archive rows keep their labels verbatim; merged labels and the
    * batch's postings are committed back under a new ingest epoch
    * (replace-or-add — replaying the batch recomputes identical
    * rows), keeping the archive current for tomorrow.
    *
    * CORRECTNESS IS PATH-INDEPENDENT: a component's label is its
    * minimum member id, and an archive star edge (member → label)
    * preserves connectivity exactly, so merging via the contracted
    * subgraph yields the same labels as a full-graph recompute — a
    * batch doc bridging two archive clusters collapses both to the
    * global min, including when the batch doc IS the new min. That
    * identity is what lets the query stay HASH-gated against a
    * DuckDB oracle that recomputes CC over the FULL pair graph from
    * text; ClusterIndexSpec additionally pins merged ≡ full-rebuild
    * row-for-row against [[dedupClusters]] and ingest replay
    * idempotence. Daily COMPUTE scales with the batch and the
    * affected components: corpus text is never re-shingled and the
    * corpus-internal pair join is paid once at archive build. The one
    * archive-proportional term left is the probe's streaming read of
    * the postings index — an index scan, not a recompute, and the
    * postings ARE shingle-bucketed on disk
    * ([[graft.ops.TextOps.buildShinglePostingsTo]]), so the scan
    * arrives pre-partitioned on the join key and the probe's only
    * exchange is the batch side. */
  def qClusterIncremental(s: SparkSession, dir: String): DataFrame =
    clusterIncrementalFrom(t(s, dir, "documents"), clusterIndex(s, dir))

  /** The batch-merge computation behind [[qClusterIncremental]],
    * factored over (docs, archive path) so ClusterIndexSpec drives
    * planted corpora through exactly the gated code path. */
  private[graft] def clusterIncrementalFrom(docs: DataFrame,
      idx: String,
      isBatch: Column => Column = _ % 10 === 0,
      epoch: Long = 1L,
      writerId: Option[String] = None): DataFrame = {
    val s = docs.sparkSession
    // BATCH-ONLY shingle substrate: the corpus side comes from the
    // persisted postings index committed at archive build (and kept
    // current by each day's ingest below) — corpus text is never
    // re-shingled on the daily path
    val bsh = TextOps.shingles(docs.where(isBatch(col("doc_id"))))
      .localCheckpoint()
    Ckpt.track("q_cluster_incremental", bsh)
    // maintenance first (the winnow-index discipline): the batch's
    // postings + sizes commit under their epoch; every read below
    // self-excludes that epoch, so a crash-replay never probes its
    // own previous partial commit
    TextOps.ingestShinglePostings(bsh, idx, epoch, writerId)
    val arch = TextOps.readShinglePostings(s, idx, excludeEpoch = epoch)
    val bAsB = bsh.select(col("doc_id").as("b_id"), col("shingle"))
    // batch-vs-archive candidates: the postings archive is
    // SHINGLE-BUCKETED, so the non-broadcast plan shuffles only the
    // BATCH side (one exchange to the bucket count; the archive scan
    // arrives pre-partitioned — ShinglePostingsSpec pins the plan).
    // No broadcast hint: AQE still converts to a broadcast join at
    // runtime when the batch is small enough, and the bucketed
    // fallback is what survives a batch that outgrows broadcast at
    // 100 TB. Batch-batch candidates are a batch-sized self-join.
    val common = bAsB
      .join(arch.select(col("doc_id").as("o_id"), col("shingle")),
        "shingle")
      .where(col("o_id") =!= col("b_id"))
      .unionByName(bAsB
        .join(bsh.select(col("doc_id").as("o_id"), col("shingle")),
          "shingle")
        .where(col("b_id") < col("o_id")))
      .select(least(col("b_id"), col("o_id")).as("doc_a"),
        greatest(col("b_id"), col("o_id")).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    // Jaccard denominators: batch sizes from the batch substrate,
    // archive sizes from the persisted size table; max() collapses the
    // (replay-only) case of a doc present in both
    val sizes = bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      .unionByName(TextOps.readShingleSizes(s, idx, excludeEpoch = epoch))
      .groupBy(col("doc_id")).agg(max(col("n_sh")).as("n_sh"))
    val ratio = col("n_common") /
      (col("n_a") + col("n_b") - col("n_common")).cast("double")
    val newEdges = common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        "doc_b")
      .where(ratio >= 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .localCheckpoint() // consumed thrice: touched, vertices, CC
    Ckpt.track("q_cluster_incremental_edges", newEdges)
    // archive view: LATEST epoch per doc, excluding the current
    // epoch (a crash-replay must not read its own previous partial
    // commit) — so yesterday's merge commits are consumed today, and
    // a fold ([[compactLabelEpochs]]) changes nothing a reader sees
    val archive = Tables.readBucketedArchiveMasked(s, s"$idx/labels",
        s"$idx/tombstones", "doc_id")
      .where(col("ingest_epoch") =!= epoch)
      .groupBy(col("doc_id"))
      .agg(max_by(col("label"), col("ingest_epoch")).as("label"))
    // affected components: any archived label a new edge's corpus
    // endpoint carries; everything else is untouched by construction.
    // Corpus endpoints are classified by batch MEMBERSHIP (anti-join
    // against the batch's shingled ids), not by the isBatch
    // predicate — the predicate can be vacuously true (streaming
    // maintenance treats EVERY arriving doc as batch), and every
    // edge endpoint is shingled by construction, so membership and
    // predicate agree exactly on the daily path
    val batchIds = bsh.select(col("doc_id")).distinct()
    val corpusTouched = newEdges.select(col("src").as("doc_id"))
      .unionByName(newEdges.select(col("dst").as("doc_id")))
      .join(batchIds, Seq("doc_id"), "left_anti").distinct()
    val affectedLabels = archive.join(corpusTouched, "doc_id")
      .select(col("label")).distinct()
    val affected = archive.join(affectedLabels, "label")
    val starEdges = affected.where(col("doc_id") =!= col("label"))
      .select(col("doc_id").as("src"), col("label").as("dst"))
    val vertices = docs.where(isBatch(col("doc_id")))
      .select(col("doc_id").as("id"))
      .unionByName(affected.select(col("doc_id").as("id")))
    val relabeled =
      connectedComponents(vertices, newEdges.unionByName(starEdges))
        .select(col("id").as("doc_id"), col("label"))
    val merged = relabeled.unionByName(
      archive.join(affectedLabels, Seq("label"), "left_anti")
        .select(col("doc_id"), col("label")))
    // maintenance step: tomorrow's archive is current (the epoch
    // layer holds every re-labeled row; replay recomputes identical
    // rows and replace-or-adds the same partition)
    Tables.ingestBucketedArchive(
      relabeled.withColumn("ingest_epoch", lit(epoch)),
      s"$idx/labels", epoch, writerId)
    merged
      .select(col("doc_id"), col("label").as("cluster_id"),
        isBatch(col("doc_id")).as("is_batch"),
        (col("doc_id") === col("label")).as("keep"))
      .orderBy("doc_id")
  }

  /** Fold accumulated label-merge epochs into the base layer — the
    * [[graft.ops.Similarity.compactIndexEpochs]] lifecycle applied to
    * the cluster archive. Unlike the append-only fingerprint/code
    * tables, label epochs are UPDATES (a doc's newest epoch wins), so
    * the fold materializes the latest-per-doc view and commits it as
    * the sole `ingest_epoch=0` partition in one pointer flip; every
    * prior layer drops from the manifest (old versions stay on disk
    * until vacuum — readers of the previous pointer stay isolated).
    * [[clusterIncrementalFrom]]'s archive read is the same
    * latest-per-doc aggregate, so a fold is invisible to the next
    * day's merge by construction — ClusterIndexSpec pins exactly
    * that, plus a post-fold second-day merge. Returns the folded
    * high-water epoch, or -1 when only the base layer exists. */
  private[ops] def compactLabelEpochs(s: SparkSession,
                                      idx: String): Long = {
    val path = s"$idx/labels"
    val arch = Tables.readBucketedArchive(s, path)
    // nullable read: an archive emptied by a full-corpus RTBF + fold
    // has max() = NULL, and the next window's fold must no-op, not NPE
    val maxE = Tables.maxIngestEpoch(arch)
    if (maxE <= 0L) return -1L
    // label epochs are UPDATES: the fold materializes latest-per-doc
    // (exchange-free off the doc_id-bucketed scan) as the sole base
    // layer, through the staged swap that preserves the bucket layout
    val current = arch
      .groupBy(col("doc_id"))
      .agg(max_by(col("label"), col("ingest_epoch")).as("label"))
      .withColumn("ingest_epoch", lit(0L))
    Tables.replaceBucketedArchive(current, path)
    maxE
  }

  val qClusterIncrementalOracle: String =
    "WITH RECURSIVE " + TextOps.shinglePairsCte + ",\n" +
      """edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  JOIN sizes sa ON sa.doc_id = doc_a
        |  JOIN sizes sb ON sb.doc_id = doc_b
        |  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
        |        >= 0.2),
        |sym AS (SELECT src, dst FROM edges
        |        UNION SELECT dst, src FROM edges),
        |reach AS (
        |  SELECT doc_id AS node, doc_id AS lab FROM documents
        |  UNION
        |  SELECT s.dst AS node, r.lab FROM reach r
        |  JOIN sym s ON s.src = r.node),
        |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
        |       FROM reach GROUP BY node)
        |SELECT doc_id, cluster_id, doc_id % 10 = 0 AS is_batch,
        |       doc_id = cluster_id AS keep
        |FROM cc ORDER BY doc_id""".stripMargin

  // ---------- Tombstone deletion over the cluster archive ----------

  private val clusterDelIdxMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Private full-corpus archive for the GATED delete query — its
    * tombstone + relabel commits must not leak into the shared
    * incremental archive ([[clusterIndex]]) that
    * [[qClusterIncremental]]/[[dedupIncremental]] read, or query
    * results would depend on execution order. */
  private def clusterDelIndex(s: SparkSession, dir: String): String =
    clusterDelIdxMemo.computeIfAbsent(dir, _ => {
      val idx = java.nio.file.Files
        .createTempDirectory("graft-cluster-del-index").toString
      clusterIdxDirs.add(idx)
      buildClusterArchiveTo(t(s, dir, "documents"), idx)
      idx
    })

  /** Right-to-be-forgotten over the CLUSTER archive — the hardest of
    * the three tombstone lifecycles because deletion can SPLIT a
    * component (the deleted doc may be the only bridge): a DELETE
    * epoch tombstones every doc with `doc_id % 13 = 0`, and the
    * archive's labels are repaired through the same affected-subgraph
    * machinery the incremental merge uses, inverted:
    *
    *   1. tombstones commit ([[graft.io.Tables.ingestTombstones]],
    *      replace-or-add — a crash-replay recommits identical keys);
    *   2. AFFECTED components = archived labels any deleted doc
    *      carries; everything else keeps its labels verbatim (an
    *      untouched component contains no deleted doc by definition);
    *   3. the affected components' REMAINING members re-derive their
    *      internal edge set from the persisted shingle POSTINGS index
    *      (never from text — the index scan is restricted to member
    *      docs, so cost scales with the affected components, not the
    *      archive), and connected components re-runs over exactly
    *      that subgraph: a severed bridge splits the cluster, and a
    *      surviving component whose deleted doc WAS the label carrier
    *      (the min id) gets its new min-member label;
    *   4. repaired labels commit under the delete epoch
    *      (replace-or-add); the deleted docs' stale base-layer rows
    *      stay physically present but tombstone-MASKED at every read
    *      ([[readClusterLabels]]) until [[compactClusterArchive]]
    *      folds the anti-join into the base layer and retires the
    *      tombstones.
    *
    * CORRECTNESS IS PATH-INDEPENDENT, same argument as the merge
    * direction: labels are min member ids, untouched components are
    * exactly those with no deleted member, and the affected members'
    * postings-derived subgraph IS the full pair graph restricted to
    * them — so repair ≡ full-graph recompute over the remaining
    * corpus. That identity keeps the query HASH-gated against a
    * DuckDB oracle that recomputes CC from text over `documents`
    * minus the deleted set. TombstoneSpec pins the bridge-split case,
    * post-fold physical absence, and replay idempotence. */
  def qClusterDelete(s: SparkSession, dir: String): DataFrame =
    clusterDeleteFrom(t(s, dir, "documents"), clusterDelIndex(s, dir))

  /** The delete-repair computation behind [[qClusterDelete]],
    * factored over (docs, archive path) so TombstoneSpec drives
    * planted corpora through exactly the gated code path. */
  private[ops] def clusterDeleteFrom(docs: DataFrame,
      idx: String,
      isDeleted: Column => Column = _ % 13 === 0,
      epoch: Long = 1L): DataFrame =
    clusterDeleteIds(docs.sparkSession,
      docs.where(isDeleted(col("doc_id"))).select(col("doc_id")),
      idx, epoch)

  /** The same delete-repair over a bare key frame — the maintenance
    * step that follows the streaming topology-wide delete leg
    * ([[graft.streaming.StreamOps.runFrontDoorDeletes]] masks
    * instantly; THIS, run in the archive's maintenance window, does
    * the component SPLIT repair, because repair label commits must be
    * ordered against the ingest leg's and two uncoordinated stream
    * writers cannot totally order their epochs): tombstone the keys,
    * then re-derive and re-commit labels for exactly the affected
    * components. */
  private[graft] def clusterDeleteIds(s: SparkSession, delIds: DataFrame,
      idx: String, epoch: Long): DataFrame = {
    Tables.ingestTombstones(delIds, s"$idx/tombstones", epoch)
    // label archive view: latest epoch per doc, self-excluding this
    // delete epoch (a crash-replay must not read its own previous
    // partial relabel commit); consumed four ways below — checkpoint
    val archive = Tables.readBucketedArchive(s, s"$idx/labels")
      .where(col("ingest_epoch") =!= epoch)
      .groupBy(col("doc_id"))
      .agg(max_by(col("label"), col("ingest_epoch")).as("label"))
      .localCheckpoint()
    Ckpt.track("q_cluster_delete_archive", archive)
    // affected-component discovery reads the RAW archive (a deleted
    // doc's stale label row is exactly what names its component);
    // every OTHER consumer reads the tombstone-MASKED view, which
    // also erases docs deleted in EARLIER epochs whose base rows
    // linger until the fold
    val affectedLabels = archive
      .join(delIds, Seq("doc_id"), "left_semi")
      .select(col("label")).distinct()
    val masked = Tables.minusTombstones(archive,
      s"$idx/tombstones", "doc_id")
    val members = masked.join(affectedLabels, Seq("label"), "left_semi")
    // the members' internal pair graph, re-derived from the PERSISTED
    // postings index (restricted to members — never a corpus scan of
    // text); sizes come from the persisted size table the same way
    val mPost = TextOps.readShinglePostings(s, idx, excludeEpoch = epoch)
      .join(members.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint() // self-joined below
    Ckpt.track("q_cluster_delete_postings", mPost)
    val common = mPost.alias("a")
      .join(mPost.alias("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = TextOps.readShingleSizes(s, idx, excludeEpoch = epoch)
    val ratio = col("n_common") /
      (col("n_a") + col("n_b") - col("n_common")).cast("double")
    val edges = common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        "doc_b")
      .where(ratio >= 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val relabeled =
      connectedComponents(members.select(col("doc_id").as("id")), edges)
        .select(col("id").as("doc_id"), col("label"))
    val merged = relabeled.unionByName(
      masked.join(affectedLabels, Seq("label"), "left_anti")
        .select(col("doc_id"), col("label")))
    // repair commit: the epoch layer holds every re-labeled survivor;
    // a replay recomputes identical rows and replace-or-adds the same
    // partition
    Tables.ingestBucketedArchive(
      relabeled.withColumn("ingest_epoch", lit(epoch)),
      s"$idx/labels", epoch)
    // deletion-vector build at DELETE time, after the repair commit
    // (the digest must stamp the post-commit file set) — for the
    // LABELS archive only: readClusterLabels is the steady-state hot
    // consumer between deletes and folds, so its mask must stay
    // positional instead of growing a key anti-join build side with
    // the RTBF volume. The postings/sizes masked reads run almost
    // exclusively INSIDE delete/incremental flows, where new
    // tombstones have just landed and a sidecar would be stale (and
    // key-masked) anyway — building theirs here measured 2-5× on the
    // delete gate for masks that were never consumed covered
    Tables.computeBucketedDeletionVectors(s, s"$idx/labels",
      s"$idx/tombstones", "doc_id")
    merged
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("keep"))
      .orderBy("doc_id")
  }

  /** The label archive's tombstone-masked read view: latest epoch per
    * doc, minus deleted docs — what every downstream consumer of the
    * cluster labels reads between a delete and the fold that makes it
    * physical. */
  private[graft] def readClusterLabels(s: SparkSession,
                                     idx: String): DataFrame =
    // mask BEFORE the latest-per-doc aggregate (row-identical: a
    // deleted doc loses every label row, so it loses its group) —
    // this is what lets the positional DV sidecar serve the read;
    // with no current sidecar the verb degrades to the same
    // broadcast key anti-join as before. Both mask shapes preserve
    // the bucketed scan's partitioning, so the aggregate stays
    // Exchange-free either way (plan-pinned in CurationSpec).
    Tables.readBucketedArchiveMasked(s, s"$idx/labels",
        s"$idx/tombstones", "doc_id")
      .groupBy(col("doc_id"))
      .agg(max_by(col("label"), col("ingest_epoch")).as("label"))

  /** Full lifecycle fold for the cluster archive: labels fold to
    * their latest-per-doc view MINUS tombstones as the sole base
    * layer ([[compactLabelEpochs]]' fold with the delete applied
    * physically); postings and sizes fold their epoch layers the
    * same way ([[graft.ops.Similarity.compactIndexEpochs]]' carry
    * rule — the newest epoch keeps its own value because a
    * foreachBatch crash-replay can still rewrite exactly that
    * epoch); then the tombstones retire, except keys living in a
    * still-replayable newest epoch (a replay recomputes those rows
    * from text and would silently resurrect a folded delete — their
    * tombstones stay masked until the next fold). One maintenance
    * entry point = one consistent cut across all three tables;
    * TombstoneSpec pins post-fold physical absence and that the fold
    * changes nothing any read view returns. */
  private[graft] def compactClusterArchive(s: SparkSession,
                                         idx: String): Unit = {
    val tombPath = s"$idx/tombstones"
    val labels = s"$idx/labels"
    // labels: latest-per-doc minus tombstones becomes the base layer
    // (aggregate exchange-free off the doc_id-bucketed scan; the
    // staged-swap rewrite preserves the bucket layout)
    val current = Tables.minusTombstones(
        Tables.readBucketedArchive(s, labels)
          .groupBy(col("doc_id"))
          .agg(max_by(col("label"), col("ingest_epoch")).as("label")),
        tombPath, "doc_id")
      .withColumn("ingest_epoch", lit(0L))
    Tables.replaceBucketedArchive(current, labels)
    // postings + sizes: fold epochs below high-water into the base,
    // carry the newest, subtract tombstones physically. The bucketed
    // postings fold through the staged-swap rewrite (which preserves
    // the bucket layout); the manifested sizes fold behind the
    // pointer as before.
    def foldEpochs(path: String, read: => DataFrame,
                   rewrite: DataFrame => Unit): Long = {
      val arch = read
      val maxE = arch.agg(max(col("ingest_epoch")).cast("long"))
        .head().getLong(0)
      val masked = Tables.minusTombstones(arch, tombPath, "doc_id")
      rewrite(masked.withColumn("ingest_epoch",
        when(col("ingest_epoch") < maxE, lit(0L))
          .otherwise(col("ingest_epoch"))))
      maxE
    }
    // PRE-fold snapshot of the newest postings epoch's doc set — the
    // carry decision's input. Reading it AFTER replaceBucketedArchive
    // would see the tombstoned keys already masked OUT of the carried
    // epoch, so td ∩ replayable would always be empty, every
    // tombstone would retire, and a foreachBatch crash-replay of that
    // epoch (which recomputes its rows from source) would silently
    // resurrect the folded deletes — exactly what the carry rule
    // exists to prevent. Same discipline as foldManifestedEpochs'
    // `all` pin and compactTokenIndexEpochs' `pre` snapshot.
    val prePost = Tables.readBucketedArchive(s, s"$idx/postings")
    val maxPostPre = prePost.agg(max(col("ingest_epoch")).cast("long"))
      .head().getLong(0)
    val preNewest = prePost
      .where(col("ingest_epoch") === maxPostPre && lit(maxPostPre > 0L))
      .select(col("doc_id")).distinct().localCheckpoint()
    foldEpochs(s"$idx/postings",
      Tables.readBucketedArchive(s, s"$idx/postings"),
      Tables.replaceBucketedArchive(_, s"$idx/postings"))
    foldEpochs(s"$idx/sizes",
      Tables.readManifested(s, s"$idx/sizes"),
      Tables.upsertManifested(_, s"$idx/sizes",
        Seq("ingest_epoch"), _ => true))
    Tables.readTombstones(s, tombPath, "doc_id").foreach { td =>
      val carried = td.join(preNewest, Seq("doc_id"), "left_semi")
        .localCheckpoint()
      Tables.clearManifested(s, tombPath)
      if (!carried.isEmpty)
        Tables.ingestTombstones(carried, tombPath, epoch = 0L)
      Ckpt.release(carried)
    }
    Ckpt.release(preNewest)
  }

  val qClusterDeleteOracle: String =
    """WITH RECURSIVE
      |live AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 <> 0),
      |sh AS (
      |  SELECT DISTINCT doc_id, sh FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
      |        i -> string_split(text,' ')[i] || ' ' ||
      |             string_split(text,' ')[i+1] || ' ' ||
      |             string_split(text,' ')[i+2])) AS sh
      |    FROM live WHERE len(string_split(text,' ')) >= 3)),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
      |        >= 0.2),
      |sym AS (SELECT src, dst FROM edges
      |        UNION SELECT dst, src FROM edges),
      |reach AS (
      |  SELECT doc_id AS node, doc_id AS lab FROM live
      |  UNION
      |  SELECT s.dst AS node, r.lab FROM reach r
      |  JOIN sym s ON s.src = r.node),
      |cc AS (SELECT node AS doc_id, min(lab) AS cluster_id
      |       FROM reach GROUP BY node)
      |SELECT doc_id, cluster_id, doc_id = cluster_id AS keep
      |FROM cc ORDER BY doc_id""".stripMargin

  // ---------- Incremental (batch-vs-corpus) dedup ----------

  /** Dedup a NEW batch against the EXISTING corpus — the daily shape
    * at 100 TB: the corpus is the 100 TB side, today's batch is
    * small, the corpus' shingle postings + sizes live in the shared
    * PERSISTED archive ([[clusterIndex]] — one build serves this and
    * [[qClusterIncremental]]), and candidate pairs come from ONE
    * broadcast-batch probe of the postings index. Corpus text is
    * never re-shingled and never self-joined on the daily path; the
    * batch commits its own postings under a new epoch so tomorrow's
    * archive is current.
    *
    * Batch = doc_id % 10 == 0 (deterministic stand-in for today's
    * arrivals). Per batch doc: how many corpus near-dups (Jaccard
    * ≥ 0.2 over the shared shingle substrate), the best match and its
    * similarity, and the keep/drop verdict. Ranking uses the ROUNDED
    * jaccard (+ match id) so engine and oracle order identically. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val idx = clusterIndex(s, dir)
    val docs = t(s, dir, "documents")
    val bsh = TextOps.shingles(docs.where(col("doc_id") % 10 === 0))
      .localCheckpoint()
    Ckpt.track("dedup_incremental", bsh)
    TextOps.ingestShinglePostings(bsh, idx, epoch = 1L)
    // no broadcast hint: the shingle-bucketed archive side arrives
    // pre-partitioned, so the probe shuffles only the batch (AQE may
    // still broadcast a small batch at runtime) — see
    // clusterIncrementalFrom for the full rationale
    val common = bsh.select(col("doc_id").as("b_id"), col("shingle"))
      .join(TextOps.readShinglePostings(s, idx, excludeEpoch = 1L)
        .select(col("doc_id").as("c_id"), col("shingle")), "shingle")
      .groupBy(col("b_id"), col("c_id"))
      .agg(count(lit(1)).as("n_common"))
    val bSizes = bsh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val cSizes = TextOps.readShingleSizes(s, idx, excludeEpoch = 1L)
    val ratio = col("n_common") /
      (col("n_b") + col("n_c") - col("n_common")).cast("double")
    val matches = common
      .join(bSizes.select(col("doc_id").as("b_id"), col("n_sh").as("n_b")),
        "b_id")
      .join(cSizes.select(col("doc_id").as("c_id"), col("n_sh").as("n_c")),
        "c_id")
      .where(ratio >= 0.2)
      .withColumn("jaccard", graft.expr.Columns.roundQ(ratio, 4))
      .select(col("b_id"), col("c_id"), col("jaccard"))
    val w = Window.partitionBy(col("b_id"))
      .orderBy(col("jaccard").desc, col("c_id"))
    val best = matches.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("b_id"), col("c_id").as("best_match_id"),
        col("jaccard").as("best_jaccard"))
    val counts = matches.groupBy(col("b_id"))
      .agg(count(lit(1)).as("n_matches"))
    docs.where(col("doc_id") % 10 === 0).select(col("doc_id"))
      .join(counts.withColumnRenamed("b_id", "doc_id"),
        Seq("doc_id"), "left")
      .join(best.withColumnRenamed("b_id", "doc_id"),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"),
        col("best_match_id"), col("best_jaccard"))
      .orderBy("doc_id")
  }

  val dedupIncrementalOracle: String =
    "WITH " + TextOps.shinglePairsCte + ",\n" +
      """bm AS (
        |  SELECT b.doc_id AS b_id, c.doc_id AS c_id, count(*) AS n_common
        |  FROM sh b JOIN sh c ON b.sh = c.sh
        |  WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT b_id, c_id,
        |    floor(n_common / CAST(sb.n_sh + sc.n_sh - n_common AS DOUBLE)
        |          * 10000 + 0.5) / 10000 AS jaccard
        |  FROM bm
        |  JOIN sizes sb ON sb.doc_id = b_id
        |  JOIN sizes sc ON sc.doc_id = c_id
        |  WHERE n_common / CAST(sb.n_sh + sc.n_sh - n_common AS DOUBLE)
        |        >= 0.2),
        |best AS (
        |  SELECT b_id, c_id, jaccard FROM (
        |    SELECT m.*, row_number() OVER (PARTITION BY b_id
        |      ORDER BY jaccard DESC, c_id) AS rn FROM m)
        |  WHERE rn = 1),
        |agg AS (SELECT b_id, count(*) AS n_matches FROM m GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_matches, 0) AS n_matches,
        |  coalesce(a.n_matches, 0) > 0 AS is_dup,
        |  b.c_id AS best_match_id, b.jaccard AS best_jaccard
        |FROM documents d
        |LEFT JOIN agg a ON a.b_id = d.doc_id
        |LEFT JOIN best b ON b.b_id = d.doc_id
        |WHERE d.doc_id % 10 = 0
        |ORDER BY d.doc_id""".stripMargin

  // ---------- Benchmark decontamination ----------

  /** Decontamination: flag training docs whose shingle sets overlap a
    * held-out benchmark set — the eval-leak check every training
    * pipeline runs before a data release. Benchmark = doc_id % 97 == 0
    * (a deterministic stand-in for the real eval suite); overlap =
    * count of the train doc's distinct 3-gram shingles that appear in
    * ANY benchmark doc; contaminated = overlap ratio ≥ 0.5 (thresholded
    * on the RAW ratio on both sides, same discipline as the Jaccard
    * family).
    *
    * Scale shape: the benchmark side is always ≪ the corpus — its
    * distinct shingles are BROADCAST, so the corpus-side scan is
    * shuffle-free up to the per-doc count aggregation (one shuffle on
    * doc_id). Never a corpus self-join.
    */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // materialize the shingle substrate ONCE: its three consumers
    // below carry different pushed-down filters, so Catalyst plans
    // three separate scan+explode+distinct subtrees with no exchange
    // reuse (verified in the formatted plan) — one corpus pass beats
    // two extra ones at any scale. persist() in production.
    val sh = TextOps.shingles(docs).localCheckpoint()
    Ckpt.track("q_decontaminate", sh)
    val benchSh = sh.where(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val overlap = sh.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(benchSh), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val ratio = col("n_overlap") / col("n_sh").cast("double")
    docs.where(col("doc_id") % 97 =!= 0)
      .join(sizes, Seq("doc_id"), "left")
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", coalesce(ratio >= 0.5, lit(false)))
      .orderBy("doc_id")
  }

  val qDecontaminateOracle: String =
    "WITH " + TextOps.shinglePairsCte + ",\n" +
      """bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
        |ov AS (
        |  SELECT t.doc_id, count(*) AS n_overlap
        |  FROM sh t JOIN bench b ON t.sh = b.sh
        |  WHERE t.doc_id % 97 <> 0 GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(s.n_sh, 0) AS n_sh,
        |  coalesce(o.n_overlap, 0) AS n_overlap,
        |  coalesce(o.n_overlap / CAST(s.n_sh AS DOUBLE) >= 0.5, false)
        |    AS contaminated
        |FROM documents d
        |LEFT JOIN sizes s ON s.doc_id = d.doc_id
        |LEFT JOIN ov o ON o.doc_id = d.doc_id
        |WHERE d.doc_id % 97 <> 0
        |ORDER BY d.doc_id""".stripMargin

  // ---------- Context-window chunking ----------

  private val ChunkLen = 32
  private val ChunkStride = 24 // 8-token overlap between chunks

  /** Split documents into fixed-size overlapping token windows — the
    * context-length chunking step that turns documents into training
    * sequences. Chunk i covers words [i·stride, i·stride + len); the
    * last chunk may be short; every word lands in ≥ 1 chunk.
    *
    * Purely narrow (explode of a computed sequence, zero shuffles);
    * output grows by the overlap factor len/stride ≈ 1.33×, visible in
    * the plan as a single Generate over the scan.
    */
  /** (doc_id, chunk_id, n_tokens, chunk_text) for a `doc_id, text`
    * input — shared by the standalone chunking query and the composed
    * training-prep pipeline. */
  private def chunkify(docs: DataFrame): DataFrame = {
    val n = size(col("ws"))
    val nChunks = floor((n + lit(ChunkStride - 1)) / lit(ChunkStride))
      .cast("int")
    docs
      .withColumn("ws", words(col("text")))
      .withColumn("chunk_id", explode(sequence(lit(0), nChunks - 1)))
      // bigint AFTER the explode (a generator can't nest under a cast);
      // matches the oracle's range()-produced BIGINT
      .withColumn("chunk_id", col("chunk_id").cast("bigint"))
      .withColumn("chunk",
        slice(col("ws"), (col("chunk_id") * ChunkStride + 1).cast("int"),
          lit(ChunkLen)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        concat_ws(" ", col("chunk")).as("chunk_text"))
  }

  def qChunkDocs(s: SparkSession, dir: String): DataFrame =
    chunkify(t(s, dir, "documents"))
      .orderBy("doc_id", "chunk_id")

  val qChunkDocsOracle: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, ws,
       |    unnest(range(0, (len(ws) + ${ChunkStride - 1}) // $ChunkStride))
       |      AS chunk_id
       |  FROM w)
       |SELECT doc_id, chunk_id,
       |  CAST(len(list_slice(ws, chunk_id * $ChunkStride + 1,
       |                      chunk_id * $ChunkStride + $ChunkLen)) AS INT)
       |    AS n_tokens,
       |  array_to_string(list_slice(ws, chunk_id * $ChunkStride + 1,
       |                             chunk_id * $ChunkStride + $ChunkLen), ' ')
       |    AS chunk_text
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  // ---------- Sequence packing (token-budget batching) ----------

  private val PackShards = 8
  private val PackBudget = 256L // tokens per batch

  /** Pack documents into training batches under a token budget —
    * streaming fill: within each shard, walk the docs in deterministic
    * hash order and cut a new batch every time the running token count
    * crosses the budget (batch = exclusive-prefix-sum ÷ budget). A doc
    * longer than the budget owns its batch and pushes the boundary —
    * the standard greedy behavior.
    *
    * Scale shape: a GLOBAL streaming fill is a single-partition window
    * (the classic scale killer), so packing is SHARDED — docs hash
    * into [[PackShards]] independent shards and the prefix-sum window
    * partitions by shard, giving full parallelism at the price of
    * at-most-one underfull final batch per shard. The hash order
    * doubles as the shuffle every packing pipeline wants anyway
    * (neighboring docs decorrelated). At 100 TB: shards = O(cluster
    * parallelism), each shard's window is one sorted partition.
    */
  def qPackSequences(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"),
        size(words(col("text"))).cast("bigint").as("n_tokens"))
      .withColumn("shard", col("doc_id") % PackShards)
      .withColumn("ord", md5(col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("batch_id",
        floor((col("cum_tokens") - col("n_tokens")) / lit(PackBudget))
          .cast("bigint"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("batch_id"))
      .orderBy("doc_id")
  }

  val qPackSequencesOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    doc_id % $PackShards AS shard,
       |    md5(CAST(doc_id AS VARCHAR)) AS ord
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY shard
       |      ORDER BY ord, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_tokens
       |  FROM d)
       |SELECT doc_id, shard, n_tokens,
       |  (cum_tokens - n_tokens) // $PackBudget AS batch_id
       |FROM c ORDER BY doc_id""".stripMargin

  // ---------- Length-bucketed batching (padding efficiency) ----------

  /** Length-bucketed batching stats: assign every doc to the smallest
    * power-of-two token bucket that holds it and report, per bucket,
    * the doc count, real token mass, padded mass (n_docs × bucket) and
    * the padding-waste ratio — the quantity a batching strategy is
    * chosen to minimize. The OTHER standard batching scheme next to
    * [[qPackSequences]]'s concat-and-pack: bucketing keeps document
    * boundaries (no cross-doc attention contamination) at the price of
    * the padding this query measures.
    *
    * The bucket is an integer CASE chain (16/32/64/128/256/512 — no
    * float log2 to disagree on); waste is one int/int quotient under
    * roundQ. Narrow per-row work + a |buckets|-row aggregate: no
    * scale surface at all.
    */
  def qLengthBuckets(s: SparkSession, dir: String): DataFrame =
    lengthBucketStats(t(s, dir, "documents")).orderBy("bucket")

  /** The bucketing core over ANY (text) frame — factored for the
    * planted-boundary spec (gopherFlags discipline). */
  private[ops] def lengthBucketStats(docs: DataFrame): DataFrame = {
    val n = size(words(col("text")))
    val bucket = when(n <= 16, 16).when(n <= 32, 32).when(n <= 64, 64)
      .when(n <= 128, 128).when(n <= 256, 256).otherwise(512)
    docs
      .select(bucket.as("bucket"), n.cast("bigint").as("n_tokens"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        (count(lit(1)) * col("bucket")).as("padded_tokens"),
        graft.expr.Columns.roundQ(
          (count(lit(1)) * col("bucket") - sum(col("n_tokens"))) /
            (count(lit(1)) * col("bucket")).cast("double"), 4)
          .as("pad_waste"))
  }

  val qLengthBucketsOracle: String =
    """WITH d AS (SELECT
      |    CASE WHEN len(string_split(text,' ')) <= 16 THEN 16
      |         WHEN len(string_split(text,' ')) <= 32 THEN 32
      |         WHEN len(string_split(text,' ')) <= 64 THEN 64
      |         WHEN len(string_split(text,' ')) <= 128 THEN 128
      |         WHEN len(string_split(text,' ')) <= 256 THEN 256
      |         ELSE 512 END AS bucket,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |SELECT CAST(bucket AS INT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
      |  floor((count(*) * bucket - sum(n_tokens))
      |        / CAST(count(*) * bucket AS DOUBLE) * 10000 + 0.5) / 10000
      |    AS pad_waste
      |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------- Stratified sampling ----------

  private val StratumCap = 50

  /** Exact per-stratum sampling: up to [[StratumCap]] docs per
    * language, chosen in deterministic content-hash order — the
    * class-balancing step of corpus curation (cap the dominant
    * language instead of letting it dominate the mixture). Unlike
    * `df.sampleBy`, the result is exact (≤ cap per stratum, no
    * variance) and reproducible across runs/retries/partitionings —
    * same rationale as `q_sample_hash`.
    *
    * One shuffle on the stratum key; the per-stratum sort is bounded
    * by the largest stratum. At 100 TB with a skewed stratum the
    * windowed rank would be replaced by [[graft.expr.TopKAgg]]
    * (heap-based per-group top-k, `q_topk_heap`) — same composition,
    * k = cap, ordering key = the hash.
    */
  def qSampleStratified(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= StratumCap)
      .select(col("doc_id"), col("lang"), col("rn"))
      .orderBy("lang", "rn")
  }

  val qSampleStratifiedOracle: String =
    s"""SELECT doc_id, lang, rn FROM (
       |  SELECT doc_id, lang,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
       |  FROM documents)
       |WHERE rn <= $StratumCap
       |ORDER BY lang, rn""".stripMargin

  // ---------- Train/val/test split ----------

  /** Deterministic 80/10/10 dataset split on the content-independent
    * doc key: the first md5 hex byte partitions [0,256) into
    * train < 0xcc (204), val < 0xe6 (230), test otherwise — compared
    * as hex STRINGS, which order identically to the bytes in every
    * engine (the same portable-hash discipline as q_sample_hash).
    * Splitting on a hash of the KEY (not rand()) is what makes the
    * split stable under retries, repartitions, and incremental
    * appends — a new batch lands in the same split forever, so no
    * train/test leakage when the corpus grows. Narrow + one tiny
    * aggregate; the split column costs one md5 per row. */
  def qDatasetSplit(s: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    t(s, dir, "documents")
      .withColumn("split",
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(words(col("text")))).as("n_tokens"))
      .orderBy("split")
  }

  val qDatasetSplitOracle: String =
    """SELECT CASE
      |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
      |      THEN 'train'
      |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
      |      THEN 'val'
      |    ELSE 'test' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |FROM documents GROUP BY 1 ORDER BY split""".stripMargin

  // ---------- Fuzzy record linkage (blocked edit distance) ----------

  /** Entity resolution over a dirty string field — the classic
    * blocked-linkage shape: collapse to DISTINCT values first (the
    * decisive move on low-cardinality fields: 20 000 part rows carry
    * 64 names, and pairing before the collapse would square the
    * duplication), block candidates on a cheap key (last name token),
    * prune by the length band edit distance ≤ 3 implies, and only
    * then pay levenshtein on the surviving pairs. Candidate volume is
    * Σ|block|² over DISTINCT values — the same bounded-cell
    * discipline as the LSH dedup family, with the row multiplicity
    * carried alongside (rows_a/rows_b) so the linkage verdict maps
    * back to full-table impact without another scan.
    *
    * Fully deterministic (integer edit distances, canonical a < b
    * pairs) → hash-gated: DuckDB's levenshtein implements the same
    * unit-cost edit distance. */
  def qFuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "part")
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", regexp_extract(col("p_name"), "[a-z]+$", 0))
    val a = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_rows").as("rows_a"))
    val b = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_rows").as("rows_b"))
    a.join(b, "blk")
      .where(col("name_a") < col("name_b"))
      .where(abs(length(col("name_a")) - length(col("name_b"))) <= 3)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .where(col("dist") <= 3)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("rows_a"), col("rows_b"))
      .orderBy("name_a", "name_b")
  }

  val qFuzzyMatchOracle: String =
    """WITH names AS (
      |  SELECT p_name, count(*) AS n_rows,
      |    regexp_extract(p_name, '[a-z]+$') AS blk
      |  FROM part GROUP BY 1),
      |p AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b,
      |    a.n_rows AS rows_a, b.n_rows AS rows_b
      |  FROM names a JOIN names b ON a.blk = b.blk
      |    AND a.p_name < b.p_name
      |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 3)
      |SELECT name_a, name_b,
      |  CAST(levenshtein(name_a, name_b) AS INT) AS dist,
      |  rows_a, rows_b
      |FROM p WHERE levenshtein(name_a, name_b) <= 3
      |ORDER BY name_a, name_b""".stripMargin

  // ---------- Graph: triangle count over the linkage graph ----------

  /** Triangle count over the fuzzy-linkage name graph — the canonical
    * two-hop join workload, and the standard structure probe after
    * building any similarity/linkage graph (a triangle-dense cluster
    * is a template family; a triangle-free one is chained drift).
    * With edges ORIENTED a < b and wedges kept a < b < c, every
    * triangle is counted exactly once and the join fan-out is bounded
    * by the ordered degree — at 100 TB this orientation (not the raw
    * symmetric edge list) is the difference between Σ deg² and
    * Σ deg·maxdeg blowups. Two self-joins on the edge endpoints, both
    * shuffles on small name keys. */
  def qTriangleCount(s: SparkSession, dir: String): DataFrame = {
    // the edge list is consumed THREE times on three different join
    // keys (no exchange reuse possible) — materialize it once instead
    // of re-running the whole distinct+block+levenshtein pipeline per
    // instance (the same consumed-thrice rule as the dedup shingles)
    val e = qFuzzyMatch(s, dir).select(col("name_a"), col("name_b"))
      .localCheckpoint()
    Ckpt.track("q_triangle_count", e)
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.name_b") === col("e2.name_a"))
      .select(col("e1.name_a").as("a"), col("e1.name_b").as("b"),
        col("e2.name_b").as("c"))
    wedges
      .join(e.as("e3"),
        col("a") === col("e3.name_a") && col("c") === col("e3.name_b"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val qTriangleCountOracle: String =
    """WITH names AS (
      |  SELECT p_name, regexp_extract(p_name, '[a-z]+$') AS blk
      |  FROM part GROUP BY 1),
      |e AS (
      |  SELECT a.p_name AS name_a, b.p_name AS name_b
      |  FROM names a JOIN names b ON a.blk = b.blk
      |    AND a.p_name < b.p_name
      |  WHERE abs(length(a.p_name) - length(b.p_name)) <= 3
      |    AND levenshtein(a.p_name, b.p_name) <= 3)
      |SELECT count(*) AS n_triangles
      |FROM e e1
      |JOIN e e2 ON e1.name_b = e2.name_a
      |JOIN e e3 ON e3.name_a = e1.name_a AND e3.name_b = e2.name_b""".stripMargin

  // ---------- Graph: PageRank over the linkage graph ----------

  /** Bounded-iteration PageRank (Page et al. 1999) over ANY undirected
    * (name_a, name_b) edge list — the importance ranking that
    * complements [[connectedComponents]] (membership) and
    * [[qTriangleCount]] (local density) on the linkage graph. Power
    * iteration as a DataFrame loop: per round one join of edges
    * against current ranks (shuffle on dst), degree-normalized
    * contributions, damped update r' = (1−d)/|V| + d·Σ contribs. The
    * symmetric edge list has no dangling nodes (every node in V has
    * degree ≥ 1), so no dangling-mass term is needed — documented
    * rather than silently dropped. Loop discipline = the k-means one:
    * every round's ranks are localCheckpoint'ed and the previous
    * round's blocks released immediately; edges checkpoint once
    * (consumed every round).
    *
    * Scale shape: per round, one keyed shuffle of |E| contributions —
    * O(iters·|E|), the textbook distributed formulation; ranks/degree
    * stay keyed by node, never collected. The |V| pull is a one-row
    * sizing scalar (iteration-control class, same justification as the
    * k-means superstep).
    */
  private[ops] def pageRank(undirected: DataFrame, iters: Int,
      damping: Double, driverCap: Int = DriverGraphEdgeCap): DataFrame = {
    val edges = undirected
      .select(col("name_a").as("src"), col("name_b").as("dst"))
      .union(undirected
        .select(col("name_b").as("src"), col("name_a").as("dst")))
      .localCheckpoint()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = deg.count() // |V|: one-row sizing scalar (see scaladoc)
    val base = (1.0 - damping) / n
    // SIZE-ADAPTIVE execution, the [[pageRankWithRestart]] dispatch
    // extended to the symmetric variant (it was the one gated
    // PageRank still paying 10 distributed rounds of pure scheduling
    // latency on a structurally tiny graph): below the cap the whole
    // graph is a bounded artifact pull — iterate in the driver with
    // the IDENTICAL update rule (fixed round count, no dangling term:
    // symmetric edges give every node out-degree ≥ 1). Past the cap
    // the distributed loop below runs unchanged; the spec pins path
    // equality through the cap override.
    if (n + edges.count() <= driverCap) {
      val es = edges.collect().map(r => (r.getString(0), r.getString(1)))
      val nodes = es.map(_._1).distinct.sorted
      val degM = es.groupBy(_._1).view.mapValues(_.length.toLong).toMap
      var rk = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map[String, Double]()
          .withDefaultValue(0.0)
        es.foreach { case (u, v) => contrib(v) += rk(u) / degM(u) }
        rk = nodes.map(u => u -> (base + damping * contrib(u))).toMap
      }
      Ckpt.track("q_pagerank", edges)
      import undirected.sparkSession.implicits._
      return nodes.toSeq.map { u =>
        (u, math.floor(rk(u) * 10000 + 0.5) / 10000, degM(u).toInt)
      }.toDF("name", "pagerank", "degree")
    }
    var ranks = deg
      .select(col("src").as("name"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val next = edges
        .join(ranks.withColumnRenamed("name", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("name"), (col("rank") / col("deg")).as("c"))
        .groupBy("name")
        .agg((lit(base) + lit(damping) * sum(col("c"))).as("rank"))
        .localCheckpoint()
      Ckpt.release(ranks)
      ranks = next
    }
    Ckpt.track("q_pagerank", edges, ranks)
    ranks
      .join(deg.withColumnRenamed("src", "name"), "name")
      .select(col("name"),
        graft.expr.Columns.roundQ(col("rank"), 4).as("pagerank"),
        col("deg").cast("int").as("degree"))
  }

  /** PageRank over the fuzzy-linkage name graph (10 damped-0.85
    * rounds). Rows-only gated — the iterative fixpoint isn't
    * SQL-expressible; `CurationSpec` pins a uniform-cycle closed form,
    * the hub-vs-leaf star ordering, rank-mass conservation, and an
    * independent in-memory power-iteration replay on the real graph.
    */
  def qPageRank(s: SparkSession, dir: String): DataFrame =
    pageRank(qFuzzyMatch(s, dir).select(col("name_a"), col("name_b")),
      iters = 10, damping = 0.85)
      .orderBy("name")

  /** Directed PageRank with the two pieces the symmetric variant can
    * omit ([[pageRank]]'s scaladoc documents why it can): DANGLING-
    * MASS redistribution — rank parked on out-degree-0 sinks is spread
    * uniformly over V each round, the standard completion that keeps
    * the transition matrix stochastic (dropping it leaks Σranks → <1
    * on any real link graph, where sinks are common) — and a Σ|Δ|
    * EARLY STOP: the loop ends when total rank movement falls under
    * `tol` instead of always paying `maxIters` rounds (the gated
    * queries stop at [[PageRankTol]], the tolerance the 4dp output
    * precision actually justifies).
    *
    * Per round: one keyed |E| contribution shuffle (identical to the
    * symmetric variant) and ONE driver action — the convergence delta
    * and the NEXT round's dangling mass come out of a single
    * aggregate over the round's NON-EAGERLY checkpointed ranks (the
    * aggregate materializes the checkpoint blocks as a side effect,
    * and the ranks frame carries `deg`, so sink membership needs no
    * join). The k-means-superstep justification class; nothing here
    * moves data. Round-count × per-round barriers is the term that
    * dominates an iterative algorithm's tail at 1000 executors —
    * which is why the fusion work targets actions per round (3 → 1
    * across rounds 6-8) and the stop targets rounds (21 → 18 at
    * sf0.1). Rows-only gated (the fixpoint isn't
    * SQL-expressible); CurationSpec pins a star-with-dangling-leaves
    * closed form, mass conservation WITH sinks, the early stop
    * actually firing, and an independent in-memory replay on the real
    * oriented graph. */
  private[ops] def pageRankDirected(directed: DataFrame, maxIters: Int,
      damping: Double, tol: Double,
      driverCap: Int = DriverGraphEdgeCap): DataFrame =
    pageRankWithRestart(directed, restart = None, maxIters, damping,
      tol, ckptKey = "q_pagerank_directed", driverCap = driverCap)

  /** Directed PageRank with a RESTART distribution — the shared fused
    * loop under [[pageRankDirected]] (uniform restart) and
    * [[pageRankPersonalized]] (seed-concentrated restart). Both the
    * teleport term (1−d)·r(v) and the dangling-mass completion
    * d·D·r(v) follow the restart vector, the standard personalized
    * formulation: a random surfer who jumps — or walks off a sink —
    * always re-enters at the restart distribution, so total mass
    * stays 1 and, with a seed restart, rank concentrates around the
    * seeds. `restart = None` means uniform 1/|V| (plain directed
    * PageRank). */
  /** Σ|Δ| early-stop for the gated PageRank queries, derived from the
    * emitted precision instead of guessed: the outputs are
    * roundQ(rank, 4), and after stopping at Σ|Δ| ≤ tol the remaining
    * total movement is bounded by the geometric tail tol·d/(1−d)
    * (each round's movement shrinks by at least d). tol =
    * 0.5e-4·(1−d)/d keeps that tail under half a 4dp ulp summed
    * ACROSS ALL NODES — later rounds refine digits the output never
    * shows. Unlike a guessed absolute 1e-6 (which at sf0.1 spent 21
    * of 30 budgeted rounds polishing invisible digits — 11 % of the
    * whole bench on the two directed variants), this calibration is
    * output-faithful at any SF. */
  private[ops] val PageRankTol: Double = 0.5e-4 * 0.15 / 0.85

  /** Below this many total graph rows (|V| + |E|), the PageRank loop
    * runs in the driver on collected arrays instead of as a
    * distributed DataFrame loop: 2·rounds cluster barriers for data
    * that fits ONE task is all scheduling latency and no parallelism.
    * The bounded pull is iteration-control class (the same
    * justification as the k-means superstep scalars — at 100 000 rows
    * of two strings it is ~MBs); past the cap the distributed loop
    * runs unchanged. CurationSpec pins path equality on planted
    * graphs by forcing the distributed loop through the cap
    * override. */
  private[ops] val DriverGraphEdgeCap = 100000

  /** The in-driver power iteration behind the small-graph path —
    * IDENTICAL update rule to the distributed loop (damped,
    * dangling-to-restart, Σ|Δ| stop), deterministic by sorted node
    * order. */
  private def pageRankInDriver(s: SparkSession,
      edges: Array[(String, String)],
      restartMap: Option[Map[String, Double]],
      maxIters: Int, damping: Double, tol: Double): DataFrame = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outDeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n = nodes.length
    val restart = restartMap match {
      case None => nodes.map(_ -> 1.0 / n).toMap
      case Some(m) => nodes.map(u => u -> m.getOrElse(u, 0.0)).toMap
    }
    var rk = restart
    var iters = 0
    var delta = Double.MaxValue
    while (iters < maxIters && delta > tol) {
      val dangling = nodes.iterator
        .filterNot(outDeg.contains).map(rk).sum
      val contrib = scala.collection.mutable.Map[String, Double]()
        .withDefaultValue(0.0)
      edges.foreach { case (u, v) => contrib(v) += rk(u) / outDeg(u) }
      val next = nodes.map(u => u ->
        ((1.0 - damping + damping * dangling) * restart(u)
          + damping * contrib(u))).toMap
      delta = nodes.iterator.map(u => math.abs(next(u) - rk(u))).sum
      rk = next
      iters += 1
    }
    import s.implicits._
    nodes.toSeq.map { u =>
      val d = outDeg.getOrElse(u, 0L)
      (u, math.floor(rk(u) * 10000 + 0.5) / 10000, d.toInt, d == 0L)
    }.toDF("name", "pagerank", "out_degree", "is_dangling")
  }

  private[ops] def pageRankWithRestart(directed: DataFrame,
      restart: Option[DataFrame], maxIters: Int, damping: Double,
      tol: Double, ckptKey: String,
      driverCap: Int = DriverGraphEdgeCap): DataFrame = {
    val edges = directed
      .select(col("name_a").as("src"), col("name_b").as("dst"))
      .localCheckpoint()
    // V = every endpoint; out-degree 0 (never a src) = dangling sink
    val deg = edges.select(col("src").as("name"))
      .union(edges.select(col("dst").as("name"))).distinct()
      .join(edges.groupBy(col("src").as("name"))
        .agg(count(lit(1)).as("deg")), Seq("name"), "left")
      .select(col("name"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint()
    val n = deg.count()
    // SIZE-ADAPTIVE execution (the AQE philosophy applied to the
    // iterative loop): below [[DriverGraphEdgeCap]] total rows the
    // whole graph is a bounded artifact pull — iterate IN THE DRIVER
    // and skip 2·rounds distributed barriers whose per-round data
    // fits one task. The linkage graph is structurally tiny at every
    // SF (|V| is bounded by distinct customer names), so the gated
    // queries take this path; the distributed loop below is the
    // 100 TB-graph path and stays spec-pinned equal on planted
    // graphs (CurationSpec drives both via the cap override).
    if (n + edges.count() <= driverCap) {
      val result = pageRankInDriver(s = directed.sparkSession,
        edges = edges.collect().map(r => (r.getString(0), r.getString(1))),
        restartMap = restart.map(_.collect()
          .map(r => r.getString(0) -> r.getDouble(1)).toMap),
        maxIters = maxIters, damping = damping, tol = tol)
      Ckpt.track(ckptKey, edges, deg)
      return result
    }
    // per-node restart mass: uniform, or the caller's seed
    // distribution (absent nodes restart at 0)
    val withRestart = restart match {
      case None => deg.withColumn("restart", lit(1.0 / n))
      case Some(r) => deg.join(r, Seq("name"), "left")
        .select(col("name"), col("deg"),
          coalesce(col("restart"), lit(0.0)).as("restart"))
    }
    // ranks start AT the restart distribution; one sizing pull gives
    // the start's dangling mass (Σ restart over sinks). NON-EAGER
    // checkpoint: the scalar pull right below materializes the blocks
    // (its aggregate touches every partition), so setup costs one
    // driver action, not two — the same fusion the loop uses.
    var ranks = withRestart
      .select(col("name"), col("restart").as("rank"), col("deg"),
        col("restart"))
      .localCheckpoint(eager = false)
    var dangling = ranks.agg(
      sum(when(col("deg") === 0, col("rank")).otherwise(lit(0.0))))
      .head().getDouble(0)
    var iters = 0
    var delta = Double.MaxValue
    while (iters < maxIters && delta > tol) {
      val contrib = edges
        .join(ranks.where(col("deg") > 0)
          .select(col("name").as("src"),
            (col("rank") / col("deg")).as("c")), "src")
        .select(col("dst").as("name"), col("c"))
        .groupBy("name").agg(sum(col("c")).as("cs"))
      // next carries the previous rank (r0), deg and restart so the
      // combined delta/dangling aggregate below needs NO join at all.
      // NON-EAGER checkpoint: the aggregate's head() is the round's
      // ONE driver action — it computes every partition, so the
      // checkpoint blocks materialize as a side effect and the
      // lineage still truncates (an eager checkpoint would spend a
      // second job per round doing the same work twice; at 1000
      // executors the eliminated barrier is scheduling latency ×
      // rounds, the iterative-job tail term)
      val next = ranks
        .select(col("name"), col("rank").as("r0"), col("deg"),
          col("restart"))
        .join(contrib, Seq("name"), "left")
        .select(col("name"),
          ((lit(1.0 - damping) + lit(damping * dangling)) * col("restart")
            + lit(damping) * coalesce(col("cs"), lit(0.0))).as("rank"),
          col("deg"), col("restart"), col("r0"))
        .localCheckpoint(eager = false)
      val row = next.agg(
        sum(abs(col("rank") - col("r0"))),
        sum(when(col("deg") === 0, col("rank")).otherwise(lit(0.0))))
        .head()
      delta = row.getDouble(0)
      dangling = row.getDouble(1)
      Ckpt.release(ranks)
      ranks = next
      iters += 1
    }
    Ckpt.track(ckptKey, edges, deg, ranks)
    ranks.select(col("name"),
      graft.expr.Columns.roundQ(col("rank"), 4).as("pagerank"),
      col("deg").cast("int").as("out_degree"),
      (col("deg") === 0).as("is_dangling"))
  }

  /** Directed PageRank over the fuzzy-linkage graph ORIENTED
    * name_a < name_b (the [[qTriangleCount]] orientation) — a genuine
    * directed graph whose lexicographic sinks are real dangling
    * nodes, exercising the redistribution term on driver-gated data.
    * Budget 100 damped-0.85 rounds (affordable now that the
    * small-graph driver path makes a round cost microseconds — the
    * uniform restart stops at ~18 via the Σ|Δ| early stop anyway),
    * stop at the output-precision tolerance ([[PageRankTol]]). */
  def qPageRankDirected(s: SparkSession, dir: String): DataFrame =
    pageRankDirected(
      qFuzzyMatch(s, dir).select(col("name_a"), col("name_b")),
      maxIters = 100, damping = 0.85, tol = PageRankTol)
      .orderBy("name")

  /** PERSONALIZED PageRank over the same oriented linkage graph —
    * the influence/selection variant a curation pipeline runs to
    * score documents by proximity to a trusted seed set: restart
    * mass sits uniformly on the seeds (the lexicographically
    * smallest 5 node names — deterministic; materializing the seed
    * set is a bounded ≤5-row artifact pull), and both the teleport
    * and the dangling completion re-enter AT the seeds, so rank
    * concentrates around them while total mass stays 1
    * ([[pageRankWithRestart]]). Same fused per-round shape as the
    * directed variant. Rows-only gate (iterative fixpoint);
    * CurationSpec pins a seed-star closed form, mass conservation,
    * seed dominance on real data, and an independent in-memory
    * replay with the same restart vector. */
  def qPageRankPersonalized(s: SparkSession, dir: String): DataFrame = {
    // checkpoint the oriented edge list ONCE: both the seed
    // derivation below and the loop's own edge checkpoint consume it,
    // and each would otherwise re-run the whole fuzzy-linkage join
    // (the single most expensive input stage — measured ~3 s of the
    // query's ~8 s at sf0.1 before this materialization)
    val directed = qFuzzyMatch(s, dir)
      .select(col("name_a"), col("name_b")).localCheckpoint()
    Ckpt.track("q_pagerank_personalized_src", directed)
    val seedNames = directed.select(col("name_a").as("name"))
      .union(directed.select(col("name_b").as("name"))).distinct()
      .orderBy("name").limit(5)
    val k = seedNames.count() // ≤ 5 rows; exact seed mass needs |S|
    val seeds = seedNames.withColumn("restart", lit(1.0 / k))
    // 100-round budget: the seed-concentrated restart converges at
    // rate ≈ d (most mass circulates seeds → graph → sinks → seeds),
    // so the Σ|Δ| stop needs ~75 rounds — a truncated 30-round budget
    // emitted values ~1e-3 off the fixpoint. Affordable because the
    // small-graph driver path makes rounds free; a past-the-cap graph
    // pays only as many distributed rounds as the early stop leaves.
    pageRankWithRestart(directed, Some(seeds), maxIters = 100,
      damping = 0.85, tol = PageRankTol,
      ckptKey = "q_pagerank_personalized")
      .orderBy("name")
  }

  // ---------- Domain mixture (token-budget resampling) ----------

  /** Domain-weighted mixture resampling (the DoReMi/Pile recipe): give
    * every source domain a TOKEN budget proportional to its mixture
    * weight, then fill each budget in deterministic hash order until
    * the first doc that crosses it (that doc is kept — standard greedy
    * fill, so every non-empty budget is met, never undershot). The
    * weights here are a deterministic function of the source id
    * (1 + src_index % 4) standing in for a learned mixture; the global
    * budget is 1/4 of the corpus tokens. All sizing stays in BIGINT
    * with integral division (`DIV` / `//`) — no float boundary to
    * straddle — and the fill order is the portable md5 order
    * [[qSampleStratified]] established.
    *
    * Scale shape: one shuffle on source for the per-domain prefix-sum
    * window, and a broadcast of the per-source budget table (|sources|
    * rows). A pathologically hot domain would shard its window exactly
    * like [[qPackSequences]]; at 100 TB the budget table stays tiny, so
    * the corpus never shuffles twice. */
  def qDomainMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(words(col("text"))).cast("bigint").as("n_tokens"))
    // digits-only weight derivation, identical expression in the
    // oracle: substring-position parsing capped at 10 chars and
    // non-ANSI cast behavior would only agree with DuckDB because
    // fixture sources are short 'srcN' — a regexp over the trailing
    // digits (0 when absent) can't silently diverge on new fixtures
    val weights = docs.select(col("source")).distinct()
      .withColumn("weight", expr(
        "1 + coalesce(try_cast(regexp_extract(source, '([0-9]+)$', 1) " +
          "AS BIGINT), 0) % 4"))
    val wsum = weights.agg(sum(col("weight")).as("w_sum"))
    val total = docs.agg(sum(col("n_tokens")).as("t_total"))
    val budgets = weights
      .crossJoin(broadcast(wsum)).crossJoin(broadcast(total))
      .withColumn("budget", expr("(t_total * weight) DIV (w_sum * 4)"))
      .select(col("source"), col("weight"), col("budget"))
    val ord = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val cumw = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_tokens", sum(col("n_tokens")).over(cumw))
      .withColumn("rn", row_number().over(ord))
      .join(broadcast(budgets), "source")
      .where(col("cum_tokens") - col("n_tokens") < col("budget"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("weight"), col("budget"), col("rn"))
      .orderBy("doc_id")
  }

  val qDomainMixOracle: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |w AS (
      |  SELECT source,
      |    1 + coalesce(TRY_CAST(regexp_extract(source, '([0-9]+)$', 1)
      |      AS BIGINT), 0) % 4 AS weight
      |  FROM (SELECT DISTINCT source FROM d)),
      |b AS (
      |  SELECT source, weight,
      |    CAST(((SELECT sum(n_tokens) FROM d) * weight)
      |      // ((SELECT sum(weight) FROM w) * 4) AS BIGINT) AS budget
      |  FROM w),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rn
      |  FROM d)
      |SELECT c.doc_id, c.source, c.n_tokens, b.weight, b.budget, c.rn
      |FROM c JOIN b USING (source)
      |WHERE c.cum - c.n_tokens < b.budget
      |ORDER BY c.doc_id""".stripMargin

  // ---------- DSIR importance weights (data selection) ----------

  /** Data Selection with Importance Resampling (Xie et al. 2023):
    * score every raw-pool document by how much its hashed-bigram
    * profile looks like a target corpus — here target = `lang = 'en'`
    * docs, pool = the whole corpus. Features are word-bigram
    * OCCURRENCES hashed into B = 1009 buckets (the fixed-size count
    * vector is DSIR's point: the "model" is two B-bucket histograms
    * that broadcast anywhere, never a corpus-sized side); the weight is
    * the add-one-smoothed log-likelihood ratio
    * Σ_gram [ln(t_b+1) − ln(r_b+1)] + n·[ln(N_r+B) − ln(N_t+B)].
    *
    * Hash-gate discipline for a log-space score (the BM25 precedent,
    * plus one new trick): every NON-log input is an exact integer; the
    * per-doc sum runs over `array_sort`ed terms reduced left-to-right
    * (`aggregate`), and the oracle mirrors with
    * `list_reduce(list_sort(...))` — bit-identical summation ORDER, so
    * the only cross-engine slack is ulp-level ln() differences, orders
    * of magnitude inside the 4dp rounding margin (`CurationSpec`
    * replays the score independently and checks boundary distance).
    * The bucket hash is md5-hex→int, portable by construction.
    *
    * Scale shape: ONE corpus pass — the bigram explode aggregates
    * straight into the (doc, lang, bucket) count table, which is
    * localCheckpoint'ed and reused for both histograms, the totals and
    * the per-doc scoring (the consumed-thrice rule from
    * [[qTriangleCount]]); bucket histograms are B rows (broadcast).
    * Linear in corpus size, and scoring a NEW batch against frozen
    * histograms touches only the batch.
    */
  def qDsirWeights(s: SparkSession, dir: String): DataFrame = {
    val B = 1009
    val db = t(s, dir, "documents")
      .withColumn("ws", words(col("text")))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(0), size(col("ws")) - 2),
          i => concat_ws(" ",
            element_at(col("ws"), i + 1),
            element_at(col("ws"), i + 2)))).as("gram"))
      .withColumn("b",
        (conv(substring(md5(col("gram")), 1, 6), 16, 10).cast("long") % B)
          .cast("int"))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("dcnt"))
      .localCheckpoint()
    Ckpt.track("q_dsir_weights", db)
    val tc = db.where(col("lang") === "en")
      .groupBy("b").agg(sum(col("dcnt")).as("t_cnt"))
    val rc = db.groupBy("b").agg(sum(col("dcnt")).as("r_cnt"))
    val stats = rc.join(tc, Seq("b"), "left").na.fill(0L, Seq("t_cnt"))
    val totals = db.agg(
      sum(col("dcnt")).as("n_r"),
      sum(when(col("lang") === "en", col("dcnt")).otherwise(0L))
        .as("n_t"))
    db.join(broadcast(stats), "b")
      .withColumn("term",
        col("dcnt") * (log(col("t_cnt") + 1) - log(col("r_cnt") + 1)))
      .groupBy("doc_id")
      .agg(
        sum(col("dcnt")).cast("int").as("n_feats"),
        sum(col("dcnt") * col("t_cnt")).as("sum_tgt"),
        sum(col("dcnt") * col("r_cnt")).as("sum_raw"),
        aggregate(array_sort(collect_list(col("term"))), lit(0.0),
          (a, x) => a + x).as("s"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_feats"), col("sum_tgt"),
        col("sum_raw"),
        graft.expr.Columns.roundQ(
          col("s") + col("n_feats") *
            (log(col("n_r") + B) - log(col("n_t") + B)), 4)
          .as("dsir_logw"))
      .orderBy("doc_id")
  }

  val qDsirWeightsOracle: String =
    """WITH w AS (SELECT doc_id, lang, string_split(text,' ') AS w
      |           FROM documents WHERE len(string_split(text,' ')) >= 2),
      |g AS (SELECT doc_id, lang,
      |       unnest(list_transform(range(1, len(w)),
      |         i -> w[i] || ' ' || w[i+1])) AS gram
      |      FROM w),
      |gb AS (SELECT doc_id, lang,
      |        CAST(list_reduce(list_transform(
      |            string_split(substr(md5(gram),1,6),''),
      |            c -> CASE WHEN unicode(c) >= 97 THEN unicode(c)-87
      |                 ELSE unicode(c)-48 END),
      |          (a,b) -> a*16+b) % 1009 AS INT) AS b
      |       FROM g),
      |tc AS (SELECT b, count(*) AS t_cnt FROM gb WHERE lang = 'en'
      |       GROUP BY 1),
      |rc AS (SELECT b, count(*) AS r_cnt FROM gb GROUP BY 1),
      |db AS (SELECT doc_id, b, count(*) AS dcnt FROM gb GROUP BY 1,2),
      |terms AS (SELECT doc_id,
      |           dcnt * (ln(coalesce(t_cnt,0)+1) - ln(r_cnt+1)) AS term,
      |           dcnt, dcnt*coalesce(t_cnt,0) AS st, dcnt*r_cnt AS sr
      |          FROM db JOIN rc USING (b) LEFT JOIN tc USING (b)),
      |agg AS (SELECT doc_id,
      |         CAST(sum(dcnt) AS INT) AS n_feats,
      |         CAST(sum(st) AS BIGINT) AS sum_tgt,
      |         CAST(sum(sr) AS BIGINT) AS sum_raw,
      |         list_reduce(list_sort(list(term)), (a,b) -> a+b) AS s
      |        FROM terms GROUP BY doc_id)
      |SELECT doc_id, n_feats, sum_tgt, sum_raw,
      |  floor((s + n_feats*(ln((SELECT count(*) FROM gb) + 1009)
      |               - ln((SELECT count(*) FROM gb WHERE lang='en') + 1009)))
      |        * 10000 + 0.5) / 10000 AS dsir_logw
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---------- URL normalization (web-crawl provenance) ----------

  /** URL parsing + normalization — the provenance step of a web-crawl
    * corpus (dedup by registrable domain, group by host, strip
    * tracking params). Deterministic URLs are synthesized from the
    * document columns, then GENUINELY parsed back with `parse_url`
    * (host / path / a named query param) and normalized (lowercase,
    * `www.` stripped, registrable domain = last two labels). The
    * oracle re-derives the same fields with string ops, so a parser
    * divergence hash-mismatches. Narrow per-row work; at 100 TB the
    * registrable domain becomes the dedup/grouping key that bounds
    * per-site volume. */
  def qUrlParse(s: SparkSession, dir: String): DataFrame = {
    val url = concat(lit("https://WWW."), col("source"),
      lit(".Example.COM/docs/"), col("doc_id").cast("string"),
      lit("?lang="), col("lang"), lit("&utm_source=feed&q=1"))
    t(s, dir, "documents")
      .withColumn("url", url)
      .select(
        col("doc_id"),
        lower(parse_url(col("url"), lit("HOST"))).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("lang"))
          .as("lang_param"),
        regexp_replace(
          lower(parse_url(col("url"), lit("HOST"))),
          "^www\\.", "").as("norm_host"))
      .withColumn("reg_domain",
        regexp_extract(col("norm_host"), "([a-z0-9-]+\\.[a-z]+)$", 1))
      .orderBy("doc_id")
  }

  val qUrlParseOracle: String =
    """SELECT doc_id,
      |  'www.' || source || '.example.com' AS host,
      |  '/docs/' || doc_id AS path,
      |  lang AS lang_param,
      |  source || '.example.com' AS norm_host,
      |  'example.com' AS reg_domain
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------- PII redaction ----------

  private val EmailRe = "[a-z0-9.]+@[a-z0-9.]+"
  private val PhoneRe = "555-[0-9]{4}"

  /** Regex PII redaction — scrub emails/phone numbers before a corpus
    * ships. The synthetic corpus contains no PII, so each doc is
    * extended with DETERMINISTIC planted PII (one email, doc_id % 3
    * phone numbers) and the operator counts and redacts it; the oracle
    * replays the planting and the redaction, so the two regex engines
    * (java.util.regex vs DuckDB's RE2) are pinned to agree on these
    * pattern classes. Purely narrow — zero shuffles, the scan is the
    * cost. */
  def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com"),
      repeat(concat(lit(" call 555-"),
        lpad(col("doc_id").cast("string"), 4, "0")),
        (col("doc_id") % 3).cast("int")))
    val redacted = regexp_replace(
      regexp_replace(planted, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    t(s, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(planted, lit(EmailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(planted, lit(PhoneRe), lit(0)))
          .as("n_phones"),
        md5(redacted).as("redacted_md5"))
      .orderBy("doc_id")
  }

  val qPiiRedactOracle: String =
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@example.com' ||
       |    repeat(' call 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0'),
       |           CAST(doc_id % 3 AS INT)) AS planted
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(planted, '$EmailRe')) AS INT)
       |    AS n_emails,
       |  CAST(len(regexp_extract_all(planted, '$PhoneRe')) AS INT)
       |    AS n_phones,
       |  md5(regexp_replace(regexp_replace(planted, '$EmailRe', '<EMAIL>',
       |                                    'g'),
       |                     '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM p ORDER BY doc_id""".stripMargin

  // ---------- Composed training-prep pipeline ----------

  /** The whole corpus→training-batches pipeline as ONE query —
    * cluster-dedup, decontaminate, chunk, pack, composed end-to-end
    * the way a data release actually runs them, and replayed whole by
    * the DuckDB oracle so every stage interaction is hash-checked:
    *
    *   1. keep one doc per near-dup CLUSTER ([[dedupClusters]] keep);
    *   2. drop benchmark docs and contaminated docs
    *      ([[qDecontaminate]] verdicts);
    *   3. chunk survivors into context windows ([[chunkify]]);
    *   4. pack chunks into token-budget batches (sharded streaming
    *      fill, ordered by a chunk-level content hash).
    *
    * Stage ORDER is the scale argument: dedup+decontamination run on
    * documents (cheap keys), chunking multiplies rows only for
    * SURVIVORS, and packing shuffles only chunk-size metadata — the
    * same filters-shrink-the-expensive-stage point
    * `pipeline_corpus_clean` measures for cleaning. */
  def pipelineTrainPrep(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // ONE materialized shingle pass feeds BOTH signature stages
    // (cluster edges and benchmark overlap) — calling dedupClusters +
    // qDecontaminate as black boxes would shingle the corpus twice
    // more; at 100 TB the corpus passes are the pipeline's cost.
    val sh = TextOps.shingles(docs).localCheckpoint()
    Ckpt.track("pipeline_train_prep", sh)
    val edges = TextOps.jaccardJoin(sh, 0.2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val keepers = connectedComponents(
      docs.select(col("doc_id").as("id")), edges)
      .where(col("id") === col("label")).select(col("id").as("doc_id"))
    val benchSh = sh.where(col("doc_id") % 97 === 0)
      .select(col("shingle")).distinct()
    val contaminated = sh.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(benchSh), "shingle")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
      .join(sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh")),
        "doc_id")
      .where(col("n_overlap") / col("n_sh").cast("double") >= 0.5)
      .select("doc_id")
    val survivors = docs.select("doc_id", "text")
      .where(col("doc_id") % 97 =!= 0) // benchmark docs never train
      .join(keepers, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
    val chunks = chunkify(survivors)
      .withColumn("shard", col("doc_id") % PackShards)
      .withColumn("ord", md5(concat(col("doc_id").cast("string"),
        lit("#"), col("chunk_id").cast("string"))))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord"), col("doc_id"), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("cum", sum(col("n_tokens").cast("bigint")).over(w))
      .withColumn("batch_id",
        floor((col("cum") - col("n_tokens")) / lit(PackBudget))
          .cast("bigint"))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("shard"), col("batch_id"))
      .orderBy("doc_id", "chunk_id")
  }

  val pipelineTrainPrepOracle: String =
    "WITH RECURSIVE " + TextOps.shinglePairsCte + ",\n" +
      s"""edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)
         |        >= 0.2),
         |sym AS (SELECT src, dst FROM edges
         |        UNION SELECT dst, src FROM edges),
         |reach AS (
         |  SELECT doc_id AS node, doc_id AS lab FROM documents
         |  UNION
         |  SELECT s.dst AS node, r.lab FROM reach r
         |  JOIN sym s ON s.src = r.node),
         |keepers AS (
         |  SELECT node AS doc_id FROM reach
         |  GROUP BY node HAVING node = min(lab)),
         |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |ov AS (
         |  SELECT t.doc_id, count(*) AS n_overlap
         |  FROM sh t JOIN bench b ON t.sh = b.sh
         |  WHERE t.doc_id % 97 <> 0 GROUP BY 1),
         |clean AS (
         |  SELECT d.doc_id FROM documents d
         |  LEFT JOIN sizes s ON s.doc_id = d.doc_id
         |  LEFT JOIN ov o ON o.doc_id = d.doc_id
         |  WHERE d.doc_id % 97 <> 0
         |    AND NOT coalesce(
         |          o.n_overlap / CAST(s.n_sh AS DOUBLE) >= 0.5, false)),
         |surv AS (
         |  SELECT d.doc_id, string_split(d.text, ' ') AS ws
         |  FROM documents d
         |  JOIN keepers k ON k.doc_id = d.doc_id
         |  JOIN clean c ON c.doc_id = d.doc_id),
         |ch AS (
         |  SELECT doc_id, ws,
         |    unnest(range(0, (len(ws) + ${ChunkStride - 1})
         |                    // $ChunkStride)) AS chunk_id
         |  FROM surv),
         |sized AS (
         |  SELECT doc_id, chunk_id,
         |    CAST(len(list_slice(ws, chunk_id * $ChunkStride + 1,
         |      chunk_id * $ChunkStride + $ChunkLen)) AS INT) AS n_tokens,
         |    doc_id % $PackShards AS shard,
         |    md5(doc_id || '#' || chunk_id) AS ord
         |  FROM ch),
         |cum AS (
         |  SELECT doc_id, chunk_id, n_tokens, shard,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard
         |      ORDER BY ord, doc_id, chunk_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum
         |  FROM sized)
         |SELECT doc_id, chunk_id, n_tokens, shard,
         |  (cum - n_tokens) // $PackBudget AS batch_id
         |FROM cum ORDER BY doc_id, chunk_id""".stripMargin

  // ---------- Column masking ----------

  /** Column-level masking next to [[qPiiRedact]]'s regex scrubbing:
    * the `mask()` builtin (upper→X, lower→x, digit→n, symbols kept)
    * and the show-last-4 partial mask every PII policy wants for
    * account-number-like fields. Narrow, codegen'd, trivially
    * mirrored by the oracle's regex chain — the value is having the
    * policy AS an operator instead of ad-hoc per-pipeline regexes. */
  def qDataMask(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        expr("mask(c_name)").as("masked_full"),
        concat(repeat(lit("*"), length(col("c_name")) - 4),
          substring(col("c_name"), -4, 4)).as("masked_last4"))
      .orderBy("c_custkey")

  val qDataMaskOracle: String =
    """SELECT c_custkey,
      |  regexp_replace(regexp_replace(regexp_replace(c_name,
      |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
      |    AS masked_full,
      |  repeat('*', length(c_name) - 4) ||
      |    substring(c_name, length(c_name) - 3, 4) AS masked_last4
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------- Registry ----------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_clusters" -> dedupClusters,
    "q_cluster_canonical" -> qClusterCanonical,
    "q_cluster_incremental" -> qClusterIncremental,
    "q_cluster_delete" -> qClusterDelete,
    "dedup_incremental" -> dedupIncremental,
    "pipeline_train_prep" -> pipelineTrainPrep,
    "q_decontaminate" -> qDecontaminate,
    "q_chunk_docs" -> qChunkDocs,
    "q_pack_sequences" -> qPackSequences,
    "q_length_buckets" -> qLengthBuckets,
    "q_sample_stratified" -> qSampleStratified,
    "q_domain_mix" -> qDomainMix,
    "q_dsir_weights" -> qDsirWeights,
    "q_dataset_split" -> qDatasetSplit,
    "q_fuzzy_match" -> qFuzzyMatch,
    "q_triangle_count" -> qTriangleCount,
    "q_pagerank" -> qPageRank,
    "q_pagerank_directed" -> qPageRankDirected,
    "q_pagerank_personalized" -> qPageRankPersonalized,
    "q_url_parse" -> qUrlParse,
    "q_data_mask" -> qDataMask,
    "q_pii_redact" -> qPiiRedact)

  def oracles: Map[String, String] = Map(
    "dedup_clusters" -> dedupClustersOracle,
    "q_cluster_canonical" -> qClusterCanonicalOracle,
    "q_cluster_incremental" -> qClusterIncrementalOracle,
    "q_cluster_delete" -> qClusterDeleteOracle,
    "dedup_incremental" -> dedupIncrementalOracle,
    "pipeline_train_prep" -> pipelineTrainPrepOracle,
    "q_decontaminate" -> qDecontaminateOracle,
    "q_chunk_docs" -> qChunkDocsOracle,
    "q_pack_sequences" -> qPackSequencesOracle,
    "q_length_buckets" -> qLengthBucketsOracle,
    "q_sample_stratified" -> qSampleStratifiedOracle,
    "q_domain_mix" -> qDomainMixOracle,
    "q_dsir_weights" -> qDsirWeightsOracle,
    "q_dataset_split" -> qDatasetSplitOracle,
    "q_fuzzy_match" -> qFuzzyMatchOracle,
    "q_triangle_count" -> qTriangleCountOracle,
    // q_pagerank: iterative fixpoint not SQL-expressible → rows-only;
    // CurationSpec pins closed forms + an in-memory replay.
    "q_url_parse" -> qUrlParseOracle,
    "q_data_mask" -> qDataMaskOracle,
    "q_pii_redact" -> qPiiRedactOracle)
}
