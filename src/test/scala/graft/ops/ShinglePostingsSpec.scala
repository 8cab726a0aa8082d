package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Falsifiability net for the persisted shingle-postings index — the
  * substrate [[Curation.dedupIncremental]] and
  * [[Curation.qClusterIncremental]] probe instead of re-shingling the
  * corpus from text: merged index ≡ from-text recompute, sizes
  * consistent with postings, ingest replay idempotence behind the
  * manifest pointer, and the probe view's epoch self-exclusion. */
class ShinglePostingsSpec extends SparkSpec {

  test("merged postings+sizes across epochs equal a from-text " +
    "recompute; replaying an epoch's ingest is idempotent; the probe " +
    "view self-excludes the probing epoch") {
    import SparkSpec.spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e"),
      (2L, "a b c x y"),
      (3L, "p q r s t"),
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e"),
      (20L, "m n o p"),
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-postings-spec").toString
    try {
      TextOps.buildShinglePostingsTo(TextOps.shingles(corpus), idx)
      TextOps.ingestShinglePostings(TextOps.shingles(batch), idx, 1L)

      def posted(): Set[(Long, String)] =
        Tables.readBucketedArchive(spark, s"$idx/postings")
          .select(col("doc_id"), col("shingle")).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
      val expect = TextOps.shingles(corpus.unionByName(batch)).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(posted() == expect,
        "merged postings diverge from a from-text recompute")

      // sizes ride alongside and must agree with the postings exactly
      val sizes = Tables.readManifested(spark, s"$idx/sizes")
        .select(col("doc_id"), col("n_sh")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expectSizes = expect.groupBy(_._1).view
        .mapValues(_.size.toLong).toMap
      assert(sizes == expectSizes, s"size table diverged: $sizes")

      // replay: identical rows swap in behind a new manifest version
      TextOps.ingestShinglePostings(TextOps.shingles(batch), idx, 1L)
      assert(posted() == expect, "epoch replay changed the index")

      // the probe at epoch 1 must see ONLY the corpus layer (a
      // crash-replay must not match its own previous partial commit)
      val probe = TextOps.readShinglePostings(spark, idx, 1L).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val corpusOnly = TextOps.shingles(corpus).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(probe == corpusOnly,
        "probe view leaked the probing epoch's own rows")
      // while a probe at a LATER epoch consumes epoch 1's commit
      val probe2 = TextOps.readShinglePostings(spark, idx, 2L).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(probe2 == expect,
        "a later epoch's probe must see every prior commit")
    } finally {
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
    }
  }

  test("the daily probe join arrives with the postings side " +
    "pre-partitioned: bucketed scan, one exchange (batch side only)") {
    import graft.SparkSpec.spark.implicits._
    val corpus = (1 to 40).map(i =>
      (i.toLong, s"w$i x$i y$i z$i q$i")).toDF("doc_id", "text")
    val batch = (100 to 110).map(i =>
      (i.toLong, s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    val idx = java.nio.file.Files
      .createTempDirectory("graft-postings-plan").toString
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      TextOps.buildShinglePostingsTo(TextOps.shingles(corpus), idx)
      // broadcast + AQE off: the LAYOUT must carry the plan — this is
      // the batch-outgrows-broadcast fallback the bucketing exists for
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val probe = TextOps.shingles(batch)
        .select(col("doc_id").as("b_id"), col("shingle"))
        .join(TextOps.readShinglePostings(spark, idx, excludeEpoch = 1L),
          "shingle")
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"),
        s"postings scan is not bucketed:\n$plan")
      // exactly ONE exchange to the join's bucket partitioning — the
      // batch side's; the archive subtree must contribute none (the
      // batch substrate's internal distinct exchange is allowed, it
      // is batch-sized)
      assert(raw"Exchange hashpartitioning\(shingle#\d+, 16\)".r
        .findAllIn(plan).size == 1,
        s"probe must shuffle ONLY the batch side to the buckets:\n$plan")
      probe.count() // and it executes
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(idx))
    }
  }
}
