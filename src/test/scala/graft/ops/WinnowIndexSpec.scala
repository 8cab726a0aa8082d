package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Tables

/** Lifecycle contract of the incremental winnowing fingerprint index
  * (the `dedup_incremental`/`sim_ann_incremental` discipline applied
  * to fingerprint dedup): the archive layer is built once, batches
  * commit under their own ingest epochs, and the MERGED index is
  * indistinguishable from a full rebuild — so probing it tomorrow
  * sees exactly what recomputing the corpus would. Runs on a PRIVATE
  * temp index so the shared per-dir index the gated query serves from
  * stays untouched. */
class WinnowIndexSpec extends SparkSpec {

  private def freshIdx(): String = java.nio.file.Files
    .createTempDirectory("graft-winnow-spec-index").toString

  private def selectedSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("wmin")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("merged index (build + ingested batch epoch) equals a full " +
    "rebuild of the whole corpus") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val idx = freshIdx()
    TextOps.buildWinnowIndexTo(docs.where(col("doc_id") % 10 =!= 0), idx)
    TextOps.ingestFingerprints(
      docs.where(col("doc_id") % 10 === 0), idx, epoch = 1L)
    val merged = selectedSet(
      Tables.readManifested(spark, s"$idx/fingerprints"))
    val rebuilt = selectedSet(TextOps.winnowSelected(docs)
      .select(col("doc_id"), col("wmin")).distinct())
    assert(merged == rebuilt,
      "epoch-merged fingerprints must equal recomputing the full corpus")
    // the epoch split is real: archive rows in 0, batch rows in 1
    // partition-column read-back infers INT — normalize to long
    val byEpoch = Tables.readManifested(spark, s"$idx/fingerprints")
      .groupBy(col("ingest_epoch").cast("long").as("epoch"))
      .agg(min(col("doc_id") % 10).as("lo"), max(col("doc_id") % 10).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byEpoch(0L)._1 >= 1L, "epoch 0 holds only archive docs")
    assert(byEpoch(1L) == ((0L, 0L)), "epoch 1 holds only batch docs")
  }

  test("ingest replay is idempotent: re-committing the same epoch " +
    "leaves the readable index identical") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val idx = freshIdx()
    TextOps.buildWinnowIndexTo(docs.where(col("doc_id") % 10 =!= 0), idx)
    val batch = docs.where(col("doc_id") % 10 === 0)
    TextOps.ingestFingerprints(batch, idx, epoch = 1L)
    val before = selectedSet(
      Tables.readManifested(spark, s"$idx/fingerprints"))
    TextOps.ingestFingerprints(batch, idx, epoch = 1L) // crash-replay
    val after = selectedSet(
      Tables.readManifested(spark, s"$idx/fingerprints"))
    assert(after == before,
      "a replayed epoch must replace itself with identical rows")
  }
}
