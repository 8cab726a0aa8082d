package graft.ops

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** The persisted token-postings (ranked-retrieval) index behind
  * `q_bm25_indexed` ([[TextOps.buildTokenIndexTo]]): the shared hash
  * oracle with `q_bm25_topk` holds only if the index round-trip is
  * LOSSLESS and the epoch/tombstone lifecycle preserves it — this spec
  * pins indexed ≡ from-text, merged-ingest ≡ one-shot build, replay
  * idempotence, and the tombstone identity (masked retrieval ≡
  * from-text over the corpus minus the deleted docs, collection stats
  * included). */
class TokenIndexSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.toString
  }

  private def ranking(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "doc_id", "score", "rn")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq.sorted

  private def postingsOf(idx: String) =
    Tables.readBucketedArchive(spark, s"$idx/postings")
      .select("doc_id", "token", "tf")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet

  private def doclenOf(idx: String) =
    Tables.readManifested(spark, s"$idx/doclen")
      .select("doc_id", "dl")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  test("indexed BM25 equals the from-text ranking exactly — the " +
    "shared-oracle safety case") {
    val idx = tmp("graft-tokidx-eq")
    TextOps.buildTokenIndexTo(docs, idx)
    assert(ranking(TextOps.bm25IndexedFrom(spark, idx)) ==
      ranking(TextOps.qBm25Topk(spark, sf)))
  }

  test("two-epoch ingest merges to exactly the one-shot build " +
    "(postings AND doc lengths)") {
    val batch = docs.where(col("doc_id") % 3 === 0)
    val base = docs.where(col("doc_id") % 3 =!= 0)
    val inc = tmp("graft-tokidx-inc")
    TextOps.buildTokenIndexTo(base, inc)
    TextOps.ingestTokenIndex(batch, inc, epoch = 1L)
    val full = tmp("graft-tokidx-full")
    TextOps.buildTokenIndexTo(docs, full)
    assert(postingsOf(inc) == postingsOf(full))
    assert(doclenOf(inc) == doclenOf(full))
    // and the merged index serves the identical ranking
    assert(ranking(TextOps.bm25IndexedFrom(spark, inc)) ==
      ranking(TextOps.qBm25Topk(spark, sf)))
  }

  test("replaying an epoch's ingest changes nothing (replace-or-add)") {
    val batch = docs.where(col("doc_id") % 3 === 0)
    val idx = tmp("graft-tokidx-replay")
    TextOps.buildTokenIndexTo(docs.where(col("doc_id") % 3 =!= 0), idx)
    TextOps.ingestTokenIndex(batch, idx, epoch = 1L)
    val before = postingsOf(idx)
    TextOps.ingestTokenIndex(batch, idx, epoch = 1L) // crash-replay
    assert(postingsOf(idx) == before)
    assert(ranking(TextOps.bm25IndexedFrom(spark, idx)) ==
      ranking(TextOps.bm25IndexedFrom(spark, idx)))
  }

  test("epoch compaction folds tombstones physically and is invisible " +
    "to retrieval: masked-view ranking ≡ post-fold ranking, deleted " +
    "docs are physically gone, epochs collapse to {base, newest}") {
    val idx = tmp("graft-tokidx-fold")
    val e1 = docs.where(col("doc_id") % 3 === 0) // newest (replayable)
    TextOps.buildTokenIndexTo(docs.where(col("doc_id") % 3 =!= 0), idx)
    TextOps.ingestTokenIndex(e1, idx, 1L)
    val e1Ids = e1.select("doc_id").collect().map(_.getLong(0)).toSet
    // tombstone the top doc of every query — some land in the folded
    // base, some may land in the carried newest epoch
    val victims = TextOps.bm25IndexedFrom(spark, idx)
      .where(col("rn") === 1).select("doc_id").distinct()
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    Tables.ingestTombstones(victims, s"$idx/tombstones", epoch = 2L)
    val masked = ranking(TextOps.bm25IndexedFrom(spark, idx))
    assert(TextOps.compactTokenIndexEpochs(spark, idx) == 1L)
    // fold is invisible to retrieval
    assert(ranking(TextOps.bm25IndexedFrom(spark, idx)) == masked)
    // base-layer victims are PHYSICALLY gone; newest-epoch victims
    // stay physical (the epoch is still crash-replayable) but masked
    val rawIds = Tables.readBucketedArchive(spark, s"$idx/postings")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(victimIds.diff(e1Ids).intersect(rawIds).isEmpty)
    // epochs collapse to {base, newest}
    // partition-column values are type-inferred on read → cast
    val epochs = Tables.readBucketedArchive(spark, s"$idx/postings")
      .select(col("ingest_epoch").cast("long")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(epochs.subsetOf(Set(0L, 1L)))
    // exactly the newest-epoch victims keep their tombstones (a
    // replay of epoch 1 would otherwise resurrect them)
    val liveTombs = Tables.readTombstones(spark, s"$idx/tombstones",
      "doc_id").map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    assert(liveTombs == victimIds.intersect(e1Ids))
  }

  test("tombstoned docs drop out of ranking AND collection stats: " +
    "masked retrieval ≡ from-text over the corpus minus the deleted") {
    val idx = tmp("graft-tokidx-tomb")
    TextOps.buildTokenIndexTo(docs, idx)
    // delete the top-ranked doc of every query — the strongest case:
    // the head of each ranking must vanish and every df/avgdl-derived
    // score beneath it must shift consistently on both sides
    val victims = TextOps.bm25IndexedFrom(spark, idx)
      .where(col("rn") === 1).select("doc_id").distinct()
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    assert(victimIds.nonEmpty)
    Tables.ingestTombstones(victims, s"$idx/tombstones", epoch = 1L)
    val masked = ranking(TextOps.bm25IndexedFrom(spark, idx))
    assert(masked.forall { case (_, id, _, _) => !victimIds.contains(id) })
    val fromText = ranking(TextOps.bm25TopkOf(spark,
      docs.where(!col("doc_id").isInCollection(victimIds))))
    assert(masked == fromText)
  }
}
