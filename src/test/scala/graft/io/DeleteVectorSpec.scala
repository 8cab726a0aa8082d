package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for deletion vectors + file-local tombstone retirement
  * ([[Tables.computeDeletionVectors]] /
  * [[Tables.retireTombstonesFileLocal]]):
  *
  *  - ANSWER: the physical post-retirement state (read with NO mask)
  *    equals the pre-retirement masked view, row for row;
  *  - COST: the retirement's bytes-landed-on-disk are ≥5× below the
  *    whole-partition fold's on an identical sparse-victim twin
  *    fixture — the reason the verb exists;
  *  - REPLAY/CARRY: tombstone keys living in the newest (still
  *    crash-replayable) epoch are carried, so a replay that
  *    recomputes that epoch from source stays masked;
  *  - SIDECAR: built at delete time and consumed by the retirement
  *    when current; a stale sidecar (commits landed after the build)
  *    degrades to a scan, never to wrong rows;
  *  - VACUUM: the file-granular sweep keeps carried sibling files
  *    live while reclaiming the superseded victim originals;
  *  - COMPACTION: a fragmented (file-ref) entry collapses back to a
  *    single dir and the data survives.
  */
class DeleteVectorSpec extends SparkSpec {

  import spark.implicits._

  private def snap(df: DataFrame): Set[Seq[Any]] =
    df.select(col("doc_id"), col("body"), col("grp"),
        col("ingest_epoch").cast("long"))
      .collect().map(_.toSeq.toVector: Seq[Any]).toSet

  /** Base epoch: ids 0-3199 range-clustered into 16 files; epoch 1:
    * ids 10000-10399 in 2 files. */
  private def buildFixture(root: String): (String, String) = {
    val p = s"$root/arch"
    val tomb = s"$root/tomb"
    val base = (0L until 3200L).map(i => (i, s"d$i", i % 7))
      .toDF("doc_id", "body", "grp")
      .repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("ingest_epoch", lit(0L))
    Tables.writeManifested(base, p, Seq("ingest_epoch"))
    Tables.upsertManifested(
      (10000L until 10400L).map(i => (i, s"d$i", i % 7))
        .toDF("doc_id", "body", "grp")
        .repartitionByRange(2, col("doc_id"))
        .withColumn("ingest_epoch", lit(1L)),
      p, Seq("ingest_epoch"), _ == "ingest_epoch=1")
    (p, tomb)
  }

  private def dirBytes(p: String): Long = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
  }

  test("retirement: physical state == masked view; sidecar used; " +
    "bytes written >= 5x below the whole-partition fold on the " +
    "identical twin; carry masks a newest-epoch replay; vacuum and " +
    "compaction keep the answer") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-dv-spec").toString
    val (p, tomb) = buildFixture(root)
    val twinRoot = java.nio.file.Files
      .createTempDirectory("graft-dv-twin").toString
    val (tp, ttomb) = buildFixture(twinRoot)

    // sparse victims: one narrow band (lives in 1 of the 16 base
    // files) + one newest-epoch doc (exercises the carry rule)
    val victims = ((100L until 150L) :+ 10005L).toDF("doc_id")
    Tables.ingestTombstones(victims, tomb, epoch = 2L)
    Tables.ingestTombstones(victims, ttomb, epoch = 2L)
    assert(Tables.computeDeletionVectors(spark, p, tomb, "doc_id") >= 2L,
      "DV sidecar must cover the base victim file AND the epoch-1 file")

    val preMasked = snap(Tables.minusTombstones(
      Tables.readManifested(spark, p), tomb, "doc_id"))
    val preBytes = dirBytes(s"$p/data")
    val r = Tables.retireTombstonesFileLocal(spark, p, tomb, "doc_id")
    val retireWrote = dirBytes(s"$p/data") - preBytes
    assert(r.mode == "retired" && r.usedSidecar,
      s"expected a sidecar-driven retirement, got $r")
    // ANSWER: physical rows (no mask) == the masked view before
    val physical = snap(Tables.readManifested(spark, p))
    assert(physical == preMasked,
      "file-local retirement changed the answer")
    assert(!physical.exists(_.head == 120L) &&
      !physical.exists(_.head == 10005L) &&
      physical.exists(_.head == 99L))

    // COST: the whole-partition fold on the identical twin lands
    // >= 5x the bytes on disk (the ShuffleVolumeSpec discipline
    // applied to write IO)
    val twinPre = dirBytes(s"$tp/data")
    Tables.foldManifestedEpochs(spark, tp, ttomb, "doc_id")
    val twinWrote = dirBytes(s"$tp/data") - twinPre
    assert(retireWrote > 0 && twinWrote > 0)
    assert(retireWrote * 5 <= twinWrote,
      s"file-local retirement landed $retireWrote B, the whole fold " +
        s"$twinWrote B — expected >=5x separation")
    assert(r.filesRewritten > 0 && r.filesCarried > 0 &&
      r.filesRewritten < r.filesCarried,
      s"sparse victims must touch a minority of files: $r")
    assert(r.bytesRewritten < r.bytesCarried, s"byte split wrong: $r")

    // REPLAY/CARRY: 10005 lived in the newest epoch -> its tombstone
    // carried; a crash-replay that recommits epoch 1 from source
    // (including 10005) stays masked
    val tombNow = Tables.readTombstones(spark, tomb, "doc_id")
      .map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
    assert(tombNow == Set(10005L),
      s"only the newest-epoch victim may carry, got $tombNow")
    Tables.upsertManifested(
      (10000L until 10400L).map(i => (i, s"d$i", i % 7))
        .toDF("doc_id", "body", "grp")
        .withColumn("ingest_epoch", lit(1L)),
      p, Seq("ingest_epoch"), _ == "ingest_epoch=1")
    assert(Tables.minusTombstones(
        Tables.readManifested(spark, p), tomb, "doc_id")
      .where(col("doc_id") === 10005L).isEmpty,
      "newest-epoch replay resurrected a retired delete")

    // VACUUM: the file-granular sweep keeps the live read intact
    // (carried sibling files survive; superseded victim originals go)
    val before = snap(Tables.minusTombstones(
      Tables.readManifested(spark, p), tomb, "doc_id"))
    Tables.vacuumManifested(spark, p)
    assert(snap(Tables.minusTombstones(
      Tables.readManifested(spark, p), tomb, "doc_id")) == before,
      "vacuum broke the live read over file-ref entries")

    // COMPACTION: fragmented entries collapse back to single dirs
    Tables.compactManifested(spark, p, 256L << 20)
    val (_, parts) = Tables.resolveManifest(spark, p)
    assert(parts.values.forall(v => Tables.entryPaths(v).size == 1),
      s"compaction left fragmented entries: $parts")
    assert(snap(Tables.minusTombstones(
      Tables.readManifested(spark, p), tomb, "doc_id")) == before,
      "compaction over file-ref entries changed the data")
  }

  test("stale sidecar (commits after the DV build) degrades to a " +
    "scan, never to wrong rows; clear-only retirement retires " +
    "rowless tombstones under the carry rule") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-dv-stale").toString
    val (p, tomb) = buildFixture(root)
    // DV built against an EMPTY tombstone set is a no-op
    assert(Tables.computeDeletionVectors(spark, p, tomb, "doc_id") == 0L)

    Tables.ingestTombstones(Seq(200L, 201L).toDF("doc_id"),
      tomb, epoch = 2L)
    Tables.computeDeletionVectors(spark, p, tomb, "doc_id")
    // the archive moves on AFTER the build: epoch 2 re-ingests 200
    // (a new file the sidecar has never seen)
    Tables.upsertManifested(
      Seq((200L, "fresh", 3L)).toDF("doc_id", "body", "grp")
        .withColumn("ingest_epoch", lit(2L)),
      p, Seq("ingest_epoch"), _ == "ingest_epoch=2")
    val preMasked = snap(Tables.minusTombstones(
      Tables.readManifested(spark, p), tomb, "doc_id"))
    val r = Tables.retireTombstonesFileLocal(spark, p, tomb, "doc_id")
    assert(!r.usedSidecar,
      "a sidecar that predates the newest commit must not be trusted")
    val physical = snap(Tables.readManifested(spark, p))
    assert(physical == preMasked,
      "stale-sidecar fallback produced wrong rows")
    assert(!physical.exists(_.head == 200L),
      "the post-build re-ingest of a tombstoned key survived")

    // clear-only: tombstone keys that have no physical rows at all
    Tables.ingestTombstones(Seq(999999L).toDF("doc_id"), tomb, epoch = 3L)
    val r2 = Tables.retireTombstonesFileLocal(spark, p, tomb, "doc_id")
    assert(r2.mode == "clear_only" && r2.bytesRewritten == 0L)
    assert(Tables.readTombstones(spark, tomb, "doc_id")
      .forall(_.isEmpty), "rowless tombstones must clear")
  }
}
