package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Positional deletion vectors on the BUCKETED layout
  * ([[Tables.computeBucketedDeletionVectors]] /
  * [[Tables.readBucketedArchiveMasked]]) — the manifested DV story
  * extended to the archives that are largest at 100 TB:
  *
  *  - IDENTITY: the DV-masked read is row-identical to the key-mask
    *  read ([[Tables.minusTombstones]]), across epochs and files;
  *  - STEADY-STATE PLAN: with the sidecar covering both tombstone
  *    lanes, the masked read plans NO key anti-join — the mask is a
  *    broadcast of (victim file → sorted positions) probed by a
  *    codegen'd binary search;
  *  - FRESH-TOMBSTONE OVERLAY: tombstones landed after the build are
  *    key-masked on top (correctness first), and the plan shows the
  *    anti-join again;
  *  - DIGEST STALENESS: ANY file change — an epoch ingest, a fold's
  *    staged swap — changes the live-file digest and the masked read
  *    degrades to the key mask (staleness costs the fast path, never
  *    rows); a rebuild restores it;
  *  - VACUUM: superseded `_dvb` dirs are retained until
  *    [[Tables.sweepBucketedScratch]], which keeps exactly the
  *    current pointer's dir.
  */
class BucketedDvSpec extends SparkSpec {

  import spark.implicits._

  private def mkFixture(tag: String): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft-dvb-$tag").toString
    val p = s"$root/arch"
    val tomb = s"$root/tomb"
    val rows = (0L until 400L).map(i => (i, s"d$i", i % 5, 0L))
      .toDF("k", "body", "grp", "ingest_epoch")
    Tables.writeBucketedArchive(rows, p, "k", buckets = 4)
    Tables.ingestBucketedArchive(
      (400L until 500L).map(i => (i, s"d$i", i % 5))
        .toDF("k", "body", "grp"),
      p, epoch = 1L)
    (p, tomb)
  }

  private def hasLeftAnti(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("LeftAnti")

  private def cnt(df: DataFrame): Long = df.count()

  test("identity + steady-state plan: DV-masked rows equal the key " +
    "mask, with no anti-join in the covered plan") {
    val (p, tomb) = mkFixture("steady")
    Tables.ingestTombstones(
      Seq(3L, 13L, 450L).toDF("k"), tomb, Tables.DeleteEpochBase)
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    val masked = Tables.readBucketedArchiveMasked(spark, p, tomb, "k")
    val keyMask = Tables.minusTombstones(
      Tables.readBucketedArchive(spark, p), tomb, "k")
    assert(cnt(masked) === 497L)
    assert(masked.select("k").exceptAll(keyMask.select("k")).isEmpty &&
      keyMask.select("k").exceptAll(masked.select("k")).isEmpty,
      "DV mask and key mask must be row-identical")
    assert(!hasLeftAnti(masked),
      "covered steady state must not plan a key anti-join")
    assert(masked.queryExecution.executedPlan.toString
      .toLowerCase.contains("sortedarraycontains") ||
      masked.queryExecution.optimizedPlan.toString
        .toLowerCase.contains("sorted_array_contains"),
      "the positional probe must be the binary-search expression")
  }

  test("fresh tombstones after the build are key-masked on top; a " +
    "rebuild returns to the positional-only plan") {
    val (p, tomb) = mkFixture("fresh")
    Tables.ingestTombstones(Seq(7L).toDF("k"), tomb,
      Tables.DeleteEpochBase)
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    // a later delete epoch the sidecar does not cover
    Tables.ingestTombstones(Seq(8L, 9L).toDF("k"), tomb,
      Tables.DeleteEpochBase + 1L)
    val masked = Tables.readBucketedArchiveMasked(spark, p, tomb, "k")
    assert(cnt(masked) === 497L,
      "uncovered tombstones must still mask (by key)")
    assert(hasLeftAnti(masked),
      "the delete-after-DV window must key-mask the fresh tombstones")
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    val again = Tables.readBucketedArchiveMasked(spark, p, tomb, "k")
    assert(cnt(again) === 497L && !hasLeftAnti(again),
      "a rebuild must restore the positional-only plan")
  }

  test("digest staleness: an epoch ingest and a fold both degrade to " +
    "the key mask — correct rows either way; rebuild restores") {
    val (p, tomb) = mkFixture("stale")
    Tables.ingestTombstones(Seq(5L, 415L).toDF("k"), tomb,
      Tables.DeleteEpochBase)
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    assert(!hasLeftAnti(
      Tables.readBucketedArchiveMasked(spark, p, tomb, "k")))
    // an epoch ingest changes files WITHOUT touching tombstones: the
    // digest no longer matches and the positions may be wrong — the
    // read must fall back to the key mask
    Tables.ingestBucketedArchive(
      Seq((500L, "d500", 0L)).toDF("k", "body", "grp"), p, epoch = 2L)
    val afterIngest = Tables.readBucketedArchiveMasked(spark, p, tomb, "k")
    assert(cnt(afterIngest) === 499L,
      "post-ingest masked read must stay correct")
    assert(hasLeftAnti(afterIngest),
      "a stale digest must degrade to the key mask")
    // rebuild: fast path again, and the fold's staged swap degrades
    // it once more across the version boundary
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    assert(!hasLeftAnti(
      Tables.readBucketedArchiveMasked(spark, p, tomb, "k")))
    Tables.foldBucketedEpochs(spark, p, tomb, "k")
    // the fold retired the tombstones physically — the masked read
    // equals the plain read now, whatever path it takes
    val afterFold = Tables.readBucketedArchiveMasked(spark, p, tomb, "k")
    assert(cnt(afterFold) === 499L)
    assert(cnt(Tables.readBucketedArchive(spark, p)) === 499L)
  }

  test("vacuum: superseded _dvb dirs retained until the sweep, which " +
    "keeps exactly the current pointer's dir") {
    val (p, tomb) = mkFixture("vac")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Tables.ingestTombstones(Seq(2L).toDF("k"), tomb,
      Tables.DeleteEpochBase)
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    val dir1 = Tables.bucketedDeletionVectors(spark, p).get.dir
    Tables.computeBucketedDeletionVectors(spark, p, tomb, "k")
    val dir2 = Tables.bucketedDeletionVectors(spark, p).get.dir
    assert(dir2 !== dir1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir1)),
      "the superseded mask dir must survive the pointer flip")
    Tables.sweepBucketedScratch(spark, p)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir1)),
      "the sweep must reclaim the superseded mask dir")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir2)),
      "the sweep must keep the current pointer's dir")
  }
}
