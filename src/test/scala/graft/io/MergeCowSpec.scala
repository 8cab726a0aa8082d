package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE ([[Tables.mergeIntoManifested]]):
  *
  *  - IDENTITY: one merge commit produces exactly the recomputed
  *    merged state — updates replace, deletes drop, inserts append,
  *    a cross-partition move leaves ONE copy in the NEW partition;
  *  - copy-on-write is REAL: untouched partitions are carried into
  *    the new manifest with byte-identical entry strings (no
  *    rewrite, no IO), and the report counts match;
  *  - a batch of only-unmatched deletes touches nothing — the live
  *    manifest version does not move;
  *  - the Bloom sidecar feeds the WRITE path: touched-partition
  *    discovery through [[Tables.readManifestedPointLookup]] commits
  *    the same result as the plain full-scan discovery.
  */
class MergeCowSpec extends SparkSpec {

  /** 400 keys over 8 `g=` partitions, key k in partition g{k%8}. */
  private def mkArchive(): (String, DataFrame) = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-mergecow-s").toString
    val p = s"$root/arch"
    val df = (0L until 400L).map(i => (i, i * 10, s"g${i % 8}"))
      .toDF("k", "v", "g")
    Tables.writeManifested(df, p, Seq("g"))
    (p, df)
  }

  private def norm(df: DataFrame): DataFrame =
    df.select(col("k").cast("long"), col("v").cast("long"), col("g"))

  private def changes(): DataFrame = {
    import spark.implicits._
    // updates: k%40==0 stay in-partition, v += 1; moves: k%40==1
    // migrate to g7 with v = -k; deletes: k%40==2; inserts: fresh
    // keys 9000..9004 into g0
    val upd = (0L until 400L by 40L).map(k => (k, k * 10 + 1, s"g${k % 8}", false))
    val mov = (1L until 400L by 40L).map(k => (k, -k, "g7", false))
    val del = (2L until 400L by 40L).map(k => (k, 0L, s"g${k % 8}", true))
    val ins = (9000L until 9005L).map(k => (k, k, "g0", false))
    (upd ++ mov ++ del ++ ins).toDF("k", "v", "g", "_deleted")
  }

  /** The expected post-merge state, recomputed flat. */
  private def expected(base: DataFrame): DataFrame = {
    val chg = changes()
    val live = chg.where(!col("_deleted")).drop("_deleted")
    base.join(chg.select("k"), Seq("k"), "left_anti")
      .unionByName(norm(live))
  }

  test("merge identity: updates, deletes, cross-partition moves and " +
    "inserts in one commit; no duplicate keys after a move") {
    val (p, base) = mkArchive()
    val rep = Tables.mergeIntoManifested(spark, p, changes(), "k",
      Seq("g"), deletedCol = Some("_deleted"))
    val got = norm(Tables.readManifested(spark, p))
    val want = norm(expected(base))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "merged snapshot diverges from the recomputed state")
    assert(got.groupBy("k").count().where(col("count") > 1).count() == 0,
      "a key appears twice after the merge (move left its old copy)")
    assert(rep.version == 2L, s"one merge = one commit: $rep")
  }

  test("copy-on-write: untouched partitions carry byte-identical " +
    "manifest entries; the report counts rewrites vs carries") {
    val (p, _) = mkArchive()
    val before = Tables.resolveManifest(spark, p)._2
    val rep = Tables.mergeIntoManifested(spark, p, changes(), "k",
      Seq("g"), deletedCol = Some("_deleted"))
    val after = Tables.resolveManifest(spark, p)._2
    // touched: g0 (upd k=0,40,… all %8==0 → g0; ins), g1 (mov away),
    // g2 (del), g7 (mov in). Wait: k%40==0 → k%8==0 → g0; k%40==1 →
    // g1; k%40==2 → g2. So untouched: g3, g4, g5, g6.
    val untouched = Seq("g=g3", "g=g4", "g=g5", "g=g6")
    untouched.foreach { part =>
      assert(after.get(part) == before.get(part),
        s"$part was rewritten by a merge that never touched it")
    }
    assert(rep.rewrittenPartitions == 4L && rep.carriedPartitions == 4L,
      s"expected 4 rewritten / 4 carried: $rep")
  }

  test("only-unmatched deletes touch nothing: the manifest version " +
    "does not move") {
    import spark.implicits._
    val (p, _) = mkArchive()
    val v0 = Tables.resolveManifest(spark, p)._1
    val rep = Tables.mergeIntoManifested(spark, p,
      Seq((77777L, 0L, "g0", true)).toDF("k", "v", "g", "_deleted"),
      "k", Seq("g"), deletedCol = Some("_deleted"))
    assert(rep.rewrittenPartitions == 0L && rep.version == v0,
      s"an unmatched delete must be a no-op commit: $rep")
    assert(Tables.resolveManifest(spark, p)._1 == v0)
  }

  test("Bloom-assisted touched-partition discovery commits the same " +
    "state as the plain full-scan discovery") {
    val (pPlain, base) = mkArchive()
    val (pBloom, _) = mkArchive()
    Tables.computeFileBlooms(spark, pBloom, "k",
      expectedItemsPerFile = 256L, fpp = 0.01)
    assert(Tables.fileBlooms(spark, pBloom).nonEmpty)
    Tables.mergeIntoManifested(spark, pPlain, changes(), "k",
      Seq("g"), deletedCol = Some("_deleted"))
    Tables.mergeIntoManifested(spark, pBloom, changes(), "k",
      Seq("g"), deletedCol = Some("_deleted"))
    val a = norm(Tables.readManifested(spark, pPlain))
    val b = norm(Tables.readManifested(spark, pBloom))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "bloom-assisted merge diverges from plain merge")
    assert(b.exceptAll(norm(expected(base))).isEmpty)
  }

  test("write-conflict detection: a COW commit from a stale snapshot " +
    "refuses loudly when a partition it rewrites drifted; writers on " +
    "disjoint partitions both land") {
    import spark.implicits._
    val (p, _) = mkArchive() // v1
    // writer A lands v2, rewriting g0
    Tables.mergeIntoManifested(spark, p,
      Seq((0L, 999L, "g0", false)).toDF("k", "v", "g", "_deleted"),
      "k", Seq("g"), deletedCol = Some("_deleted"))
    assert(Tables.resolveManifest(spark, p)._1 == 2L)
    // writer B computed from v1 and ALSO rewrites g0 — committing
    // would replace A's entry with a rewrite that never saw A's row
    intercept[Tables.ConcurrentWriteException] {
      Tables.mergeIntoManifested(spark, p,
        Seq((8L, 111L, "g0", false)).toDF("k", "v", "g", "_deleted"),
        "k", Seq("g"), deletedCol = Some("_deleted"),
        expectedBase = Some(1L))
    }
    intercept[Tables.ConcurrentWriteException] {
      Tables.updateManifested(spark, p,
        col("k") === 8L, Map("v" -> lit(111L)), Seq("g"),
        expectedBase = Some(1L))
    }
    // A's change must have survived both refusals
    assert(Tables.readManifested(spark, p)
      .where(col("k") === 0L && col("v") === 999L).count() == 1L)
    // a writer from the SAME stale snapshot touching only g3 is
    // disjoint from A's commit — it lands, and A's change survives
    Tables.updateManifested(spark, p,
      col("k") === 3L, Map("v" -> lit(-3L)), Seq("g"),
      expectedBase = Some(1L))
    val live = Tables.readManifested(spark, p)
    assert(live.where(col("k") === 3L && col("v") === -3L).count() == 1L)
    assert(live.where(col("k") === 0L && col("v") === 999L).count() == 1L)
    // re-running the refused statement WITHOUT the stale base (a
    // fresh snapshot) succeeds — the documented resolution
    Tables.updateManifested(spark, p,
      col("k") === 8L, Map("v" -> lit(111L)), Seq("g"))
    assert(Tables.readManifested(spark, p)
      .where(col("k") === 8L && col("v") === 111L).count() == 1L)
  }

  test("path-escaped partition values round-trip through the COW " +
    "rewrite: a ':' in the partition value neither duplicates nor " +
    "resurrects rows") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-mergecow-esc").toString
    val p = s"$root/arch"
    // 'a:b' path-escapes to 'a%3Ab' in the directory name — a raw
    // touched-key ('g=a:b') would never match the manifest entry, so
    // the pre-update dir would carry by reference and its rows
    // resurrect as duplicates
    val df = (0L until 20L).map(i =>
      (i, i, if (i < 10) "a:b" else "plain")).toDF("k", "v", "g")
    Tables.writeManifested(df, p, Seq("g"))
    Tables.updateManifested(spark, p,
      col("g") === "a:b", Map("v" -> lit(-1L)), Seq("g"))
    val got = Tables.readManifested(spark, p)
    assert(got.count() == 20L,
      s"COW rewrite of an escaped partition duplicated rows: " +
        s"${got.count()}")
    assert(got.where(col("g") === "a:b" && col("v") =!= -1L)
      .count() == 0L, "pre-update rows resurrected")
    // and through a MERGE change batch landing in the escaped part
    Tables.mergeIntoManifested(spark, p,
      Seq((100L, 100L, "a:b")).toDF("k", "v", "g"), "k", Seq("g"))
    val after = Tables.readManifested(spark, p)
    assert(after.count() == 21L && after.where(col("k") === 100L)
      .count() == 1L)
    assert(after.where(col("g") === "a:b" && col("v") =!= -1L &&
      col("k") =!= 100L).count() == 0L)
  }
}
