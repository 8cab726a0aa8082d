package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Commit history ([[Tables.manifestHistory]]): structural diffs per
  * retained version; vacuum prunes history, pins preserve it; a
  * copy-on-write merge surfaces as exactly its touched partitions
  * changed; a clone's first version is all-external. */
class HistorySpec extends SparkSpec {

  test("create / rewrite / merge show their structural shapes; " +
    "vacuum prunes history but keeps the pinned version") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-history-s").toString
    val p = s"$root/arch"
    val df = (0L until 200L).map(i => (i, i * 2, s"g${i % 4}"))
      .toDF("k", "v", "g")
    Tables.writeManifested(df, p, Seq("g"))                     // v1
    Tables.upsertManifested(df.where(col("g") === "g1"),
      p, Seq("g"), _ == "g=g1")                                 // v2
    Tables.mergeIntoManifested(spark, p,                        // v3
      Seq((0L, 999L, "g0", false), (1L, 999L, "g1", false))
        .toDF("k", "v", "g", "_d"),
      "k", Seq("g"), deletedCol = Some("_d"))
    val hist = Tables.manifestHistory(spark, p)
    assert(hist.columns.contains("commit_ts"),
      "history must carry the commit instant (TIMESTAMP AS OF's map)")
    val h = hist.drop("commit_ts")
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // v1: 4 partitions, all added
    assert(h(0).getLong(1) == 4L && h(0).getLong(2) == 4L)
    // v2: g1 rewritten in place — one changed, nothing added/removed
    assert(h(1).getLong(2) == 0L && h(1).getLong(3) == 0L &&
      h(1).getLong(4) == 1L, s"rewrite row: ${h(1)}")
    // v3: the merge touched g0 and g1 — exactly two changed
    assert(h(2).getLong(4) == 2L && h(2).getLong(2) == 0L,
      s"merge row: ${h(2)}")

    // a clone's history starts all-external
    val dst = s"$root/dst"
    val pin = Tables.cloneManifested(spark, p, dst)
    val hc = Tables.manifestHistory(spark, dst)
      .drop("commit_ts").collect()
    assert(hc.length == 1 && hc(0).getLong(5) == hc(0).getLong(1),
      s"clone v1 must be all-external: ${hc.toSeq}")

    // vacuum prunes: keep latest + the pinned v3 (pin points at the
    // version the clone read, which IS the latest here — so pin v1
    // explicitly via a second clone after another commit)
    Tables.upsertManifested(df.where(col("g") === "g2"),
      p, Seq("g"), _ == "g=g2")                                 // v4
    Tables.vacuumManifested(spark, p)
    val after = Tables.manifestHistory(spark, p)
      .select("version").collect().map(_.getLong(0)).toSet
    assert(after == Set(3L, 4L),
      s"vacuum must keep the live v4 and the pinned v3: $after")
    Tables.releaseClonePin(spark, p, pin)
    Tables.vacuumManifested(spark, p)
    assert(Tables.manifestHistory(spark, p)
      .select("version").collect().map(_.getLong(0)).toSet == Set(4L))
  }
}
