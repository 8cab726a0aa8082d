package graft.io

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Zero-copy clone ([[Tables.cloneManifested]] / retention pins):
  *
  *  - a clone reads the source's snapshot WITHOUT copying a byte
  *    (no clone-local data dir exists until the first write);
  *  - full divergence both ways: writes to either side are invisible
  *    to the other;
  *  - the pin makes source vacuum SAFE: after the source rewrites a
  *    partition the clone references and vacuums, the clone still
  *    reads the original rows; releasing the pin hands those dirs to
  *    the next vacuum (and the clone's read then fails loudly, not
  *    partially);
  *  - clone-side vacuum never touches source files;
  *  - compaction materializes external references into clone-local
  *    dirs — after it, the clone survives source vacuum with no pin.
  */
class ClonePinSpec extends SparkSpec {

  private def mkSrc(): (String, String, DataFrame) = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-clone-s").toString
    val src = s"$root/src"
    val df = (0L until 300L).map(i => (i, i * 3, s"g${i % 3}"))
      .toDF("k", "v", "g")
    // several files per partition so compaction has something to do
    Tables.writeManifested(df.repartition(4), src, Seq("g"))
    (root, src, df)
  }

  private def norm(df: DataFrame): DataFrame =
    df.select(col("k").cast("long"), col("v").cast("long"), col("g"))

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit =
    assert(norm(a).exceptAll(norm(b)).isEmpty &&
      norm(b).exceptAll(norm(a)).isEmpty, hint)

  test("clone reads the snapshot with zero bytes copied, and " +
    "diverges from the source in both directions") {
    import spark.implicits._
    val (root, src, df) = mkSrc()
    val dst = s"$root/dst"
    Tables.cloneManifested(spark, src, dst)
    assertSame(Tables.readManifested(spark, dst),
      Tables.readManifested(spark, src), "clone != source snapshot")
    assert(!new java.io.File(s"$dst/data").exists(),
      "a zero-copy clone must not have copied data files")

    // diverge the CLONE: new partition g9
    Tables.upsertManifested(
      (900L until 910L).map(i => (i, i, "g9")).toDF("k", "v", "g"),
      dst, Seq("g"), _ == "g=g9")
    // diverge the SOURCE: replace g0 with doubled values
    Tables.upsertManifested(
      df.where(col("g") === "g0").withColumn("v", col("v") * 2),
      src, Seq("g"), _ == "g=g0")

    val cl = Tables.readManifested(spark, dst)
    assert(cl.where(col("g") === "g9").count() == 10L)
    assertSame(cl.where(col("g") === "g0"),
      df.where(col("g") === "g0"),
      "source's g0 rewrite leaked into the clone")
    assert(Tables.readManifested(spark, src)
      .where(col("g") === "g9").count() == 0L,
      "clone's g9 insert leaked into the source")
  }

  test("the pin keeps the referenced version across source vacuum; " +
    "releasing it reclaims, and the clone then fails loudly") {
    import spark.implicits._
    val (root, src, df) = mkSrc()
    val dst = s"$root/dst"
    val pin = Tables.cloneManifested(spark, src, dst)
    // source rewrites g1 (the clone still references v1's g1) and
    // vacuums: without the pin, v1's manifest and its g1 dir would go
    Tables.upsertManifested(
      df.where(col("g") === "g1").withColumn("v", lit(-1L)),
      src, Seq("g"), _ == "g=g1")
    Tables.vacuumManifested(spark, src)
    assertSame(Tables.readManifested(spark, dst).where(col("g") === "g1"),
      df.where(col("g") === "g1"),
      "pinned version's g1 was vacuumed under the clone")

    // release: the next vacuum reclaims v1-only dirs; the clone's
    // read is now LOUD (missing path), never a silent partial table
    Tables.releaseClonePin(spark, src, pin)
    Tables.vacuumManifested(spark, src)
    val ex = intercept[Exception] {
      Tables.readManifested(spark, dst).where(col("g") === "g1").count()
    }
    assert(ex != null)
    // unknown pin ids are loud too
    intercept[IllegalArgumentException] {
      Tables.releaseClonePin(spark, src, "pin-nope")
    }
  }

  test("clone-side vacuum never touches source files; compaction " +
    "materializes the clone so it survives source vacuum unpinned") {
    import spark.implicits._
    val (root, src, df) = mkSrc()
    val dst = s"$root/dst"
    val pin = Tables.cloneManifested(spark, src, dst)
    // a local write + vacuum on the CLONE: external refs are not
    // local paths, so the sweep reclaims only clone-local garbage
    Tables.upsertManifested(
      (900L until 905L).map(i => (i, i, "g9")).toDF("k", "v", "g"),
      dst, Seq("g"), _ == "g=g9")
    Tables.vacuumManifested(spark, dst)
    assertSame(Tables.readManifested(spark, src),
      df.withColumn("v", col("v")), // src untouched
      "clone vacuum damaged the source")

    // materialize: huge targetBytes → every >1-file partition
    // rewrites into ONE clone-local file; entries stop referencing
    // the source
    Tables.compactManifested(spark, dst, targetBytes = 1L << 30)
    val entries = Tables.resolveManifest(spark, dst)._2.values
    assert(entries.forall(!_.contains("::")),
      s"compaction left external references: $entries")
    // with nothing referencing the source, release + vacuum there —
    // the materialized clone keeps answering
    Tables.releaseClonePin(spark, src, pin)
    Tables.upsertManifested(
      df.where(col("g") === "g0").withColumn("v", lit(0L)),
      src, Seq("g"), _ == "g=g0")
    Tables.vacuumManifested(spark, src)
    val cl = Tables.readManifested(spark, dst)
    assert(cl.where(col("g") === "g9").count() == 5L)
    assertSame(cl.where(col("g") === "g0"),
      df.where(col("g") === "g0"),
      "materialized clone lost the original g0 rows")
  }
}
