package graft.ops

import graft.SparkSpec

/** Pins the one property Ckpt exists for: releasing a slot actually
  * frees the localCheckpoint's persisted blocks NOW. A regression to
  * plain `Dataset.unpersist` is invisible to every functional test
  * (results stay correct) — it only shows up as block-manager bloat
  * across a long bench run — so the spec checks the persistent-RDD
  * registry directly. */
class CkptSpec extends SparkSpec {

  test("release frees a localCheckpoint's persisted RDD immediately " +
    "(Dataset.unpersist alone would leave it behind)") {
    import spark.implicits._
    def liveCheckpointRdds(): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet

    val before = liveCheckpointRdds()
    val df = (1 to 100).toDF("x").localCheckpoint()
    df.count()
    val added = liveCheckpointRdds() -- before
    assert(added.nonEmpty, "localCheckpoint registered no persisted RDD")

    // the documented failure mode: Dataset.unpersist is a no-op for
    // checkpoint blocks (it only uncaches CacheManager plans)
    df.unpersist(blocking = true)
    assert((liveCheckpointRdds() -- before) == added,
      "Dataset.unpersist released the checkpoint — bridge now redundant")

    Ckpt.release(df)
    assert((liveCheckpointRdds() -- before).isEmpty,
      "Ckpt.release left the checkpoint's RDD persisted")
  }

  test("release on a DERIVED frame still frees the checkpoint it pins " +
    "(projection over the LogicalRDD leaf — the silent-leak case)") {
    import spark.implicits._
    def live(): Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = live()
    val df = (1 to 100).toDF("x").localCheckpoint()
    df.count()
    assert((live() -- before).nonEmpty)
    // previously this fell through to the Dataset.unpersist no-op and
    // the checkpoint leaked for the JVM lifetime; the bridge now walks
    // the plan for LogicalRDD leaves
    Ckpt.release(df.select(org.apache.spark.sql.functions.col("x") * 2))
    assert((live() -- before).isEmpty,
      "releasing a derived frame leaked the underlying checkpoint")
  }

  test("track asserts cross-slot disjointness: a checkpoint leaf shared " +
    "with another live slot fails at track time, not as a freed-block " +
    "read later") {
    import spark.implicits._
    val shared = (1 to 100).toDF("x").localCheckpoint()
    shared.count()
    try {
      Ckpt.track("ckptspec-slot-a", shared)
      val e = intercept[IllegalArgumentException](
        Ckpt.track("ckptspec-slot-b", shared.select(
          org.apache.spark.sql.functions.col("x") + 1)))
      assert(e.getMessage.contains("ckptspec-slot-a"),
        "the assert must name the conflicting live slot")
      // same-slot re-track of the same frame stays legal (release+replace)
      Ckpt.track("ckptspec-slot-a", shared)
    } finally {
      // drain the slot so this spec leaves no live checkpoint behind
      Ckpt.track("ckptspec-slot-a",
        spark.emptyDataFrame.localCheckpoint())
    }
  }
}
