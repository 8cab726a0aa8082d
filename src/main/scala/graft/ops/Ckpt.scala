package graft.ops

import org.apache.spark.sql.{DataFrame, GraftColumnBridge}

/** One LIVE set of eagerly-checkpointed inputs per query slot.
  *
  * `localCheckpoint()` is EAGER: the cached RDD exists from the call
  * onward and must outlive the RETURNED plan (which references it), so
  * a query can't unpersist its own checkpoints before returning.
  * Left alone they accumulate — bench's median-of-3 × warm-ups leaked
  * a corpus copy per invocation and the block-manager pressure showed
  * up as a 1.3→1.9 s drift on the queries that ran after the leakers.
  * The discipline here is [[graft.ops.ScaleOps]]'s SnapshotDir applied
  * to cache: each invocation registers its checkpoints under a slot
  * key and releases the PREVIOUS invocation's (dead by then — the
  * driver executes gated queries sequentially). A DataFrame returned
  * by an earlier invocation fails loudly on re-evaluation (its
  * truncated lineage can't recompute), exactly like SnapshotDir's
  * deleted directories — never silently recomputes stale data. */
private[graft] object Ckpt {
  private val prev =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  /** Deterministically free a localCheckpoint'ed frame's blocks.
    * `Dataset.unpersist` is a NO-OP for checkpoints (it only uncaches
    * CacheManager plans; the blocks belong to the RDD inside the
    * LogicalRDD leaf) — the bridge unpersists that RDD directly, so
    * release happens now, not at the ContextCleaner's leisure. */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpointed(df)

  def track(key: String, dfs: DataFrame*): Unit = {
    // Disjointness assert (the bridge's exclusivity contract):
    // releasing a slot frees EVERY LogicalRDD leaf under its plans, so
    // a checkpoint leaf shared with a frame tracked under a DIFFERENT
    // live slot would have its in-use blocks freed by whichever slot
    // cycles first. No current call site shares leaves — this makes a
    // future one fail loudly at track time instead of corrupting reads.
    val ids = GraftColumnBridge.checkpointedRddIds _
    val mine = dfs.flatMap(ids(_)).toSet
    prev.forEach { (k, olds) =>
      if (k != key) {
        val shared = olds.flatMap(ids(_)).toSet.intersect(mine)
        require(shared.isEmpty, s"Ckpt slot '$key' shares checkpointed " +
          s"RDDs ${shared.mkString(",")} with live slot '$k' — releasing " +
          "either slot would free blocks the other still reads")
      }
    }
    val old = prev.put(key, dfs)
    if (old != null) old.foreach(release)
  }
}
