package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-only access to `private[ops]` members for specs that live in
  * other packages (PlanSpec asserts on plans of internal views). */
object CurationTestBridge {

  /** The postings-index probe view exactly as the daily incremental
    * paths read it (epoch 1 self-excluded), for partition-pruning
    * plan assertions. */
  def postingsProbePlan(s: SparkSession, dir: String): DataFrame =
    TextOps.readShinglePostings(s, Curation.clusterIndex(s, dir),
      excludeEpoch = 1L)
}
