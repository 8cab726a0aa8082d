package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for 100 TB-scale shuffles.
  *
  * A hot key (one user with 10⁸ events, one platform value on every
  * fact row — the reference's literal `dim_platform_id='spotify'`
  * stamp, songs-etl `cf_transform/main.py:148`, is EXACTLY such a key)
  * turns a keyed shuffle into one straggler task. Two standard
  * rewrites, both semantics-preserving:
  *
  *   - salted two-phase aggregation: groupBy(key, salt) partial →
  *     groupBy(key) final. Spark's own partial aggregation already
  *     handles most of this; explicit salting covers aggregates where
  *     map-side combine can't reduce (e.g. exact count_distinct over
  *     a hot key) by spreading ONE key's state across N reducers.
  *   - salted broadcast-free join: replicate the small side N× (one
  *     copy per salt), salt the big side randomly — a hot key's rows
  *     spread over N tasks instead of one.
  *
  * AQE's skewedJoin handles sort-merge-join skew automatically at
  * runtime; these helpers are for the aggregation case and for when
  * the optimizer must be forced (documented escape hatch).
  */
object Skew {

  /** Two-phase salted aggregation: `agg` must be decomposable
    * (sum/count/min/max — anything with a merge step). Phase 1
    * aggregates (keys, salt), phase 2 merges the N partials per key.
    *
    * `partials` maps output column name → (phase-1 agg of an input
    * column, phase-2 merge of the partial column).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[(String, (Column, Column => Column))]): DataFrame = {
    require(partials.nonEmpty, "saltedAgg needs at least one aggregate")
    // monotonically_increasing_id already carries the partition id in
    // its upper bits, so it alone spreads a hot key across salts
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2._1.as(s"__p_${partials.head._1}"),
        partials.tail.map { case (n, (a, _)) => a.as(s"__p_$n") }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(
        partials.head._2._2(col(s"__p_${partials.head._1}"))
          .as(partials.head._1),
        partials.tail.map { case (n, (_, m)) =>
          m(col(s"__p_$n")).as(n)
        }: _*)
  }

  /** Salted equi-join for a skewed LEFT side: the right (dim) side is
    * replicated `salts`× via explode, the left side gets a random salt
    * in [0, salts), and the join key becomes (key, salt) — a hot key's
    * rows land on `salts` reducers instead of one. Inner/left joins
    * only (replication would duplicate right-side no-match rows under
    * right/full). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val bigSalted = big.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val smallReplicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallReplicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
