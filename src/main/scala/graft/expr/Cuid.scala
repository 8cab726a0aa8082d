package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Nondeterministic surrogate-key generator — the engine's analog of
  * the reference's per-row `Cuid(length=10).generate()`
  * (songs-etl `cf_create_playlists_dimension/main.py:25,77`).
  *
  * Format fidelity: 'c' + (length-1) base-36 chars. Like the built-in
  * `uuid()`, re-executes per task attempt — acceptable under
  * truncate-load snapshot semantics (SURVEY.md §7.4-4); keys are not
  * stable across runs in the reference either. Seeded per (seed,
  * partition) so a run is reproducible given fixed partitioning but
  * collision-resistant across partitions.
  */
case class Cuid(length: Int, seed: Long)
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def stateful: Boolean = true

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed * 31 + partitionIndex)

  private val digits = "0123456789abcdefghijklmnopqrstuvwxyz"

  override protected def evalInternal(input: InternalRow): Any = {
    val sb = new java.lang.StringBuilder(length)
    sb.append('c')
    var i = 1
    while (i < length) { sb.append(digits.charAt(rng.nextInt(36))); i += 1 }
    UTF8String.fromString(sb.toString)
  }

}

object Cuid {
  /** Column API: `df.withColumn("dim_id", Cuid.cuid())`.
    *
    * The default seed is drawn fresh on the driver per call site, so
    * two cuid() columns (or the three dimension builds) never emit
    * the same key stream — with a shared constant seed, row i of
    * partition p would receive IDENTICAL surrogates in every
    * dimension. Pass an explicit seed only when a run must be
    * reproducible, and then a distinct one per expression. */
  def cuid(length: Int = 10): Column =
    graft.expr.Columns.of(Cuid(length, scala.util.Random.nextLong()))

  def cuid(length: Int, seed: Long): Column =
    graft.expr.Columns.of(Cuid(length, seed))
}
