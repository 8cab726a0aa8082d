package graft.expr

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, tie1 ASC,
  * tie2 ASC) entries per group and emits them best-first as
  * `array<struct<score double, tie1 bigint, tie2 bigint>>`.
  *
  * This is the 100 TB formulation of per-group top-k. The windowed
  * `row_number() <= k` idiom (q_topk_per_group) must shuffle EVERY row
  * to its group's partition and sort the whole group; this aggregate
  * runs under ObjectHashAggregate with map-side partial aggregation,
  * so only k rows per (group × input partition) cross the shuffle and
  * nothing is ever globally sorted — the same plan shape that makes
  * `TakeOrderedAndProject` the right global top-k. State is a k-entry
  * sorted array (k is small by definition of top-k), so update is a
  * short-circuited linear insert and merge is k inserts.
  *
  * Null handling follows AGGREGATE semantics (like min/max): rows with
  * a null score or tie key are ignored. The windowed row_number()
  * formulation instead ranks null scores NULLS LAST — so row-for-row
  * equivalence with it holds on null-free input (which the driver
  * fixtures are); on nullable input, filter nulls upstream or expect
  * groups with fewer than k non-null rows to emit fewer rows here.
  * NaN scores rank GREATEST, matching Spark's sort order.
  */
case class TopKAgg(
    k: Int,
    score: Expression,
    tie1: Expression,
    tie2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long, Long)]] {

  require(k > 0 && k <= 1024, s"top-k bound out of range: $k")

  override def children: Seq[Expression] = score :: tie1 :: tie2 :: Nil
  override def nullable: Boolean = false

  // fail at analysis time, not with a runtime ClassCastException in
  // update(), when a caller binds the wrong column types
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (score.dataType == DoubleType && tie1.dataType == LongType &&
        tie2.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_agg expects (double, bigint, bigint) inputs, got " +
        s"(${score.dataType.simpleString}, ${tie1.dataType.simpleString}, " +
        s"${tie2.dataType.simpleString})")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("tie1", LongType, nullable = false),
    StructField("tie2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_agg"

  /** a strictly beats b in (score DESC, tie1 ASC, tie2 ASC) order.
    * Scores compare via java.lang.Double.compare so NaN sorts GREATEST
    * — matching Spark's sort order for the windowed formulation;
    * primitive > would make NaN inclusion arrival-order-dependent
    * (both > and == are false for NaN). -0.0 is normalized to 0.0 at
    * insert time, so Double.compare's -0.0 < 0.0 never surfaces. */
  private def beats(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long, Long)] =
    new ArrayBuffer[(Double, Long, Long)](k + 1)

  private def insert(buf: ArrayBuffer[(Double, Long, Long)],
                     e: (Double, Long, Long)): Unit = {
    if (buf.length == k && !beats(e, buf.last)) return // worse than worst
    var i = 0
    while (i < buf.length && beats(buf(i), e)) i += 1
    buf.insert(i, e)
    if (buf.length > k) buf.remove(k)
  }

  override def update(buf: ArrayBuffer[(Double, Long, Long)],
                      input: InternalRow): ArrayBuffer[(Double, Long, Long)] = {
    val s = score.eval(input)
    val t1 = tie1.eval(input)
    val t2 = tie2.eval(input)
    if (s != null && t1 != null && t2 != null) {
      val sc = s.asInstanceOf[Double]
      // fold -0.0 into 0.0 (Spark normalizes floats before comparisons)
      insert(buf, (if (sc == 0.0) 0.0 else sc,
        t1.asInstanceOf[Long], t2.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long, Long)],
                     other: ArrayBuffer[(Double, Long, Long)]): ArrayBuffer[(Double, Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long, Long)]): Any =
    new GenericArrayData(buf.map { case (s, t1, t2) =>
      InternalRow(s, t1, t2)
    }.toArray[Any])

  override def serialize(buf: ArrayBuffer[(Double, Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 24)
    bb.putInt(buf.length)
    buf.foreach { case (s, t1, t2) =>
      bb.putDouble(s); bb.putLong(t1); bb.putLong(t2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new ArrayBuffer[(Double, Long, Long)](n + 1)
    var i = 0
    while (i < n) {
      out += ((bb.getDouble(), bb.getLong(), bb.getLong()))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), tie1 = newChildren(1), tie2 = newChildren(2))
}

object TopKAgg {
  /** `topk_agg(k, score, tie1, tie2)`: the k best (score DESC, tie1
    * ASC, tie2 ASC) entries of the group, best-first. */
  def topK(k: Int, score: Column, tie1: Column, tie2: Column): Column =
    Columns.of(TopKAgg(k, Columns.expr(score), Columns.expr(tie1),
      Columns.expr(tie2)).toAggregateExpression())
}
