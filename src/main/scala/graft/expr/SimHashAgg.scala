package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash aggregate over per-token 64-bit hashes.
  *
  * Buffer = 64 signed counters; each input hash adds +1 to counter b
  * when bit b is set, −1 otherwise; the final value sets bit b iff
  * counter b > 0 — the standard SimHash construction (Charikar 2002).
  *
  * Exists as a custom aggregate instead of 64 `sum(when(...))`
  * columns because the 64-wide aggregation buffer dominated the plan:
  * Janino has to compile a giant generated aggregate (seconds of
  * compile time per query) and every row pays 64 branchy column
  * updates. Here the per-row update is one tight 64-iteration loop
  * over an int array, running under ObjectHashAggregate with map-side
  * partial aggregation intact — one 256-byte buffer per doc crosses
  * the shuffle, which is the shape that holds at 100 TB.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < 64) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](64)
    ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** `simhash_agg(h)`: 64-bit SimHash of a group of 64-bit hashes. */
  def simhash(h: Column): Column =
    Columns.of(SimHashAgg(Columns.expr(h)).toAggregateExpression())
}
