package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Bloom filter aggregate over per-row 64-bit key hashes — the
  * build side of file-level POINT-LOOKUP skipping
  * ([[graft.io.Tables.computeFileBlooms]]).
  *
  * Buffer = a `numBits` bitset as packed longs; each input hash sets
  * its [[BloomAgg.bitPositions]] bits; merge is word-wise OR; the
  * final value is the bitset's bytes. Exists as a custom aggregate
  * because the public `DataFrameStatFunctions.bloomFilter` builds ONE
  * filter for a whole DataFrame — per-FILE filters need a grouped
  * aggregate, and this one runs under ObjectHashAggregate with
  * map-side partial aggregation intact, so what crosses the shuffle
  * is one bitset per file, not the rows.
  *
  * The membership probe ([[BloomAgg.mightContain]]) shares
  * [[BloomAgg.bitPositions]] — build and probe can never disagree on
  * the hashing scheme, and the probe side feeds it the SAME
  * `xxhash64` values Spark computed (a tiny hash job over the sought
  * keys), so there is no driver-side reimplementation of the row
  * hash to drift.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && (numBits & 63) == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits >>> 6)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val pos = BloomAgg.bitPosition(h, i, numBits)
        buf(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var w = 0
    while (w < buf.length) { buf(w) |= other(w); w += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length >>> 3)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg =
    copy(child = newChildren.head)
}

object BloomAgg {

  /** `bloom_agg(h)`: Bloom bitset (as bytes) of a group of 64-bit
    * key hashes. */
  def bloom(h: Column, numBits: Int, numHashes: Int): Column =
    Columns.of(
      BloomAgg(Columns.expr(h), numBits, numHashes).toAggregateExpression())

  /** Kirsch–Mitzenmacher double hashing: the i-th probe position is
    * `h1 + i·h2 mod numBits`, with h2 derived from the same 64-bit
    * input by an odd-constant mix (golden-ratio multiplier) so the
    * two streams are decorrelated. One shared definition for build
    * (executor, inside the aggregate) and probe (driver, against the
    * sidecar) — the scheme cannot drift between the two. */
  private[graft] def bitPosition(h: Long, i: Int, numBits: Int): Int = {
    val h2 = java.lang.Long.rotateLeft(h, 31) * 0x9E3779B97F4A7C15L | 1L
    // force non-negative before the modulo (Long.MinValue-safe)
    (((h + i * h2) & Long.MaxValue) % numBits).toInt
  }

  /** Driver-side membership probe against a serialized bitset.
    * False positives at the configured rate; never false negative
    * for a hash the build saw. */
  private[graft] def mightContain(bloom: Array[Byte], h: Long,
                                  numHashes: Int): Boolean = {
    val numBits = bloom.length << 3
    val lb = ByteBuffer.wrap(bloom).asLongBuffer()
    var i = 0
    while (i < numHashes) {
      val pos = bitPosition(h, i, numBits)
      if ((lb.get(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Standard Bloom sizing: bits for `n` expected items at false-
    * positive rate `fpp`, rounded up to a multiple of 64 (whole
    * words); and the matching optimal hash count. */
  private[graft] def bitsFor(n: Long, fpp: Double): Int = {
    require(n > 0 && fpp > 0.0 && fpp < 1.0)
    val ln2sq = math.log(2) * math.log(2)
    val raw = math.ceil(-n * math.log(fpp) / ln2sq).toLong
    val words = math.max(1L, (raw + 63) >>> 6)
    math.min(words, 1L << 24).toInt * 64 // cap at 128 MB of bits
  }

  private[graft] def hashesFor(numBits: Int, n: Long): Int =
    math.max(1, math.round(numBits.toDouble / n * math.log(2)).toInt)
}
