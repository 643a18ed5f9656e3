package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash fingerprint as ONE native aggregate: per group, count the
  * set bits of every 60-bit token hash and emit the sign-of-majority
  * fingerprint (bit j set iff strictly more than half the tokens have
  * bit j set — identical arithmetic to the declarative 60-column
  * formulation it replaces, and to the DuckDB oracle's ±1-vote SUM:
  * v = 2·popcount_j − n > 0 ⇔ 2·popcount_j > n).
  *
  * Why imperative: the declarative shape needs 61 separate SUM columns
  * (one per bit + the count), i.e. 61 agg-buffer slots updated per
  * input row and a 60-term bit-reassembly projection after the
  * aggregate. Here the whole per-group state is one primitive
  * long[61] buffer updated in a tight JIT'd loop, the shuffle moves
  * one 488-byte blob per (group × map partition) as a partial state,
  * and eval() folds it straight to the fingerprint. Runs under
  * ObjectHashAggregateExec — same map-side partial aggregation and
  * hash-shuffle scaling as any declarative agg.
  */
case class SimHashAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val Bits = 60

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_agg needs a BIGINT token hash, got ${child.dataType.simpleString}")

  // buffer layout: [n, popcount(bit 0), …, popcount(bit 59)]
  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits + 1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      buf(0) += 1
      var j = 0
      while (j < Bits) {
        buf(j + 1) += (h >>> j) & 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i <= Bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(0)
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (buf(j + 1) * 2 > n) fp |= 1L << j
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((Bits + 1) * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits + 1)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): SimHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SimHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash_agg"
}
