package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared bit-placement contract between [[BloomFilterAgg]] (build)
  * and [[BloomContains]] (probe): k probe positions per 64-bit hash
  * via double hashing — pos_i = floorMod(h + i·h2, m) with
  * h2 = (h · golden-ratio-odd) | 1 (an odd step, so the k probes walk
  * distinct residues for any h). The filter is a little-endian
  * word-serialized bitset: bit p lives at byte (p>>>3), mask
  * (1 << (p&7)) — both sides compute byte positions from the SAME
  * layout, asserted by the membership spec. m is carried implicitly
  * as 8·|bytes|, so build and probe can never disagree on it. */
private[functions] object BloomLayout {
  final val Step = 0x9E3779B97F4A7C15L

  def positions(h: Long, k: Int, mBits: Long): Array[Long] = {
    val h2 = (h * Step) | 1L
    Array.tabulate(k)(i => java.lang.Math.floorMod(h + i.toLong * h2, mBits))
  }
}

/** Build side of the Bloom prefilter as ONE native aggregate: fold
  * every 60-bit gram hash of the (small) eval corpus into an m-bit
  * bitset with k probes each, emit the bitset as BINARY.
  *
  * Why imperative: the state is one primitive long[m/64] updated with
  * k OR-stores per row in a tight JIT'd loop; partial states merge by
  * word-wise OR (commutative + idempotent, so partial aggregation and
  * retries are safe by construction). Runs under
  * ObjectHashAggregateExec with map-side partials like any agg — the
  * shuffle moves one m-bit blob per map partition, NOT the gram set.
  * At 100 TB this is the point: the decontamination broadcast becomes
  * a fixed-size bitset (e.g. 2 MB for m=2^24) instead of the full
  * distinct-gram relation, and the exact confirm join afterwards only
  * sees the pre-filtered candidates (BloomContains has no false
  * negatives, so the composed operator stays EXACT).
  *
  * m must be a multiple of 64 (whole words); m and k are literal args
  * fixed at plan time. */
case class BloomFilterAgg(child: Expression, mBits: Int, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg needs a BIGINT hash, got ${child.dataType.simpleString}")
    else if (mBits <= 0 || mBits % 64 != 0) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg mBits must be a positive multiple of 64, got $mBits")
    else if (k <= 0 || k > 32) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_agg k must be in [1,32], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h2 = (h * BloomLayout.Step) | 1L
      var i = 0
      while (i < k) {
        val p = java.lang.Math.floorMod(h + i.toLong * h2, mBits.toLong)
        buf((p >>> 6).toInt) |= 1L << (p & 63L).toInt
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  /** Little-endian per word — bit p of the filter is byte (p>>>3),
    * bit (p&7), the layout BloomContains probes. */
  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Byte](buf.length * 8)
    var w = 0
    while (w < buf.length) {
      val v = buf(w)
      var b = 0
      while (b < 8) { out(w * 8 + b) = ((v >>> (8 * b)) & 0xFFL).toByte; b += 1 }
      w += 1
    }
    out
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(n: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_agg"
}

/** Probe side: true iff all k probe bits of the hash are set in the
  * filter. NO false negatives by construction (every build-side probe
  * set its bits; OR-merge never clears); false positives are killed by
  * the exact confirm join downstream, so correctness never depends on
  * m/k tuning. m is read off the binary's length — build and probe
  * cannot disagree.
  *
  * Codegen'd: the k-probe loop compiles into whole-stage codegen as a
  * tight primitive loop over the broadcast byte[] — this sits on the
  * train-side hot path (one probe per gram row), exactly where an
  * interpreted fallback would dominate. */
case class BloomContains(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (BINARY, BIGINT), got ${left.dataType.simpleString} filter")
    else if (right.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects (BINARY, BIGINT), got ${right.dataType.simpleString} hash")
    else if (k <= 0 || k > 32) TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains k must be in [1,32], got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override protected def nullSafeEval(bloom: Any, hash: Any): Any = {
    val bytes = bloom.asInstanceOf[Array[Byte]]
    val h = hash.asInstanceOf[Long]
    val m = bytes.length.toLong * 8L
    val h2 = (h * BloomLayout.Step) | 1L
    var i = 0
    while (i < k) {
      val p = java.lang.Math.floorMod(h + i.toLong * h2, m)
      if ((bytes((p >>> 3).toInt) & (1 << (p & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, hash) => {
      val m = ctx.freshName("m")
      val h2 = ctx.freshName("h2")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val all = ctx.freshName("all")
      s"""
         |long $m = ((long) $bloom.length) * 8L;
         |long $h2 = ($hash * ${BloomLayout.Step}L) | 1L;
         |boolean $all = true;
         |for (int $i = 0; $i < $k; $i++) {
         |  long $p = java.lang.Math.floorMod($hash + (long) $i * $h2, $m);
         |  if (($bloom[(int) ($p >>> 3)] & (1 << (int) ($p & 7L))) == 0) {
         |    $all = false; break;
         |  }
         |}
         |${ev.value} = $all;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
