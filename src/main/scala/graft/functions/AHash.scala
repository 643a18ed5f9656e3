package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit blocked-mean aHash: the q136 perceptual
  * media fingerprint, in ONE scan-stage pass per row.
  *
  * Why a custom Expression (the [[WordShingles]] argument applied to
  * the media family): the declarative formulation is a per-CHARACTER
  * posexplode (≈1,500 rows per item at fixture payload sizes) through
  * two corpus-wide hash aggregates and a self-join on media_id before
  * a single fingerprint exists — measured 2.1 s of q136's sf0.1 time,
  * all of it spent materializing char rows the hash immediately
  * collapses. This expression computes the whole blocked-mean pipeline
  * inline: no explosion, no shuffle, no aggregate — the fingerprint
  * table is built scan → project, and q136's first exchange is the
  * (already tiny) 4-chunk banding explode.
  *
  * The arithmetic replays the declarative pipeline and the DuckDB
  * oracle BIT-FOR-BIT on the (spec-pinned, all-ASCII) media fixture:
  *   - signal value = code point (DuckDB `ord`; == byte on ASCII, the
  *     documented decode-seam contract — reference the q136 scaladoc);
  *   - block of character i = (i*60) div n, n = code-point length
  *     (Spark `length`, DuckDB `LEN`) — the nearest-neighbor resize;
  *   - block value = integer mean (floor div) of its codes; global
  *     mean = sum of EXISTING block values div 60; bit b set iff
  *     block b exists and bv >= mu. Items shorter than 60 chars have
  *     empty blocks, which contribute nothing and set no bit —
  *     identical to the grouped form, where absent (media_id, b) rows
  *     simply never exist (callers filter n >= 60 anyway).
  *   - the degenerate EMPTY string is NULL, not 0 (round-15 verdict
  *     closes the contract): the grouped form emits NO row for an
  *     empty payload (nothing to explode), so a total function here
  *     would hand unfiltered callers a phantom ahash=0 fingerprint
  *     the grouped replay and the oracle never produce. NULL makes
  *     the degenerate row DROP under the standard isNotNull guard —
  *     [[graft.operators.MultimodalOps.mediaAHash]] applies it at the
  *     boundary, and MultimodalSpec pins empty-input row-set equality
  *     between the native and grouped forms.
  * All integer arithmetic on non-negative operands, so floor == trunc
  * division on both engines and the hash is exactly reproducible
  * across partitionings, retries, and engines. */
case class AHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ahash expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ahash"

  /** Nullable beyond the child's nullability: empty input → NULL. */
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numBytes() == 0) null else AHashUtil.compute(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      if ($c.numBytes() == 0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.AHashUtil.compute($c);
      }""")

  override protected def withNewChildInternal(newChild: Expression): AHash =
    copy(child = newChild)
}

/** Static helper the generated code calls (object methods become
  * static forwarders — whole-stage codegen references it directly). */
object AHashUtil {
  private val Blocks = 60

  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.codePointCount(0, s.length).toLong
    if (n == 0L) return 0L // unreachable via AHash (empty → NULL there)
    val sums = new Array[Long](Blocks)
    val cnts = new Array[Long](Blocks)
    var i = 0L // code-point index
    var ci = 0 // UTF-16 unit index
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val b = ((i * Blocks) / n).toInt
      sums(b) += cp
      cnts(b) += 1
      i += 1
      ci += Character.charCount(cp)
    }
    val bv = new Array[Long](Blocks)
    var tot = 0L
    var b = 0
    while (b < Blocks) {
      if (cnts(b) > 0) { bv(b) = sums(b) / cnts(b); tot += bv(b) }
      b += 1
    }
    val mu = tot / Blocks
    var h = 0L
    b = 0
    while (b < Blocks) {
      if (cnts(b) > 0 && bv(b) >= mu) h |= 1L << b
      b += 1
    }
    h
  }
}
