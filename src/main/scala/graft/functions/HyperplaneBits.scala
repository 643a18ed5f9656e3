package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd random-hyperplane LSH signature: float vector →
  * `nPlanes` sign bits packed in a long, one narrow projection.
  *
  * Why (the q45 story): the declarative formulation explodes every
  * vector into (dim × planes) rows — 5.1M at sf0.1 — and runs two hash
  * aggregates just to recover 16 bits per vector; it was the heaviest
  * remaining bench query (3.5 s). This expression computes the same
  * bits inline in the scan stage.
  *
  * Bit-compatibility with the DuckDB-replayed pipeline: hyperplane
  * component (k, i) is ±1 from the low bit of the 60-bit md5 of
  * "k:i" — EXACTLY the arithmetic of the exploded form and its oracle
  * — and each plane's dot product folds over i in ascending order,
  * matching the oracle's `SUM(... ORDER BY i)`. (The declarative
  * Spark plan it replaces summed in partition order; signs are stable
  * under the ~1e-13 fold noise either way, which is why it
  * hash-matched — the ordered fold here is strictly closer to the
  * oracle.) The ±1 matrix depends only on (planes, dim): it is
  * computed once per JVM per shape and cached statically — never per
  * row, never per query.
  *
  * Null vector → null (UnaryExpression default); a null ELEMENT nulls
  * the result, matching [[CosineSimilarity]]'s contract. */
case class HyperplaneBits(child: Expression, nPlanes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
        nPlanes >= 1 && nPlanes <= 64)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bits expects (array<float>, 1..64 planes), got " +
        s"(${child.dataType.simpleString}, $nPlanes)")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_bits"

  override def nullable: Boolean = child.nullable ||
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBitsUtil.bits(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.HyperplaneBitsUtil.bits($c, $nPlanes);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $boxed).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBits = copy(child = newChild)
}

object HyperplaneBitsUtil {
  /** ±1 hyperplane components for (planes, dim), keyed statically —
    * component (k, i) = (low bit of 60-bit md5("k:i")) * 2 - 1, the
    * identical arithmetic of the exploded pipeline and the DuckDB
    * oracle (('0x'||substr(md5(k||':'||i),1,15))::BIGINT % 2 * 2 - 1). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  /** Shared with [[RandomProjectionUtil]]: the q45↔q134 sign-vector
    * identity (LSH bit j == sign of projection dot j) holds BECAUSE
    * both expressions read this one matrix — keep it the single
    * source of the ±1 convention. */
  private[functions] def signs(planes: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dim), _ => {
      Array.tabulate(planes, dim) { (k, i) =>
        val hex = org.apache.commons.codec.digest.DigestUtils
          .md5Hex(s"$k:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
        ((h % 2) * 2 - 1).toDouble
      }
    })

  /** Boxed Long (null on a null element — codegen branches on it). */
  def bits(v: ArrayData, planes: Int): java.lang.Long = {
    val dim = v.numElements()
    val s = signs(planes, dim)
    var sig = 0L
    var k = 0
    while (k < planes) {
      val sk = s(k)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        dot += v.getFloat(i).toDouble * sk(i)
        i += 1
      }
      if (dot > 0) sig |= 1L << k
      k += 1
    }
    sig
  }
}
