package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd Johnson–Lindenstrauss random projection: float
  * vector → `k` UNSCALED ±1-projection dots (array<double>), one
  * narrow projection in the scan stage. The caller applies the JL
  * 1/√k scale (and any rounding) — keeping the expression a pure
  * ordered fold keeps it bit-replayable by the DuckDB oracle's
  * `SUM(x[i]·sign(j,i) ORDER BY i)`.
  *
  * The ±1 matrix is EXACTLY [[HyperplaneBitsUtil]]'s: component (j, i)
  * = (low bit of 60-bit md5("j:i")) · 2 − 1, so for matching k the
  * q45 LSH signature is precisely the SIGN VECTOR of this projection
  * — the two operators share one hyperplane family (a q134 consumer
  * can route candidates through q45 buckets with zero re-hashing),
  * and the spec pins that identity. Matrix cached per (k, dim) per
  * JVM — never per row.
  *
  * Why a native expression (the q45 story): the declarative form
  * explodes every vector into dim × k rows and re-aggregates; the
  * higher-order-function form (transform/aggregate) severs
  * whole-stage codegen. This computes all k dots inline.
  *
  * Null vector → null (UnaryExpression default); a null ELEMENT nulls
  * the result, matching [[CosineSimilarity]]'s contract. */
case class RandomProjection(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == FloatType &&
        k >= 1 && k <= 256)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_project expects (array<float>, 1..256 dims), got " +
        s"(${child.dataType.simpleString}, $k)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_project"

  override def nullable: Boolean = child.nullable ||
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any =
    RandomProjectionUtil.project(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |Object $boxed = graft.functions.RandomProjectionUtil.project($c, $k);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $boxed;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RandomProjection = copy(child = newChild)
}

object RandomProjectionUtil {
  /** Null on a null element — codegen branches on it. Each output dot
    * folds over i in ASCENDING order (the oracle's ORDER BY i). The
    * ±1 matrix is [[HyperplaneBitsUtil.signs]] ITSELF (one source of
    * the convention and one per-JVM cache), which is what makes the
    * spec-pinned q45↔q134 sign-vector identity structural rather than
    * coincidental. */
  def project(v: ArrayData, k: Int): ArrayData = {
    val dim = v.numElements()
    val s = HyperplaneBitsUtil.signs(k, dim)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      val sj = s(j)
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        dot += v.getFloat(i).toDouble * sj(i)
        i += 1
      }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }
}
