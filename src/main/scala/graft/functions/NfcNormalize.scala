package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization (`graft_nfc`) — the
  * canonicalization step the q145 encoding-level dedup keys on.
  *
  * Why it exists: a web crawl stores the SAME text under multiple
  * Unicode encodings — precomposed "é" (U+00E9) vs decomposed
  * "e"+U+0301, full-width forms, differently-ordered combining marks
  * — and every byte-keyed operator in the repo (q30's md5
  * fingerprint, q74's sha256, the shingle hashes) treats canonically
  * EQUAL strings as distinct. Production pipelines (CCNet,
  * RefinedWeb) normalize before fingerprinting for exactly this
  * reason. Spark ships no normalization function, so this wraps the
  * JDK's `java.text.Normalizer` (Unicode 15 NFC — the same tables
  * DuckDB's `nfc_normalize` implements, which is what makes q145
  * hash-verifiable end to end; the spec pins md5 equality over
  * composed/decomposed/reordered-marks inputs on both engines).
  *
  * Scale posture: scalar, one pass per row inside whole-stage codegen
  * (a Scala UDF would sever codegen and pay serialization); the
  * common all-ASCII case short-circuits on `Normalizer.isNormalized`
  * — a single scan of the string, no allocation — so a mostly-ASCII
  * 100 TB corpus pays the recomposition walk only on rows that need
  * it. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Static helper the generated code calls. */
object NfcUtil {
  def normalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
      text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
