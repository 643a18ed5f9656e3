package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd word n-gram shingler: text → DISTINCT array of
  * 60-bit shingle hashes, in one narrow projection.
  *
  * Why a custom Expression (the same argument as [[CosineSimilarity]]):
  * the declarative formulation of the shingle index is
  * posexplode(split) → two lead() windows → filter → md5 projection →
  * collect_set groupBy — a row explosion (one row per TOKEN) through a
  * doc_id window shuffle and a hash aggregate, executed over the whole
  * corpus before the dedup candidate stages even start. (Round 1 tried
  * the `transform(sequence, …)` lambda instead; higher-order functions
  * are CodegenFallback — 20 s interpreted at sf0.1 — which is how the
  * window shape got earned.) This expression computes the per-doc
  * shingle SET inline in the scan stage: no explosion, no shuffle, no
  * aggregate — the staged index build becomes scan → project → write.
  *
  * The arithmetic replays the declarative pipeline BIT-FOR-BIT (and so
  * stays replayable by the DuckDB oracles, which is the whole
  * correctness story of the dedup family):
  *   - `UTF8String.trim`/`toLowerCase` are exactly SQL trim (space
  *     only, NOT \t) and lower;
  *   - `Pattern.split(s, -1)` matches Spark's split(str, "\\s+")
  *     limit=-1 semantics, INCLUDING leading/trailing empty tokens
  *     around non-space whitespace — a Java `String.split` (limit 0)
  *     would silently drop trailing empties and shift trigrams;
  *   - shingle = first 15 hex chars of md5(tokens joined by ' ') read
  *     as a hex long — identical to
  *     conv(substring(md5(concat_ws(' ', …)), 1, 15), 16, 10)::long
  *     and to DuckDB's ('0x'||substr(md5(s),1,15))::BIGINT;
  *   - the distinct set is emitted in ASCENDING hash order — the
  *     sortedness [[SortedOverlap]] (graft_sorted_overlap)'s
  *     two-pointer merge contract requires; no consumer depends on
  *     appearance order.
  *
  * Docs with fewer than n tokens return an EMPTY array (the caller
  * filters them out — "no complete n-gram" contract pinned in
  * DegenerateDocsSpec); null text nulls out via the UnaryExpression
  * default.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects (string, positive int literal), got " +
        s"(${child.dataType.simpleString}, $n)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesUtil.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShinglesUtil.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}

/** Positional sibling of [[WordShingles]]: text → the FULL shingle
  * hash SEQUENCE, one entry per window start index, duplicates kept,
  * in token order — so `posexplode` yields (start_pos, hash) pairs.
  *
  * Exists for the exact-substring dedup family (q131, the Lee et al.
  * "Deduplicating Training Data" step): span removal needs to know
  * WHERE a duplicated window sits, which the distinct-set form throws
  * away. Same tokenization and 60-bit hash arithmetic as
  * [[WordShingles]] (shared [[WordShinglesUtil]] kernel), so the
  * DuckDB oracle replay recipe is unchanged —
  * ('0x'||substr(md5(array_to_string(toks[i+1:i+n], ' ')),1,15))::BIGINT
  * at 0-based start i. */
case class WordShingleSeq(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_seq expects (string, positive int literal), got " +
        s"(${child.dataType.simpleString}, $n)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_seq"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesUtil.computeSeq(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShinglesUtil.computeSeq($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordShingleSeq = copy(child = newChild)
}

/** Static helper the generated code calls (Scala object methods become
  * static forwarders, so whole-stage codegen references it directly). */
object WordShinglesUtil {
  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** The shared window-hash kernel: 60-bit hash of the n tokens
    * starting at i (space-joined, md5, first 15 hex digits as long). */
  private def windowHash(toks: Array[String], i: Int, n: Int,
      sb: java.lang.StringBuilder): Long = {
    sb.setLength(0)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(toks(i + j))
      j += 1
    }
    val hex = org.apache.commons.codec.digest.DigestUtils.md5Hex(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** [[WordShingleSeq]]'s kernel: positional hash sequence, duplicates
    * kept, index = window start. <n-token docs → empty array. */
  def computeSeq(text: UTF8String, n: Int): ArrayData = {
    val s = text.trim.toLowerCase.toString
    val toks = WS.split(s, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      out(i) = windowHash(toks, i, n, sb)
      i += 1
    }
    new GenericArrayData(out)
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    // trim = SQL space-only trim; toLowerCase = Spark's lower — both
    // straight off UTF8String so semantics can't drift
    val s = text.trim.toLowerCase.toString
    val toks = WS.split(s, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      seen.add(windowHash(toks, i, n, sb))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    // ASCENDING order — the sorted-merge contract of
    // [[SortedOverlap]] (graft_sorted_overlap), which counts the
    // Jaccard overlap of two such sets with a two-pointer walk. No
    // consumer is order-sensitive otherwise (explode / size /
    // intersection are all set operations).
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
