package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint kernel (Schleimer/Wilkerson/Aiken, MOSS): the
  * distinct minima of `window`-sized sliding windows over the rolling
  * polynomial hashes of all `k`-grams of CODE POINTS.
  *
  * Hash arithmetic is mirrored term-for-term by the DuckDB oracle
  * (`(acc * 257 + unicode(char)) % 1000000007` folded left over each
  * k-gram): the rolling update below maintains exactly that value mod M,
  * in O(1) per gram instead of O(k) — the whole document fingerprints in
  * one O(len) pass. Hashing code points (not UTF-8 lead bytes / UTF-16
  * units) keeps Spark and the oracle identical for ALL text, not just
  * ASCII: previously `ascii()` collapsed every char sharing a UTF-8 lead
  * byte (all CJK, all Greek, ...) to one hash value.
  */
object Winnow {
  private val M = 1000000007L
  private val B = 257L

  /** Distinct winnowed fingerprints of `s` (already lower-cased by the
    * caller), first-occurrence order. Documents shorter than k code
    * points yield no fingerprints. */
  def compute(s: UTF8String, k: Int, window: Int): ArrayData = {
    val str = s.toString
    // code points, matching DuckDB's per-character unicode()
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val nh = n - k + 1
    val h = new Array[Long](nh)
    var bk = 1L // B^(k-1) mod M, for removing the leading term
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    var acc = 0L
    i = 0
    while (i < k) { acc = (acc * B + cps(i)) % M; i += 1 }
    h(0) = acc
    i = 1
    while (i < nh) {
      acc = ((acc - cps(i - 1) * bk % M) % M + M) % M
      acc = (acc * B + cps(i + k - 1)) % M
      h(i) = acc
      i += 1
    }
    val nw = math.max(nh - window + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nw.min(64))
    var t = 0
    while (t < nw) {
      var m = Long.MaxValue
      var j = t
      val end = math.min(t + window, nh)
      while (j < end) { if (h(j) < m) m = h(j); j += 1 }
      if (seen.add(m)) out += m
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** [[Winnow.compute]] as a codegen'd Catalyst expression:
  * `string -> array<bigint>` of distinct winnowed fingerprints. */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  require(k >= 2, s"k must be >= 2, got $k")
  require(window >= 1, s"window must be >= 1, got $window")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call into the shared kernel — the same code nullSafeEval
    // runs, so codegen and interpreted modes cannot drift
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Winnow.compute($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
