package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro-Winkler algorithm, once — called by BOTH the interpreted
  * eval and the generated code (Scala emits a static forwarder for the
  * object method, so codegen calls
  * `graft.functions.JaroWinklerAlgo.similarity(a, b)` directly).
  *
  * Semantics mirror the common reference implementation (and DuckDB's
  * `jaro_winkler_similarity`, the verification oracle), probed
  * empirically against it:
  *  - either string empty → 0.0 (including both empty);
  *  - match window = ⌊max(|a|,|b|)/2⌋ − 1 (≥ 0), greedy left-to-right
  *    matching, transpositions = half the mismatched aligned matches;
  *  - Winkler prefix boost ONLY when jaro > 0.7 (the boost-threshold
  *    rule — confirmed against the oracle on sub-0.7 common-prefix
  *    pairs), prefix capped at 4, scale 0.1.
  * Comparison is by Java char (UTF-16 code unit) — identical to the
  * oracle on BMP text. */
object JaroWinklerAlgo {
  def similarity(l: UTF8String, r: UTF8String): Double = {
    // equal-bytes fast path BEFORE any allocation: dedup workloads feed
    // this exact duplicates constantly (JW of equal non-empty strings
    // is 1.0 by definition; empty-empty is 0.0 by the convention above)
    if (l.equals(r)) return if (l.numBytes() == 0) 0.0 else 1.0
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2.0) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val cap = math.min(4, math.min(la, lb))
      var p = 0
      while (p < cap && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}

/** `jaro_winkler(a, b)` — Jaro-Winkler similarity in [0, 1] between two
  * strings, as a codegen'd Catalyst expression (the record-linkage /
  * name-blocking companion to the levenshtein dedup operators: edit
  * distance counts operations, JW weights agreement toward the prefix,
  * which is what name/title matching wants). NULL-safe; doubles; wrap
  * in `round(, 6)` when comparing against an external engine. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.similarity(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
