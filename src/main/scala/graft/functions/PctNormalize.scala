package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Percent-encoding canonicalization (RFC 3986 §6.2.2.1-2) as ONE
  * kernel — the single-pass replacement for [[graft.ext.Web]]'s
  * 12-regexp + 62-literal-replace column chain, which (applied twice,
  * path + query, inside `urlNormalize`) grew the expression tree past
  * what whole-stage codegen will compile: the projection fell back to
  * interpreted evaluation and ~0.5s of per-invocation Catalyst analysis
  * dominated small inputs (measured round 17; NOTES).
  *
  * BIT-EXACT to the chain on every input, proven shape by shape:
  *
  *  - Hex-case passes (chain: 6 `regexp_replace`es uppercasing the
  *    first digit of `%[a-f][hex]`, then 6 uppercasing the second digit
  *    of `%[0-9A-F][a-f]`): every pattern anchors at `%` and a matched
  *    unit `%XY` contains no interior `%`, so matches never overlap and
  *    the 12 global passes equal one left-to-right per-`%` pass that
  *    uppercases the first digit (when lowercase-letter followed by any
  *    hex) and then the second (when the now-canonical first digit is
  *    `[0-9A-F]` and the second is `[a-f]`).
  *  - Unreserved decode (chain: 62 sequential literal replace-alls of
  *    the canonical uppercase escapes of ALPHA/DIGIT/-._~): on a
  *    WELL-FORMED string (every `%` starts a two-hex-digit escape —
  *    what `urlNormalize` feeds this, its try_parse_url gate rejects
  *    the rest) the escapes tile the string and never interact, so the
  *    62 passes equal one left-to-right decode of each unit. On a
  *    MALFORMED string the chain can synthesize escapes ("%2%34" →
  *    "%2" + "4" = "%24" — the documented hazard), so the kernel
  *    detects malformedness in the same scan and REPLAYS the literal
  *    62-replace chain verbatim on that rare path instead of guessing.
  *
  * WebSpec pins kernel == chain on adversarial escape soup either way.
  */
object PctNormalizeAlgo {

  /** Canonical (escape → char) decode pairs, shared with the column
    * chain and the SQL-oracle generator via [[graft.ext.Web]]. */
  private def decodes: Seq[(String, String)] = graft.ext.Web.UnreservedDecodes

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
  private def isUpperHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')
  private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else c - 'A' + 10
  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
      (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' || v == '~'

  def normalize(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = u.toString
    val n = s.length
    // fast reject: no '%' → identity (the overwhelmingly common case)
    if (s.indexOf('%') < 0) return u
    // pass 1 — hex-case canonicalization, per-% unit (== the 12-regex
    // chain, see scaladoc); track well-formedness in the same scan
    val a = s.toCharArray
    var wellFormed = true
    var i = 0
    while (i < n) {
      if (a(i) == '%') {
        if (i + 2 < n) {
          val c1 = a(i + 1); val c2 = a(i + 2)
          if (c1 >= 'a' && c1 <= 'f' && isHex(c2)) a(i + 1) = (c1 - 32).toChar
          if (isUpperHex(a(i + 1)) && c2 >= 'a' && c2 <= 'f')
            a(i + 2) = (c2 - 32).toChar
          if (!(isHex(a(i + 1)) && isHex(a(i + 2)))) wellFormed = false
        } else wellFormed = false
      }
      i += 1
    }
    if (!wellFormed) {
      // rare path: replay the literal decode chain on the case-
      // canonicalized string — byte-for-byte the column chain's result
      var r = new String(a)
      decodes.foreach { case (esc, ch) => r = r.replace(esc, ch) }
      return UTF8String.fromString(r)
    }
    // pass 2 — decode canonical unreserved escapes in place (escapes
    // tile a well-formed string; no escape can be synthesized)
    val out = new StringBuilder(n)
    i = 0
    while (i < n) {
      val c = a(i)
      if (c == '%') {
        val v = hexVal(a(i + 1)) * 16 + hexVal(a(i + 2))
        if (isUnreserved(v)) { out.append(v.toChar); i += 3 }
        else { out.append('%').append(a(i + 1)).append(a(i + 2)); i += 3 }
      } else { out.append(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `pct_normalize(s)` — [[PctNormalizeAlgo.normalize]] as a codegen'd
  * unary expression (one call in the generated code where the column
  * chain put ~75 string operators). NULL in → NULL out. */
case class PctNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pct_normalize expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override def nullSafeEval(s: Any): Any =
    PctNormalizeAlgo.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PctNormalizeAlgo.normalize($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** The tracker-param filter of `urlNormalize` as one kernel — the
  * second codegen blocker there: the higher-order
  * `filter(split(q, "&"), p => !(p rlike TrackingParamPattern || p == ""))`
  * lambda never compiles (collection HOFs have no doGenCode), so ANY
  * projection containing it falls back to interpreted evaluation.
  *
  * Bit-exact to `array_join(filter(split(q,"&"), lambda), "&")` with
  * [[graft.ext.Web.TrackingParamPattern]]
  * (`^(utm_[^=&]*|fbclid|gclid|msclkid|ref)=`): a split segment
  * contains no `&`, so the anchored regex reduces to — drop when the
  * param is empty, starts with `fbclid=`/`gclid=`/`msclkid=`/`ref=`,
  * or starts with `utm_` and contains a `=` at index ≥ 4 (the greedy
  * `[^=&]*` always backs off to the FIRST `=`). Split keeps interior
  * and trailing empties exactly like Spark's 3-arg split limit −1;
  * they are dropped by the empty-param rule either way. WebSpec pins
  * kernel == lambda chain on param soup. */
object StripTrackersAlgo {
  private def isTracker(p: String): Boolean =
    (p.startsWith("utm_") && p.indexOf('=') >= 4) ||
      p.startsWith("fbclid=") || p.startsWith("gclid=") ||
      p.startsWith("msclkid=") || p.startsWith("ref=")

  def strip(q: UTF8String): UTF8String = {
    val s = q.toString
    if (s.isEmpty) return q
    val parts = s.split("&", -1)
    val sb = new StringBuilder(s.length)
    var first = true
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty && !isTracker(p)) {
        if (!first) sb.append('&')
        sb.append(p)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `strip_trackers(q)` — [[StripTrackersAlgo.strip]] as a codegen'd
  * unary expression. NULL in → NULL out. */
case class StripTrackerParams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_trackers expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_trackers"

  override def nullSafeEval(s: Any): Any =
    StripTrackersAlgo.strip(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StripTrackersAlgo.strip($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
