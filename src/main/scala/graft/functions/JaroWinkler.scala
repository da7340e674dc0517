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
  * oracle on BMP text.
  *
  * ALLOCATION-FREE per pair (the round-16 JW soak showed per-pair cost
  * dominating the 1M blocked join at 2.065e9 candidates): the strings
  * are decoded UTF-8 → UTF-16 straight off the UTF8String bytes
  * (`getByte`, no `toString`, no byte-array copy) into per-thread
  * scratch buffers, and the two match-flag arrays are per-thread too —
  * zero allocations on the hot path. The hand decode emits exactly the
  * chars `new String(bytes, UTF_8)` would (1-4 byte sequences; 4-byte
  * sequences become surrogate pairs), pinned by a spec against the
  * `toString` reference over random multilingual input. */
object JaroWinklerAlgo {
  /** Per-thread scratch: decode buffers + match flags, reused across
    * pairs. Sized by BYTE length (chars ≤ bytes for any UTF-8 input —
    * even a 4-byte sequence's surrogate pair is 2 chars ≤ 4 bytes). */
  private final class Scratch {
    var a: Array[Char] = new Array[Char](256)
    var b: Array[Char] = new Array[Char](256)
    var ma: Array[Boolean] = new Array[Boolean](256)
    var mb: Array[Boolean] = new Array[Boolean](256)
    private def grown(n: Int): Int =
      if (n > (1 << 30)) Int.MaxValue - 8 // 2GB-string edge: no overflow
      else Integer.highestOneBit(n) * 2
    def ensure(na: Int, nb: Int): Unit = {
      if (na > a.length) {
        a = new Array[Char](grown(na))
        ma = new Array[Boolean](a.length)
      }
      if (nb > b.length) {
        b = new Array[Char](grown(nb))
        mb = new Array[Boolean](b.length)
      }
    }
  }
  private val scratch: ThreadLocal[Scratch] =
    ThreadLocal.withInitial(() => new Scratch)

  /** Decode a UTF8String into `out` (caller-sized), returning the char
    * count. Assumes valid UTF-8 (Spark guarantees it for StringType). */
  private def decode(s: UTF8String, out: Array[Char]): Int = {
    val nb = s.numBytes()
    var i = 0
    var n = 0
    while (i < nb) {
      val b0 = s.getByte(i) & 0xFF
      if (b0 < 0x80) {
        out(n) = b0.toChar; n += 1; i += 1
      } else if (b0 < 0xE0) {
        out(n) = (((b0 & 0x1F) << 6) | (s.getByte(i + 1) & 0x3F)).toChar
        n += 1; i += 2
      } else if (b0 < 0xF0) {
        out(n) = (((b0 & 0x0F) << 12) | ((s.getByte(i + 1) & 0x3F) << 6) |
          (s.getByte(i + 2) & 0x3F)).toChar
        n += 1; i += 3
      } else {
        val cp = ((b0 & 0x07) << 18) | ((s.getByte(i + 1) & 0x3F) << 12) |
          ((s.getByte(i + 2) & 0x3F) << 6) | (s.getByte(i + 3) & 0x3F)
        val v = cp - 0x10000
        out(n) = (0xD800 + (v >> 10)).toChar
        out(n + 1) = (0xDC00 + (v & 0x3FF)).toChar
        n += 2; i += 4
      }
    }
    n
  }

  def similarity(l: UTF8String, r: UTF8String): Double = {
    // equal-bytes fast path BEFORE any work: dedup workloads feed this
    // exact duplicates constantly (JW of equal non-empty strings is 1.0
    // by definition; empty-empty is 0.0 by the convention above)
    if (l.equals(r)) return if (l.numBytes() == 0) 0.0 else 1.0
    val sc = scratch.get()
    sc.ensure(l.numBytes(), r.numBytes())
    val la = decode(l, sc.a)
    val lb = decode(r, sc.b)
    similarityDecoded(sc, la, lb)
  }

  /** `similarity`, early-outing to 0.0 when the LENGTH-implied upper
    * bound (m ≤ min(la,lb), t = 0, full prefix boost) cannot reach
    * `minSim` — for all-pairs paths with no upstream length band. Only
    * the cheap numChars byte-walk runs on a pruned pair. Sound: the
    * bound is exactly the band inequality the blocked variants enforce
    * (min ≥ β·max with β = 3·(minSim−0.4)/0.6 − 2), so a pruned pair's
    * true similarity is < minSim and a caller filtering `>= minSim`
    * sees the identical result set with exact values. */
  def similarityBounded(l: UTF8String, r: UTF8String,
      minSim: Double): Double = {
    if (l.equals(r)) return if (l.numBytes() == 0) 0.0 else 1.0
    val ca = l.numChars()
    val cb = r.numChars()
    if (ca == 0 || cb == 0) return 0.0
    val mn = math.min(ca, cb).toDouble
    val maxJaro = (mn / ca + mn / cb + 1.0) / 3.0
    val maxSim = if (maxJaro > 0.7) maxJaro + 0.4 * (1.0 - maxJaro)
      else maxJaro
    if (maxSim < minSim) return 0.0
    val sc = scratch.get()
    sc.ensure(l.numBytes(), r.numBytes())
    val la = decode(l, sc.a)
    val lb = decode(r, sc.b)
    similarityDecoded(sc, la, lb)
  }

  private def similarityDecoded(sc: Scratch, la: Int, lb: Int): Double = {
    if (la == 0 || lb == 0) return 0.0
    val a = sc.a
    val b = sc.b
    val aMatch = sc.ma
    val bMatch = sc.mb
    java.util.Arrays.fill(aMatch, 0, la, false)
    java.util.Arrays.fill(bMatch, 0, lb, false)
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
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
        if (a(i) != b(k)) t += 1
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
      while (p < cap && a(p) == b(p)) p += 1
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

/** `jaro_winkler_min(a, b, minSim)` — [[JaroWinkler]] with the kernel's
  * length early-out ([[JaroWinklerAlgo.similarityBounded]]): returns the
  * EXACT similarity whenever it is ≥ `minSim`, and some value < `minSim`
  * (0.0) otherwise — so `filter(jaro_winkler_min(a,b,s) >= s)` yields
  * the identical rows and values as the unbounded form, skipping the
  * O(len·window) match loops for pairs whose lengths alone rule them
  * out. INTERNAL to the all-pairs dedup paths (the blocked variants
  * already enforce the same band on the candidate frame, where it prunes
  * before the join instead); not registered for SQL — its contract is a
  * filter companion, not a standalone similarity. */
case class JaroWinklerMin(left: Expression, right: Expression,
    minSim: Double) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler_min expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_min"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.similarityBounded(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], minSim)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarityBounded($a, $b, $minSim)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
