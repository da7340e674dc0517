package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as ONE kernel — replacing the Scala UDF
  * ([[graft.ext.Dedup.minhashUdf]]) on the signature hot path: the UDF
  * route pays UTF8String↔String conversion, a per-row `Set[String]` of
  * shingle STRINGS, and — the big one — `numHashes` SEPARATE FNV folds
  * over every shingle's characters (each seed re-decodes and re-folds
  * the same code points). Signature computation is the expensive pass
  * of every minhash dedup/gate/curation operator — a full-corpus scan
  * at 100 TB — so the per-row constant is the scale cost.
  *
  * Bit-exact to the UDF, piece by piece (MixtureSpec-style
  * differential pinned in DedupSpec):
  *  - tokenization is the UDF's own: Java `String.toLowerCase` (same
  *    JVM default locale on both paths — NOT Spark's `lower`), the
  *    same `\s+` split, empties dropped;
  *  - shingles: word n-grams joined by one space; fewer than n tokens
  *    → the single all-tokens gram (possibly "" — whose hash is the
  *    seed-mixed FNV init, exactly like the UDF);
  *  - hashing: the shared [[graft.ext.Dedup.hash64]] arithmetic —
  *    FNV-1a over CODE POINTS (BMP chars as themselves, surrogate
  *    pairs decoded, unpaired low surrogates as themselves), seed
  *    `0x9E3779B97F4A7C15L · (i+1)` XORed into the init. The kernel
  *    never materializes a gram string: it folds the member tokens'
  *    code points with a literal ' ' between them — the identical
  *    character sequence — and updates ALL `numHashes` lanes in that
  *    single decode pass (the UDF decoded each gram `numHashes`
  *    times);
  *  - the min is over the same gram multiset (the UDF's Set dedup is
  *    irrelevant to a min — duplicates cannot change it).
  * NULL text propagates NULL (every call site filters nulls first —
  * the UDF's all-MaxValue null signature exists for no reachable
  * caller and would pair every null doc with every other). */
object MinhashAlgo {
  private val FnvInit = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L
  private val SeedStep = 0x9E3779B97F4A7C15L

  /** Fold one string's code points into every lane (hash64's decode
    * loop, vectorized across seeds). */
  private def foldChars(s: String, hs: Array[Long]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      var cp: Int = c
      if (c >= Character.MIN_HIGH_SURROGATE && c <= Character.MAX_HIGH_SURROGATE) {
        cp = s.codePointAt(i)
        i += Character.charCount(cp) - 1
      }
      var j = 0
      while (j < hs.length) {
        hs(j) = (hs(j) ^ cp) * FnvPrime
        j += 1
      }
      i += 1
    }
  }

  private def foldChar(cp: Int, hs: Array[Long]): Unit = {
    var j = 0
    while (j < hs.length) {
      hs(j) = (hs(j) ^ cp) * FnvPrime
      j += 1
    }
  }

  def signature(text: UTF8String, numHashes: Int,
      shingleSize: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks0 = text.toString.toLowerCase.split("\\s+")
    var nTok = 0
    var i = 0
    while (i < toks0.length) {
      if (toks0(i).nonEmpty) { toks0(nTok) = toks0(i); nTok += 1 }
      i += 1
    }
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val hs = new Array[Long](numHashes)
    def resetLanes(): Unit = {
      var j = 0
      while (j < numHashes) {
        hs(j) = FnvInit ^ (SeedStep * (j + 1))
        j += 1
      }
    }
    def takeMins(): Unit = {
      var j = 0
      while (j < numHashes) {
        if (hs(j) < mins(j)) mins(j) = hs(j)
        j += 1
      }
    }
    if (nTok < shingleSize) {
      // single gram = all tokens joined by ' ' (empty gram when no
      // tokens — its hash is the seed-mixed init, like the UDF)
      resetLanes()
      i = 0
      while (i < nTok) {
        if (i > 0) foldChar(' ', hs)
        foldChars(toks0(i), hs)
        i += 1
      }
      takeMins()
    } else {
      var g = 0
      while (g <= nTok - shingleSize) {
        resetLanes()
        var t = 0
        while (t < shingleSize) {
          if (t > 0) foldChar(' ', hs)
          foldChars(toks0(g + t), hs)
          t += 1
        }
        takeMins()
        g += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }
}

/** `minhash_sig(text)` — [[MinhashAlgo.signature]] as a codegen'd
  * unary expression. NULL in → NULL out (call sites pre-filter). */
case class MinhashSig(child: Expression, numHashes: Int,
    shingleSize: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(s: Any): Any =
    MinhashAlgo.signature(s.asInstanceOf[UTF8String], numHashes,
      shingleSize)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashAlgo.signature($c, $numHashes, $shingleSize)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
