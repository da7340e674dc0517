package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR document weight (hashed word uni+bigram log-likelihood-
  * ratio sum, Xie et al. 2023) as ONE kernel — replacing the column
  * composition `aggregate(dsirNgrams(text), 0.0, acc +
  * element_at(lr, bucket(g)+1))`, which evaluates INTERPRETED (the
  * collection-HOF ceiling: `aggregate`/`zip_with`/`filter` have no
  * doGenCode) and allocates three arrays per row (token array, bigram
  * array, their concat) plus one Spark `Md5` evaluation per gram.
  * Scoring is a FULL-CORPUS pass in every DSIR pipeline, so the
  * per-row constant matters at scale.
  *
  * Bit-exact to the chain, step by step:
  *  - tokenization: `trim` strips 0x20 only (UTF8String.trim — NOT
  *    Java String.trim, which also strips control chars),
  *    `toLowerCase` is UTF8String's (what Spark's `lower` runs), the
  *    split is the same `\s+` Java regex with limit −1, empties
  *    dropped exactly like the chain's filter lambda;
  *  - hashing: md5 over the gram's UTF-8 bytes, top 60 bits (the
  *    first 15 hex digits parsed base-16 — here the first 8 digest
  *    bytes big-endian, shifted right 4), `pmod` by the bucket count:
  *    the shared `hashU60` arithmetic, value-identical;
  *  - accumulation: doubles summed in the chain's exact order — all
  *    unigrams in document order, then all bigrams in document order
  *    (`concat(toks, bigrams)`) — so the floating-point result is
  *    IDENTICAL, not merely close, and the DuckDB oracle mirror of
  *    the chain keeps matching bit-for-bit.
  * CorpusRulesSpec pins kernel == chain on adversarial token soup.
  *
  * The md5 instance is per-thread (MessageDigest is stateful and not
  * thread-safe; allocating per gram is what made the chain's Md5
  * calls expensive). */
object DsirWeightAlgo {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(gram-utf8) — value-identical to
    * `conv(substring(md5(g), 1, 15), 16, 10)`. */
  private def hashU60(g: String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Non-empty lowercased tokens in document order (the chain's
    * `filter(split(lower(trim(text)), "\\s+"), _ != "")`), compacted
    * in place. Returns (array, count). */
  private def tokens(text: UTF8String): (Array[String], Int) = {
    // trim(0x20 only) then UTF8String lowercasing — Spark's lower(trim())
    val s = text.trim().toLowerCase.toString
    val parts = s.split("\\s+", -1)
    var nTok = 0
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) { parts(nTok) = parts(i); nTok += 1 }
      i += 1
    }
    (parts, nTok)
  }

  def weight(text: UTF8String, logRatio: Array[Double],
      buckets: Int): Double = {
    val (parts, nTok) = tokens(text)
    var acc = 0.0
    var i = 0
    while (i < nTok) { // unigrams, document order
      acc += logRatio((hashU60(parts(i)) % buckets).toInt)
      i += 1
    }
    i = 0
    while (i < nTok - 1) { // then bigrams, document order
      acc += logRatio((hashU60(parts(i) + " " + parts(i + 1)) % buckets).toInt)
      i += 1
    }
    acc
  }

  /** The uni+bigram BUCKET IDS of a document, chain order — the
    * training-side twin of [[weight]] (dsirTrain explodes these and
    * counts; same hash, same order, so per-bucket counts — and hence
    * the fitted model — are identical to the exploded-ngram chain). */
  def bucketIds(text: UTF8String,
      buckets: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (parts, nTok) = tokens(text)
    val out = new Array[Int](if (nTok == 0) 0 else nTok * 2 - 1)
    var i = 0
    while (i < nTok) {
      out(i) = (hashU60(parts(i)) % buckets).toInt
      i += 1
    }
    i = 0
    while (i < nTok - 1) {
      out(nTok + i) = (hashU60(parts(i) + " " + parts(i + 1)) % buckets).toInt
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** `dsir_weight(text)` with the model baked in as literals —
  * [[DsirWeightAlgo.weight]] as a codegen'd unary expression. The
  * logRatio array is registered once as a codegen reference object,
  * not inlined per row. NULL in → NULL out. */
case class DsirWeight(child: Expression, logRatio: Seq[Double],
    buckets: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_weight expects string, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_weight"

  private lazy val lrArray: Array[Double] = logRatio.toArray

  override def nullSafeEval(s: Any): Any =
    DsirWeightAlgo.weight(s.asInstanceOf[UTF8String], lrArray, buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lrRef = ctx.addReferenceObj("dsirLogRatio", lrArray,
      "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirWeightAlgo.weight($c, $lrRef, $buckets)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** `dsir_buckets(text)` — [[DsirWeightAlgo.bucketIds]] as a codegen'd
  * unary expression (training side: explode + count these instead of
  * materializing gram STRINGS through the interpreted HOF chain and
  * hashing them with per-gram Md5 expressions). NULL in → NULL out. */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_buckets expects string, got ${other.catalogString}")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override def nullSafeEval(s: Any): Any =
    DsirWeightAlgo.bucketIds(s.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DsirWeightAlgo.bucketIds($c, $buckets)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
