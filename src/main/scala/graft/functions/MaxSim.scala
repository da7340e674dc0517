package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Late-interaction (ColBERT-style) MaxSim scoring as a native codegen'd
  * Catalyst expression: for a multi-vector document (array of token
  * embeddings) and a multi-vector query,
  *
  *   score = Σ_{q ∈ query} max_{d ∈ doc} sim(q, d)
  *
  * returned NEGATED (smaller = nearer) to match the engine's distance
  * convention ([[VectorDistance]]; Khattab & Zaharia, SIGIR 2020 — public).
  * The reference engine has no multi-vector scoring; this extends its V1
  * distance surface (`/root/reference/src/fenix/io/coder/coder.py:38-50`)
  * to the token-level retrieval shape LLM pipelines use.
  *
  * `metric` ∈ {"dot", "cosine"}: the per-pair similarity is the raw inner
  * product, or the cosine dot/√(‖q‖²·‖d‖²). Accumulates in double; the
  * outer sum runs in query-token order with a 0.0 init so a DuckDB mirror
  * (`max(list_inner_product(...))` + an ordered `list_reduce` sum) is
  * bit-exact. Token norms are hoisted out of the (query × doc) pair loop —
  * each element is touched once for its norm, not nq·nd times — computed
  * in the same element order as a fused loop would, so hoisting cannot
  * change the result. Both sides accept array<array<float|double>>
  * independently; empty token sets and dimension mismatches throw — a
  * silent 0 would corrupt top-k results.
  */
case class MaxSim(left: Expression, right: Expression, metric: String)
    extends BinaryExpression {

  require(metric == "dot" || metric == "cosine",
    s"maxsim supports dot | cosine, got '$metric'")

  private def tokType(dt: DataType): Boolean = dt match {
    case ArrayType(ArrayType(FloatType, _), _)  => true
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _                                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (tokType(left.dataType) && tokType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<array<float|double>> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "maxsim"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(docAny: Any, qryAny: Any): Any = {
    val doc = docAny.asInstanceOf[ArrayData]
    val qry = qryAny.asInstanceOf[ArrayData]
    val nd = doc.numElements(); val nq = qry.numElements()
    if (nd == 0 || nq == 0)
      throw new IllegalArgumentException(
        s"maxsim: empty token set (doc $nd, query $nq)")
    val df = isFloat(left); val qf = isFloat(right)
    val cosine = metric == "cosine"
    @inline def el(t: ArrayData, i: Int, f: Boolean): Double = {
      if (t.isNullAt(i))
        throw new IllegalArgumentException("maxsim: null vector element")
      if (f) t.getFloat(i).toDouble else t.getDouble(i)
    }
    def tok(arr: ArrayData, i: Int, what: String): ArrayData = {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(s"maxsim: null $what token")
      arr.getArray(i)
    }
    val dim = tok(qry, 0, "query").numElements()
    // hoisted norms (cosine only): same per-element accumulation order as
    // a fused loop — Σ x² over indices 0..dim — so bit-identical to it
    def norm(t: ArrayData, f: Boolean): Double = {
      if (t.numElements() != dim)
        throw new IllegalArgumentException(
          s"maxsim: dim mismatch ${t.numElements()} vs $dim")
      var s = 0.0; var i = 0
      while (i < dim) { val x = el(t, i, f); s += x * x; i += 1 }
      s
    }
    val docNorms = if (cosine) {
      val ns = new Array[Double](nd)
      var di = 0
      while (di < nd) { ns(di) = norm(tok(doc, di, "doc"), df); di += 1 }
      ns
    } else null
    var acc = 0.0
    var qi = 0
    while (qi < nq) {
      val q = tok(qry, qi, "query")
      if (q.numElements() != dim)
        throw new IllegalArgumentException(
          s"maxsim: dim mismatch ${q.numElements()} vs $dim")
      val qNorm = if (cosine) norm(q, qf) else 0.0
      var best = Double.NegativeInfinity
      var di = 0
      while (di < nd) {
        val d = tok(doc, di, "doc")
        if (d.numElements() != dim)
          throw new IllegalArgumentException(
            s"maxsim: dim mismatch ${d.numElements()} vs $dim")
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += el(q, i, qf) * el(d, i, df); i += 1 }
        val sim = if (cosine) dot / math.sqrt(qNorm * docNorms(di)) else dot
        if (sim > best) best = sim
        di += 1
      }
      acc += best
      qi += 1
    }
    -acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (docV, qryV) => {
      val cosine = metric == "cosine"
      val nd = ctx.freshName("nd")
      val nq = ctx.freshName("nq")
      val qi = ctx.freshName("qi")
      val di = ctx.freshName("di")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val d = ctx.freshName("d")
      val dim = ctx.freshName("dim")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val x = ctx.freshName("x")
      val qNorm = ctx.freshName("qNorm")
      val docNorms = ctx.freshName("docNorms")
      val sim = ctx.freshName("sim")
      val ad = classOf[ArrayData].getName
      def get(arr: String, f: Boolean) =
        if (f) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      val qGet = get(q, isFloat(right))
      val dGet = get(d, isFloat(left))
      def nullTok(arr: String, idx: String, what: String) =
        s"""if ($arr.isNullAt($idx)) {
           |  throw new IllegalArgumentException("maxsim: null $what token");
           |}""".stripMargin
      def dimCheck(arr: String) =
        s"""if ($arr.numElements() != $dim) {
           |  throw new IllegalArgumentException(
           |    "maxsim: dim mismatch " + $arr.numElements() + " vs " + $dim);
           |}""".stripMargin
      val elemCheck =
        s"""if ($q.isNullAt($i) || $d.isNullAt($i)) {
           |  throw new IllegalArgumentException("maxsim: null vector element");
           |}""".stripMargin
      // one norm helper per side (null/dim checks live in the callers;
      // accumulation order mirrors eval's exactly). addNewFunction's
      // RETURNED name is used at the call sites — it may be qualified when
      // codegen splits the generated class.
      def mkNormFn(floatElems: Boolean): String = {
        val fn = ctx.freshName("maxsimNorm")
        val t = ctx.freshName("t")
        val s = ctx.freshName("s")
        val getter = if (floatElems) "getFloat" else "getDouble"
        ctx.addNewFunction(fn,
          s"""private double $fn($ad $t, int $dim) {
             |  double $s = 0.0;
             |  for (int $i = 0; $i < $dim; $i++) {
             |    if ($t.isNullAt($i)) {
             |      throw new IllegalArgumentException("maxsim: null vector element");
             |    }
             |    final double $x = (double) $t.$getter($i);
             |    $s += $x * $x;
             |  }
             |  return $s;
             |}""".stripMargin)
      }
      val docNormFn = if (cosine) mkNormFn(isFloat(left)) else ""
      val qryNormFn =
        if (!cosine) ""
        else if (isFloat(left) == isFloat(right)) docNormFn
        else mkNormFn(isFloat(right))
      val docNormsSetup = if (cosine)
        s"""final double[] $docNorms = new double[$nd];
           |for (int $di = 0; $di < $nd; $di++) {
           |  ${nullTok(docV, di, "doc")}
           |  final $ad $d = $docV.getArray($di);
           |  ${dimCheck(d)}
           |  $docNorms[$di] = $docNormFn($d, $dim);
           |}""".stripMargin
      else ""
      val qNormSetup =
        if (cosine) s"final double $qNorm = $qryNormFn($q, $dim);" else ""
      val simExpr =
        if (cosine) s"$dot / Math.sqrt($qNorm * $docNorms[$di])" else dot
      s"""
         |final int $nd = $docV.numElements();
         |final int $nq = $qryV.numElements();
         |if ($nd == 0 || $nq == 0) {
         |  throw new IllegalArgumentException(
         |    "maxsim: empty token set (doc " + $nd + ", query " + $nq + ")");
         |}
         |${nullTok(qryV, "0", "query")}
         |final int $dim = $qryV.getArray(0).numElements();
         |$docNormsSetup
         |double $acc = 0.0;
         |for (int $qi = 0; $qi < $nq; $qi++) {
         |  ${nullTok(qryV, qi, "query")}
         |  final $ad $q = $qryV.getArray($qi);
         |  ${dimCheck(q)}
         |  $qNormSetup
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $di = 0; $di < $nd; $di++) {
         |    ${nullTok(docV, di, "doc")}
         |    final $ad $d = $docV.getArray($di);
         |    ${dimCheck(d)}
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $elemCheck
         |      $dot += $qGet * $dGet;
         |    }
         |    final double $sim = $simExpr;
         |    if ($sim > $best) $best = $sim;
         |  }
         |  $acc += $best;
         |}
         |${ev.value} = -$acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
