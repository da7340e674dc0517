package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.coder.Coding

/** Quantizer cell assignment as a native codegen'd expression — the
  * index-build hot path (a full corpus pass at 100 TB scale).
  *
  * Capability parity with the reference coder UDF at k=1
  * (`/root/reference/src/fenix/io/coder/coder.py:83-89` via
  * `io/index/index.py:45-50`), replacing the boxing Scala-UDF route:
  * centroids ride the codegen references as one flat double[] and the
  * generated loop reads the vector's `ArrayData` in place.
  *
  * Computes the exact same double-precision operations as
  * [[graft.coder.Coding.assign]] (including sqrt/normalization constants),
  * so expression- and driver-assigned cell ids are bit-identical.
  */
case class CellAssign(child: Expression, coding: Coding) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_assign expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "cell_assign"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val flat: Array[Double] = {
    val n = coding.n; val k = coding.k; val d = coding.dim
    val out = new Array[Double](n * k * d)
    for (j <- 0 until n; i <- 0 until k)
      System.arraycopy(coding.centroids(j)(i), 0, out, (j * k + i) * d, d)
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](arr.numElements())
    val f = isFloat
    var i = 0
    while (i < v.length) { v(i) = if (f) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
    coding.assign(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val n = coding.n; val k = coding.k; val d = coding.dim
    val metric = graft.core.Metrics.canonical(coding.config.metric)
    val get = if (isFloat) "getFloat" else "getDouble"
    // all locals freshName'd so the block can inline into host methods
    // whose parameters use common names (UnsafeProjection's row is `i`)
    val jV = ctx.freshName("j"); val iV = ctx.freshName("ci")
    val tV = ctx.freshName("t"); val base = ctx.freshName("base")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    val dist = ctx.freshName("dist"); val cell = ctx.freshName("cell")
    nullSafeCodeGen(ctx, ev, a => {
      val distBody = metric match {
        case "l2" =>
          val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
          s"""double $acc = 0.0;
             |for (int $tV = 0; $tV < $d; $tV++) {
             |  double $x = $cRef[$base + $tV] - (double) $a.$get($tV);
             |  $acc += $x * $x;
             |}
             |double $dist = Math.sqrt($acc);""".stripMargin
        case "cosine" =>
          val dotV = ctx.freshName("dot"); val nu = ctx.freshName("nu")
          val nv = ctx.freshName("nv"); val cv = ctx.freshName("cv")
          val xv = ctx.freshName("xv")
          s"""double $dotV = 0.0, $nu = 0.0, $nv = 0.0;
             |for (int $tV = 0; $tV < $d; $tV++) {
             |  double $cv = $cRef[$base + $tV]; double $xv = (double) $a.$get($tV);
             |  $dotV += $cv * $xv; $nu += $cv * $cv; $nv += $xv * $xv;
             |}
             |double $dist = 0.5 - 0.5 * ($dotV / Math.sqrt($nu * $nv));""".stripMargin
        case "dot" =>
          val dotV = ctx.freshName("dot")
          s"""double $dotV = 0.0;
             |for (int $tV = 0; $tV < $d; $tV++) { $dotV += $cRef[$base + $tV] * (double) $a.$get($tV); }
             |double $dist = -$dotV;""".stripMargin
      }
      s"""
         |if ($a.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "cell_assign: expected $d elements, got " + $a.numElements());
         |}
         |long $cell = 0L;
         |for (int $jV = 0; $jV < $n; $jV++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $iV = 0; $iV < $k; $iV++) {
         |    final int $base = ($jV * $k + $iV) * $d;
         |    $distBody
         |    if ($dist < $bestD) { $bestD = $dist; $best = $iV; }
         |  }
         |  $cell = $cell * $k + $best;
         |}
         |${ev.value} = $cell;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
