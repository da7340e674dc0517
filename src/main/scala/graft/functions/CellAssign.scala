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
    nullSafeCodeGen(ctx, ev, a => {
      val distBody = metric match {
        case "l2" =>
          s"""double acc = 0.0;
             |for (int t = 0; t < $d; t++) {
             |  double x = $cRef[base + t] - (double) $a.$get(t);
             |  acc += x * x;
             |}
             |double dist = Math.sqrt(acc);""".stripMargin
        case "cosine" =>
          s"""double dot = 0.0, nu = 0.0, nv = 0.0;
             |for (int t = 0; t < $d; t++) {
             |  double cv = $cRef[base + t]; double xv = (double) $a.$get(t);
             |  dot += cv * xv; nu += cv * cv; nv += xv * xv;
             |}
             |double dist = 0.5 - 0.5 * (dot / Math.sqrt(nu * nv));""".stripMargin
        case "dot" =>
          s"""double dot = 0.0;
             |for (int t = 0; t < $d; t++) { dot += $cRef[base + t] * (double) $a.$get(t); }
             |double dist = -dot;""".stripMargin
      }
      s"""
         |if ($a.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "cell_assign: expected $d elements, got " + $a.numElements());
         |}
         |long cell = 0L;
         |for (int j = 0; j < $n; j++) {
         |  int best = 0; double bestD = Double.MAX_VALUE;
         |  for (int i = 0; i < $k; i++) {
         |    final int base = (j * $k + i) * $d;
         |    $distBody
         |    if (dist < bestD) { bestD = dist; best = i; }
         |  }
         |  cell = cell * $k + best;
         |}
         |${ev.value} = cell;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
