package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** L2 norm of a vector column (codegen'd). Companion to [[VectorDistance]]:
  * `sqrt(Σ x_i²)` in double precision over float/double arrays in place. */
case class VectorNorm(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_norm expects array<float>/array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    val f = isFloat
    while (i < a.numElements()) {
      val x = if (f) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x; i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val acc = ctx.freshName("acc"); val idx = ctx.freshName("idx")
      val x = ctx.freshName("x")
      s"""
         |double $acc = 0.0;
         |for (int $idx = 0; $idx < $a.numElements(); $idx++) {
         |  final double $x = (double) $a.$get($idx);
         |  $acc += $x * $x;
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2-normalize a vector column to unit length (codegen'd); zero vectors
  * pass through unchanged (matching [[graft.core.Metrics.normalize]]). */
case class VectorNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_normalize expects array<float>/array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vector_normalize"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val f = isFloat
    val v = new Array[Double](a.numElements())
    var i = 0
    while (i < v.length) { v(i) = if (f) a.getFloat(i).toDouble else a.getDouble(i); i += 1 }
    new GenericArrayData(graft.core.Metrics.normalize(v))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (isFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val acc = ctx.freshName("acc"); val idx = ctx.freshName("idx")
      val inv = ctx.freshName("inv")
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $idx = 0; $idx < $n; $idx++) {
         |  $out[$idx] = (double) $a.$get($idx);
         |  $acc += $out[$idx] * $out[$idx];
         |}
         |final double $inv = $acc == 0.0 ? 0.0 : 1.0 / Math.sqrt($acc);
         |for (int $idx = 0; $idx < $n; $idx++) { $out[$idx] *= $inv; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
