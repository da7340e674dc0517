package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Linear projection of an embedding onto stored principal components:
  * `y_r = Σ_i components[r·d + i] · (x_i − mean_i)` for r < k — the
  * serving half of PCA/whitening dimensionality reduction
  * ([[graft.ext.Embeddings]]; Pearson 1901 / Hotelling 1933 — public).
  * Whitening is folded into the stored components at train time, so this
  * expression is the single hot-path kernel either way.
  *
  * Codegen'd: the (k × d) matrix rides `ctx.addReferenceObj` (embedding
  * it as a Java literal would blow the 64 KB method limit at real sizes),
  * the loop reads the input `ArrayData` in place, and the accumulation
  * order (i ascending, acc init 0.0) is part of the contract so a SQL
  * mirror can reproduce it bit-for-bit. Params are `IndexedSeq` so
  * structurally equal expressions compare equal in Catalyst.
  */
case class PcaProject(child: Expression, mean: IndexedSeq[Double],
    components: IndexedSeq[Double]) extends UnaryExpression {

  private val d: Int = mean.length
  require(d > 0, "pca_project: empty mean")
  require(components.nonEmpty && components.length % d == 0,
    s"pca_project: components length ${components.length} not a multiple of dim $d")
  private val k: Int = components.length / d

  @transient private lazy val meanArr: Array[Double] = mean.toArray
  @transient private lazy val compArr: Array[Double] = components.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pca_project expects array<float|double>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    if (x.numElements() != d)
      throw new IllegalArgumentException(
        s"pca_project: dim mismatch ${x.numElements()} vs $d")
    val f = isFloat
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      val base = r * d
      var i = 0
      while (i < d) {
        if (x.isNullAt(i))
          throw new IllegalArgumentException("pca_project: null vector element")
        val xi = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        acc += compArr(base + i) * (xi - meanArr(i))
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val mRef = ctx.addReferenceObj("pcaMean", meanArr, "double[]")
      val cRef = ctx.addReferenceObj("pcaComponents", compArr, "double[]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val xi = ctx.freshName("xi")
      val get = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |if ($x.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "pca_project: dim mismatch " + $x.numElements() + " vs " + $d);
         |}
         |final double[] $out = new double[$k];
         |for (int $r = 0; $r < $k; $r++) {
         |  double $acc = 0.0;
         |  final int $base = $r * $d;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($x.isNullAt($i)) {
         |      throw new IllegalArgumentException("pca_project: null vector element");
         |    }
         |    final double $xi = $get;
         |    $acc += $cRef[$base + $i] * ($xi - $mRef[$i]);
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
