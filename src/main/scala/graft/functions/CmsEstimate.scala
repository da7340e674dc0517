package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Count-Min point estimate as a native codegen'd expression — the
  * candidate-filter hot path of [[graft.ext.Sketches.heavyHitters]],
  * which probes the sketch once per INPUT ROW of the full second scan.
  *
  * Replaces the boxing Scala-UDF route (one boxed Long per corpus row):
  * the finished sketch rides the codegen references as one flat long[]
  * (w·d ≤ 32k longs — the [[CellAssign]] centroid pattern) and the
  * generated probe is a branch-free depth-step loop of integer mixes,
  * inlined into whole-stage codegen.
  *
  * Bit-identical to [[graft.ext.CountMinAgg.estimate]]: both sides call
  * the same row-bucket mix ([[graft.ext.CountMinAgg.bucket]] /
  * its inlined Java twin below).
  */
case class CmsEstimate(child: Expression, sketch: Array[Long],
    width: Int, depth: Int) extends UnaryExpression {
  require(sketch.length == width * depth,
    s"sketch length ${sketch.length} != width $width * depth $depth")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects a bigint key hash, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // Keep the up-to-32k-long sketch OUT of plan/explain/error strings
  // (TreeNode stringifies case-class args), and give the expression
  // VALUE equality: the synthesized case-class equals compares the
  // array by reference, so two semantically identical probes would
  // never compare equal (noisy for plan diagnostics/dedup).
  override def stringArgs: Iterator[Any] =
    Iterator(child, s"sketch[${sketch.length}]", width, depth)
  override def equals(other: Any): Boolean = other match {
    case that: CmsEstimate =>
      child == that.child && width == that.width && depth == that.depth &&
        java.util.Arrays.equals(sketch, that.sketch)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Integer.valueOf(width), Integer.valueOf(depth),
      Integer.valueOf(java.util.Arrays.hashCode(sketch)))

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[Long]
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sketch(r * width + graft.ext.CountMinAgg.bucket(key, r, width))
      if (v < min) min = v
      r += 1
    }
    min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("cmsSketch", sketch, "long[]")
    val rV = ctx.freshName("r"); val hV = ctx.freshName("h")
    val vV = ctx.freshName("v"); val minV = ctx.freshName("min")
    nullSafeCodeGen(ctx, ev, k => {
      // the same xorshift mix as CountMinAgg.bucket, inlined
      s"""
         |long $minV = Long.MAX_VALUE;
         |for (int $rV = 0; $rV < $depth; $rV++) {
         |  long $hV = $k * 0x9E3779B97F4A7C15L
         |    + ($rV + 1) * 0xC2B2AE3D27D4EB4FL;
         |  $hV ^= ($hV >>> 29); $hV *= 0xBF58476D1CE4E5B9L; $hV ^= ($hV >>> 32);
         |  long $vV = $sRef[$rV * $width + (int) (($hV & Long.MAX_VALUE) % $width)];
         |  if ($vV < $minV) $minV = $vV;
         |}
         |${ev.value} = $minV;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
