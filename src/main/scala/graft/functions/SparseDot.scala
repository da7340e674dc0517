package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The merge-walk, once — called by BOTH the interpreted eval and the
  * generated code (same shared-algorithm-object pattern as
  * [[JaroWinklerAlgo]]).
  *
  * Inputs are two sparse vectors as `array<struct<term: string,
  * u: double>>` SORTED BY TERM ASCENDING with unique terms (what
  * [[graft.ext.Lexical.tfidfVectors]] produces). The result is the dot
  * product over shared terms accumulated IN ASCENDING TERM ORDER —
  * bit-identical to a left fold over the left vector's shared entries
  * (the arithmetic the DuckDB oracle mirrors via `list_inner_product`
  * over the sorted shared list), because float addition order is the
  * contract, not just the value. */
object SparseDotAlgo {
  def dot(a: ArrayData, b: ArrayData): Double = {
    var i = 0
    var j = 0
    val na = a.numElements()
    val nb = b.numElements()
    var acc = 0.0
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val c = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (c == 0) {
        acc += ra.getDouble(1) * rb.getDouble(1)
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    acc
  }
}

/** `sparse_dot(a, b)` — dot product of two term-sorted sparse vectors
  * in ONE merge pass, as a codegen'd Catalyst expression. Replaces the
  * map_from_entries → filter → aggregate higher-order-function chain in
  * the TF-IDF pair scorer: HOF lambdas evaluate INTERPRETED (they are
  * CodegenFallback), costing ~10⁵ boxed expression-tree walks per pair
  * on a 31-term vocabulary — ~140µs/row measured; this is one virtual
  * call per row. NULL-safe; output is double. */
case class SparseDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def sparseVec(t: DataType): Boolean = t match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == StringType && f1.dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (sparseVec(left.dataType) && sparseVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sparse_dot expects two array<struct<term: string, u: double>> " +
        s"inputs, got (${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sparse_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    SparseDotAlgo.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SparseDotAlgo.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
