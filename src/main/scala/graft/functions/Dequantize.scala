package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Affine dequantization of a uint8 tensor payload:
  * `out[i] = scale * (bytes[i] - zeroPoint)`.
  *
  * Capability parity with the reference quantized tensor type
  * (`/root/reference/src/fenix/ex/arrow/quint8/quint8.py:52-87`): Spark has
  * no unsigned byte type, so quantized tensors travel as `binary` (one
  * uint8 per element) with `{shape, scale, zeroPoint}` in column metadata
  * (see [[graft.types.Tensors]]) and this expression decodes on demand —
  * codegen'd, allocation = one float array per row.
  */
case class Dequantize(child: Expression, scale: Float, zeroPoint: Float)
    extends UnaryExpression {
  // NaN/Infinity params are reachable from SQL (`graft_dequantize(b,
  // double('nan'), 0)`) and would interpolate as uncompilable Java in
  // doGenCode — fail at analysis time instead of falling back to
  // interpreted eval that silently produces NaNs.
  require(java.lang.Float.isFinite(scale) && java.lang.Float.isFinite(zeroPoint),
    s"graft_dequantize: scale/zeroPoint must be finite, got ($scale, $zeroPoint)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_dequantize expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_dequantize"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = scale * ((bytes(i) & 0xFF) - zeroPoint)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("idx")
      s"""
         |float[] $out = new float[$b.length];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $out[$i] = ${scale}f * (($b[$i] & 0xFF) - ${zeroPoint}f);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Affine quantization of a float/double array to a uint8 payload — the
  * codegen'd inverse of [[Dequantize]] and the hot-path twin of
  * `Tensors.quantizeUdf` (bit-identical rounding, asserted in tests):
  * `out[i] = clamp(round(x[i] / scale + zeroPoint), 0, 255)`, computed in
  * double so the rounding boundary is exact. Used by the SQ8 index build,
  * where the encode is a corpus-scale pass and UDF boxing would dominate.
  */
case class Quantize(child: Expression, scale: Float, zeroPoint: Float)
    extends UnaryExpression {
  // see Dequantize: non-finite params would render as `NaNf`/`Infinityf`
  // in the generated Java; a zero scale silently divides to ±Infinity
  require(java.lang.Float.isFinite(scale) && scale != 0f &&
      java.lang.Float.isFinite(zeroPoint),
    s"graft_quantize: scale must be finite non-zero and zeroPoint finite, " +
      s"got ($scale, $zeroPoint)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantize expects array<float|double>, got ${other.catalogString}")
  }

  // lazy: the child is unresolved (NullType) at construction time
  private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // a null ELEMENT would silently encode as garbage — fail loudly
      // (ingest-time shape enforcement should have caught it upstream)
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_quantize: null element at index $i — quantize needs dense vectors")
      val x = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = math.round(x / scale + zeroPoint)
      out(i) = math.max(0L, math.min(255L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("idx")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_quantize: null element at index " + $i +
         |      " — quantize needs dense vectors");
         |  }
         |  long $q = Math.round($get / ((double) ${scale}f) + ((double) ${zeroPoint}f));
         |  $out[$i] = (byte) Math.max(0L, Math.min(255L, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-dimension affine quantization:
  * `out[i] = clamp(round(x[i] / scales[i] + zeroPoints[i]), 0, 255)`.
  *
  * The SQ8 index's encode path: one (scale, zeroPoint) pair PER DIMENSION
  * instead of [[Quantize]]'s single global affine — the standard scalar-
  * quantizer formulation (one outlier element anywhere must not collapse
  * resolution for every dimension). Params ride the plan as a reference
  * object (no literal interpolation, so the array size doesn't bloat the
  * generated source). Input dimensionality must match the param arrays —
  * a mismatch encodes garbage, so it throws.
  */
case class QuantizePerDim(child: Expression, scales: IndexedSeq[Float],
    zeroPoints: IndexedSeq[Float]) extends UnaryExpression {
  require(scales.nonEmpty && scales.length == zeroPoints.length,
    s"per-dim quantize: ${scales.length} scales vs ${zeroPoints.length} zeroPoints")
  require(scales.forall(s => java.lang.Float.isFinite(s) && s != 0f) &&
      zeroPoints.forall(java.lang.Float.isFinite),
    "per-dim quantize: every scale must be finite non-zero and every zeroPoint finite")

  // IndexedSeq params (not Array) so case-class equality is structural —
  // array fields fall back to reference identity, which defeats Catalyst
  // subexpression elimination and canonical plan matching. The hot paths
  // still read flat arrays:
  @transient private lazy val scalesArr: Array[Float] = scales.toArray
  @transient private lazy val zpArr: Array[Float] = zeroPoints.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"per-dim quantize expects array<float|double>, got ${other.catalogString}")
  }

  private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize_dims"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n != scales.length) throw new IllegalArgumentException(
      s"graft_quantize_dims: vector has $n dims but params have ${scales.length}")
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_quantize_dims: null element at index $i — quantize needs dense vectors")
      val x = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = math.round(x / scalesArr(i) + zpArr(i))
      out(i) = math.max(0L, math.min(255L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("scales", scalesArr, "float[]")
      val z = ctx.addReferenceObj("zeroPoints", zpArr, "float[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("idx")
      val n = ctx.freshName("n")
      val q = ctx.freshName("q")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $s.length) {
         |  throw new IllegalArgumentException(
         |    "graft_quantize_dims: vector has " + $n + " dims but params have " + $s.length);
         |}
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_quantize_dims: null element at index " + $i +
         |      " — quantize needs dense vectors");
         |  }
         |  long $q = Math.round($get / ((double) $s[$i]) + ((double) $z[$i]));
         |  $out[$i] = (byte) Math.max(0L, Math.min(255L, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-dimension affine dequantization — the inverse of [[QuantizePerDim]]:
  * `out[i] = scales[i] * (bytes[i] - zeroPoints[i])`. */
case class DequantizePerDim(child: Expression, scales: IndexedSeq[Float],
    zeroPoints: IndexedSeq[Float]) extends UnaryExpression {
  require(scales.nonEmpty && scales.length == zeroPoints.length,
    s"per-dim dequantize: ${scales.length} scales vs ${zeroPoints.length} zeroPoints")
  require(scales.forall(java.lang.Float.isFinite) &&
      zeroPoints.forall(java.lang.Float.isFinite),
    "per-dim dequantize: every scale and zeroPoint must be finite")

  // see QuantizePerDim: structural equality via IndexedSeq, arrays inside
  @transient private lazy val scalesArr: Array[Float] = scales.toArray
  @transient private lazy val zpArr: Array[Float] = zeroPoints.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"per-dim dequantize expects binary, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_dequantize_dims"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length != scales.length) throw new IllegalArgumentException(
      s"graft_dequantize_dims: payload has ${bytes.length} dims but params " +
        s"have ${scales.length}")
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = scalesArr(i) * ((bytes(i) & 0xFF) - zpArr(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val s = ctx.addReferenceObj("scales", scalesArr, "float[]")
      val z = ctx.addReferenceObj("zeroPoints", zpArr, "float[]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("idx")
      s"""
         |if ($b.length != $s.length) {
         |  throw new IllegalArgumentException(
         |    "graft_dequantize_dims: payload has " + $b.length +
         |    " dims but params have " + $s.length);
         |}
         |float[] $out = new float[$b.length];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $out[$i] = $s[$i] * (($b[$i] & 0xFF) - $z[$i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-(cell, dimension) affine quantization — [[QuantizePerDim]] with
  * the params selected per row by its IVF cell id (the SemDeDup setting:
  * heterogeneous clusters whose per-dimension value ranges are disjoint,
  * where one shared range wastes most of the 8-bit resolution on
  * BETWEEN-cluster spread). Layout: `cells` is the SORTED cell id list;
  * `scales`/`zeroPoints` concatenate one dim-length block per cell plus
  * one trailing GLOBAL fallback block (rows in cells the build never saw
  * — possible after incremental sync — quantize under it, exactly as the
  * dequantize side will read them). IndexedSeq params keep case-class
  * equality structural; flat arrays inside for eval/codegen.
  */
case class QuantizePerCellDim(child: Expression, cell: Expression,
    cells: IndexedSeq[Long], scales: IndexedSeq[Float],
    zeroPoints: IndexedSeq[Float])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(scales.nonEmpty && scales.length == zeroPoints.length,
    s"per-cell quantize: ${scales.length} scales vs ${zeroPoints.length} zeroPoints")
  require(scales.length % (cells.length + 1) == 0,
    s"per-cell quantize: ${scales.length} params not divisible into " +
      s"${cells.length + 1} blocks (cells + global fallback)")
  require(cells.sliding(2).forall(p => p.length < 2 || p(0) < p(1)),
    "per-cell quantize: cell ids must be strictly sorted")

  private val dim = scales.length / (cells.length + 1)
  @transient private lazy val cellsArr: Array[Long] = cells.toArray
  @transient private lazy val scalesArr: Array[Float] = scales.toArray
  @transient private lazy val zpArr: Array[Float] = zeroPoints.toArray

  override def left: Expression = child
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, cell.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (c, l) => TypeCheckResult.TypeCheckFailure(
      s"per-cell quantize expects (array<float|double>, bigint), got " +
        s"(${c.catalogString}, ${l.catalogString})")
  }

  private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize_cell_dims"

  override def nullSafeEval(input: Any, cellAny: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"graft_quantize_cell_dims: vector has $n dims but params have $dim")
    val idx = java.util.Arrays.binarySearch(cellsArr, cellAny.asInstanceOf[Long])
    val base = (if (idx >= 0) idx else cellsArr.length) * dim
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        s"graft_quantize_cell_dims: null element at index $i")
      val x = if (childIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val q = math.round(x / scalesArr(base + i) + zpArr(base + i))
      out(i) = math.max(0L, math.min(255L, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val cl = ctx.addReferenceObj("cells", cellsArr, "long[]")
      val s = ctx.addReferenceObj("scales", scalesArr, "float[]")
      val z = ctx.addReferenceObj("zeroPoints", zpArr, "float[]")
      val out = ctx.freshName("out"); val i = ctx.freshName("idx")
      val n = ctx.freshName("n"); val q = ctx.freshName("q")
      val ix = ctx.freshName("cix"); val base = ctx.freshName("base")
      val get = if (childIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_quantize_cell_dims: vector has " + $n + " dims but params have $dim");
         |}
         |final int $ix = java.util.Arrays.binarySearch($cl, $c);
         |final int $base = ($ix >= 0 ? $ix : $cl.length) * $dim;
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "graft_quantize_cell_dims: null element at index " + $i);
         |  }
         |  long $q = Math.round($get / ((double) $s[$base + $i]) + ((double) $z[$base + $i]));
         |  $out[$i] = (byte) Math.max(0L, Math.min(255L, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, cell = newRight)
}

/** Per-(cell, dimension) affine dequantization — the inverse of
  * [[QuantizePerCellDim]], same block layout and fallback rule. */
case class DequantizePerCellDim(child: Expression, cell: Expression,
    cells: IndexedSeq[Long], scales: IndexedSeq[Float],
    zeroPoints: IndexedSeq[Float])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(scales.nonEmpty && scales.length == zeroPoints.length,
    s"per-cell dequantize: ${scales.length} scales vs ${zeroPoints.length} zeroPoints")
  require(scales.length % (cells.length + 1) == 0,
    s"per-cell dequantize: ${scales.length} params not divisible into " +
      s"${cells.length + 1} blocks (cells + global fallback)")

  private val dim = scales.length / (cells.length + 1)
  @transient private lazy val cellsArr: Array[Long] = cells.toArray
  @transient private lazy val scalesArr: Array[Float] = scales.toArray
  @transient private lazy val zpArr: Array[Float] = zeroPoints.toArray

  override def left: Expression = child
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, cell.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (c, l) => TypeCheckResult.TypeCheckFailure(
      s"per-cell dequantize expects (binary, bigint), got " +
        s"(${c.catalogString}, ${l.catalogString})")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_dequantize_cell_dims"

  override def nullSafeEval(input: Any, cellAny: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length != dim) throw new IllegalArgumentException(
      s"graft_dequantize_cell_dims: payload has ${bytes.length} dims but params have $dim")
    val idx = java.util.Arrays.binarySearch(cellsArr, cellAny.asInstanceOf[Long])
    val base = (if (idx >= 0) idx else cellsArr.length) * dim
    val out = new Array[Float](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = scalesArr(base + i) * ((bytes(i) & 0xFF) - zpArr(base + i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) => {
      val cl = ctx.addReferenceObj("cells", cellsArr, "long[]")
      val s = ctx.addReferenceObj("scales", scalesArr, "float[]")
      val z = ctx.addReferenceObj("zeroPoints", zpArr, "float[]")
      val out = ctx.freshName("out"); val i = ctx.freshName("idx")
      val ix = ctx.freshName("cix"); val base = ctx.freshName("base")
      s"""
         |if ($b.length != $dim) {
         |  throw new IllegalArgumentException(
         |    "graft_dequantize_cell_dims: payload has " + $b.length +
         |    " dims but params have $dim");
         |}
         |final int $ix = java.util.Arrays.binarySearch($cl, $c);
         |final int $base = ($ix >= 0 ? $ix : $cl.length) * $dim;
         |float[] $out = new float[$b.length];
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $out[$i] = $s[$base + $i] * (($b[$i] & 0xFF) - $z[$base + $i]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, cell = newRight)
}
