package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import graft.coder.PQ.PQCodebooks

/** PQ encode as a native codegen'd expression — the one corpus-scale pass
  * of product quantization (see [[graft.coder.PQ]]): each vector becomes
  * an m-byte code (nearest subspace centroid per block). Codebooks ride
  * the generated code as one flat double[]; the loop reads the vector's
  * `ArrayData` in place (float or double element type). Cosine metric
  * l2-normalizes the vector on the fly, matching
  * [[graft.coder.PQ.PQCodebooks.encode]] bit-for-bit.
  */
case class PQEncode(child: Expression, cb: PQCodebooks) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float>/array<double>, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val flat: Array[Double] = cb.flat

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](arr.numElements())
    val f = isFloat
    var i = 0
    while (i < v.length) { v(i) = if (f) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
    cb.encode(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("pqCentroids", flat, "double[]")
    val m = cb.m; val k = cb.k; val subDim = cb.subDim; val dim = cb.dim
    val get = if (isFloat) "getFloat" else "getDouble"
    // residual codebooks encode residuals of already-normalized vectors,
    // so only the FLAT cosine variant normalizes here (mirrors
    // PQCodebooks.maybeNormalize — the bit-for-bit parity contract)
    val cosine = cb.canonicalMetric == "cosine" && !cb.residual
    val rotRef = cb.rotation.map(r => ctx.addReferenceObj("pqRotation", r, "double[]"))
    val code = ctx.freshName("code"); val inv = ctx.freshName("inv")
    val jV = ctx.freshName("j"); val iV = ctx.freshName("ci")
    val tV = ctx.freshName("t"); val base = ctx.freshName("base")
    val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
    val acc = ctx.freshName("acc"); val x = ctx.freshName("x")
    val dl = ctx.freshName("dl"); val nrm = ctx.freshName("nrm")
    val vv = ctx.freshName("vv"); val rv = ctx.freshName("rv")
    val dV = ctx.freshName("d"); val racc = ctx.freshName("racc")
    nullSafeCodeGen(ctx, ev, a => {
      // divide (not multiply-by-reciprocal): x/√n and x·(1/√n) differ by
      // an ulp, and the driver path (PQCodebooks.encode) divides — the
      // bit-for-bit contract requires the same IEEE op here. Dividing once
      // into the scratch array is IEEE-identical to dividing per visit.
      val invInit = if (cosine) {
        s"""double $nrm = 0.0;
           |for (int $tV = 0; $tV < $dim; $tV++) {
           |  double $x = (double) $a.$get($tV); $nrm += $x * $x;
           |}
           |double $inv = ($nrm == 0.0) ? 1.0 : Math.sqrt($nrm);""".stripMargin
      } else s"final double $inv = 1.0;"
      // OPQ rotation: same accumulate-over-t loop order as
      // PQCodebooks.maybeRotate (the bit-for-bit parity contract)
      val rotate = rotRef.fold("") { rr =>
        s"""double[] $rv = new double[$dim];
           |for (int $dV = 0; $dV < $dim; $dV++) {
           |  double $racc = 0.0;
           |  for (int $tV = 0; $tV < $dim; $tV++) {
           |    $racc += $rr[$tV * $dim + $dV] * $vv[$tV];
           |  }
           |  $rv[$dV] = $racc;
           |}
           |$vv = $rv;""".stripMargin
      }
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: expected $dim elements, got " + $a.numElements());
         |}
         |$invInit
         |double[] $vv = new double[$dim];
         |for (int $tV = 0; $tV < $dim; $tV++) {
         |  $vv[$tV] = (double) $a.$get($tV) / $inv;
         |}
         |$rotate
         |byte[] $code = new byte[$m];
         |for (int $jV = 0; $jV < $m; $jV++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $iV = 0; $iV < $k; $iV++) {
         |    final int $base = ($jV * $k + $iV) * $subDim;
         |    double $acc = 0.0;
         |    for (int $tV = 0; $tV < $subDim; $tV++) {
         |      double $dl = $cRef[$base + $tV] - $vv[$jV * $subDim + $tV];
         |      $acc += $dl * $dl;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $best = $iV; }
         |  }
         |  $code[$jV] = (byte) $best;
         |}
         |${ev.value} = $code;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC (asymmetric distance computation) over PQ codes: m byte-indexed
  * lookups into a per-query table of exact subspace distances, summed and
  * mapped to the engine's distance convention. The scan that carries this
  * expression touches only the codes column — at 100 TB the float vectors
  * stay on disk until the exact rerank.
  */
case class PQAdcScore(child: Expression, table: Array[Double], m: Int, k: Int,
    metric: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects binary codes, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  private def finish(acc: Double): Double = metric match {
    case "l2"     => math.sqrt(acc)
    case "cosine" => 0.5 - 0.5 * acc
    case "dot"    => -acc
  }

  override def nullSafeEval(input: Any): Any = {
    val codes = input.asInstanceOf[Array[Byte]]
    if (codes.length != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: expected $m code bytes, got ${codes.length}")
    var acc = 0.0; var j = 0
    while (j < m) { acc += table(j * k + (codes(j) & 0xFF)); j += 1 }
    finish(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("adcTable", table, "double[]")
    val acc = ctx.freshName("acc"); val jV = ctx.freshName("j")
    val fin = metric match {
      case "l2"     => s"Math.sqrt($acc)"
      case "cosine" => s"0.5 - 0.5 * $acc"
      case "dot"    => s"-$acc"
    }
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.length != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score: expected $m code bytes, got " + $c.length);
         |}
         |double $acc = 0.0;
         |for (int $jV = 0; $jV < $m; $jV++) {
         |  $acc += $tRef[$jV * $k + ($c[$jV] & 0xFF)];
         |}
         |${ev.value} = $fin;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual-PQ ADC with per-cell scoring (IVFADC proper): the row's cell
  * id (binary-searched in the SORTED `cells` list — log(probes) per row)
  * selects how its code bytes are scored. Two layouts, chosen by the
  * metric's math (see [[graft.coder.PQ.adcScoreCellsExpr]]):
  *
  *  - PER-CELL tables (`cellConst` empty, l2): `tables` concatenates one
  *    m×k squared-subspace-distance table per probed cell (the query
  *    RESIDUAL differs per cell in every entry); `sqrtFinish = true`.
  *  - SHARED table + per-cell constant (cosine/dot): the m×k dot-product
  *    table is loop-invariant across cells — only the folded
  *    `w·(q·anchor)` scalar differs — so `tables` is a single m×k table
  *    and `cellConst(i)` is cell i's additive constant. Ships
  *    m·k + probes doubles instead of probes·m·k (at the 4096-cell cap
  *    with m=16, k=256: 32 KB + 32 KB instead of 134 MB per task).
  */
case class PQAdcScoreCells(codes: Expression, cell: Expression,
    cells: Array[Long], tables: Array[Double], cellConst: Array[Double],
    m: Int, k: Int, sqrtFinish: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def shared: Boolean = cellConst.nonEmpty
  require(if (shared) cellConst.length == cells.length && tables.length == m * k
          else tables.length == cells.length * m * k,
    "pq_adc_score_cells: tables/cellConst layout does not match the cell list")

  override def left: Expression = codes
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, cell.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (c, l) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score_cells expects (binary, bigint), got (${c.catalogString}, ${l.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score_cells"

  override def nullSafeEval(codesAny: Any, cellAny: Any): Any = {
    val c = codesAny.asInstanceOf[Array[Byte]]
    val cl = cellAny.asInstanceOf[Long]
    if (c.length != m)
      throw new IllegalArgumentException(
        s"pq_adc_score_cells: expected $m code bytes, got ${c.length}")
    val idx = java.util.Arrays.binarySearch(cells, cl)
    if (idx < 0)
      throw new IllegalArgumentException(
        s"pq_adc_score_cells: cell $cl not in the probed set")
    val base = if (shared) 0 else idx * m * k
    var acc = if (shared) cellConst(idx) else 0.0
    var j = 0
    while (j < m) { acc += tables(base + j * k + (c(j) & 0xFF)); j += 1 }
    if (sqrtFinish) math.sqrt(acc) else acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("probedCells", cells, "long[]")
    val tRef = ctx.addReferenceObj("adcTables", tables, "double[]")
    val constRef =
      if (shared) ctx.addReferenceObj("adcCellConst", cellConst, "double[]") else ""
    val idx = ctx.freshName("idx")
    val base = ctx.freshName("base"); val acc = ctx.freshName("acc")
    val j = ctx.freshName("j")
    nullSafeCodeGen(ctx, ev, (c, cl) => {
      s"""
         |if ($c.length != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score_cells: expected $m code bytes, got " + $c.length);
         |}
         |final int $idx = java.util.Arrays.binarySearch($cellsRef, $cl);
         |if ($idx < 0) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score_cells: cell " + $cl + " not in the probed set");
         |}
         |final int $base = ${if (shared) "0" else s"$idx * ${m * k}"};
         |double $acc = ${if (shared) s"$constRef[$idx]" else "0.0"};
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $tRef[$base + $j * $k + ($c[$j] & 0xFF)];
         |}
         |${ev.value} = ${if (sqrtFinish) s"Math.sqrt($acc)" else acc};
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, cell = newRight)
}

/** ADC scoring for the BATCH k-NN join: the lookup table rides the
  * (broadcast) query side as an `array<double>` COLUMN instead of a
  * per-expression literal, so one expression scores every (query,
  * corpus-row) pair of the per-cell join — the table is built once per
  * (query, cell) by [[graft.coder.PQ.adcLut]] (additive constant folded
  * into subspace 0), never per corpus row. `sqrtFinish` mirrors
  * [[graft.coder.PQ.adcSqrtFinish]] (l2 tables hold squared subspace
  * distances).
  */
case class PQAdcScoreLut(codes: Expression, lut: Expression, m: Int, k: Int,
    sqrtFinish: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, lut.dataType) match {
    case (BinaryType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (c, l) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score_lut expects (binary, array<double>), got (${c.catalogString}, ${l.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score_lut"

  override def nullSafeEval(codesAny: Any, lutAny: Any): Any = {
    val c = codesAny.asInstanceOf[Array[Byte]]
    val t = lutAny.asInstanceOf[ArrayData]
    if (c.length != m)
      throw new IllegalArgumentException(
        s"pq_adc_score_lut: expected $m code bytes, got ${c.length}")
    if (t.numElements() != m * k)
      throw new IllegalArgumentException(
        s"pq_adc_score_lut: expected ${m * k} table entries, got ${t.numElements()}")
    var acc = 0.0; var j = 0
    while (j < m) { acc += t.getDouble(j * k + (c(j) & 0xFF)); j += 1 }
    if (sqrtFinish) math.sqrt(acc) else acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
    nullSafeCodeGen(ctx, ev, (c, t) => {
      s"""
         |if ($c.length != $m) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score_lut: expected $m code bytes, got " + $c.length);
         |}
         |if ($t.numElements() != ${m * k}) {
         |  throw new IllegalArgumentException(
         |    "pq_adc_score_lut: expected ${m * k} table entries, got " + $t.numElements());
         |}
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $acc += $t.getDouble($j * $k + ($c[$j] & 0xFF));
         |}
         |${ev.value} = ${if (sqrtFinish) s"Math.sqrt($acc)" else acc};
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)
}
