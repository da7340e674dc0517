package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.GraftShims
import graft.functions.Dequantize

/** The reference's extension type system, mapped onto Spark's type system +
  * column metadata (SURVEY §1.1):
  *
  *  - fixed-shape tensor (`ex/arrow/tensor/tensor.py:10-29`):
  *    `ArrayType(elementType)` + `graft.shape` in field metadata (Parquet
  *    `list<float>` loses the fixed length, so the shape rides metadata and
  *    is enforced on ingest);
  *  - quantized uint8 tensor (`ex/arrow/quint8/quint8.py:52-87`):
  *    `BinaryType` + `{graft.shape, graft.scale, graft.zeroPoint}` metadata,
  *    decoded by [[graft.functions.Dequantize]];
  *  - nested tensor (`ex/arrow/nested/nested.py:18-122`): plain `StructType`
  *    of tensor fields; path access is Catalyst's `GetStructField`
  *    (`col("a.b.c")`), no jmespath machinery needed.
  */
object Tensors {
  val ShapeKey = "graft.shape"
  val ScaleKey = "graft.scale"
  val ZeroPointKey = "graft.zeroPoint"

  /** Metadata for a fixed-shape float tensor column. */
  def tensorMeta(shape: Seq[Int]): Metadata =
    new MetadataBuilder().putLongArray(ShapeKey, shape.map(_.toLong).toArray).build()

  /** Metadata for a quint8 tensor column. */
  def quint8Meta(shape: Seq[Int], scale: Float, zeroPoint: Float): Metadata =
    new MetadataBuilder()
      .putLongArray(ShapeKey, shape.map(_.toLong).toArray)
      .putDouble(ScaleKey, scale.toDouble)
      .putDouble(ZeroPointKey, zeroPoint.toDouble)
      .build()

  def shapeOf(field: StructField): Option[Seq[Int]] =
    if (field.metadata.contains(ShapeKey))
      Some(field.metadata.getLongArray(ShapeKey).toSeq.map(_.toInt))
    else None

  /** Tag an array column as a fixed-shape tensor (metadata survives
    * Parquet round-trips). */
  def asTensor(df: DataFrame, column: String, shape: Seq[Int]): DataFrame =
    df.withColumn(column, col(column).as(column, tensorMeta(shape)))

  /** Validate that every non-null row of `column` has the declared flat
    * size; fails the job on the first violation (cheap codegen'd check).
    * Null rows pass — the reference's fixed-size-list type is nullable,
    * and the engine's distance path is null-safe. */
  def enforceShape(df: DataFrame, column: String, flatSize: Int): DataFrame =
    df.withColumn(column,
      when(col(column).isNull || size(col(column)) === flatSize, col(column))
        .otherwise(raise_error(concat(
          lit(s"tensor '$column' expected $flatSize elements, got "),
          size(col(column)).cast("string")))))

  /** Enforce the declared flat size of EVERY column tagged with
    * `graft.shape` metadata (via [[asTensor]]/[[quint8Meta]]) — the Spark
    * equivalent of the reference's fixed-size-list type guarantee
    * (`ex/arrow/tensor/tensor.py:10-29`): a ragged vector fails at ingest
    * with a clear error instead of dim-mismatching at distance time.
    * Columns keep their metadata through the check. */
  def enforceDeclaredShapes(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      shapeOf(f) match {
        case Some(shape) if f.dataType.isInstanceOf[ArrayType] =>
          val flat = shape.product
          acc.withColumn(f.name,
            when(col(f.name).isNull || size(col(f.name)) === flat, col(f.name))
              .otherwise(raise_error(concat(
                lit(s"tensor '${f.name}' expected $flat elements, got "),
                size(col(f.name)).cast("string"))))
              .as(f.name, f.metadata))
        case _ => acc
      }
    }

  // ——— nested tensors (struct-of-tensor columns) ———

  /** Attach tensor metadata to a field nested inside struct columns
    * (dotted `path`, e.g. `"sensors.image"`), the Spark mapping of the
    * reference's nested extension type (`ex/arrow/nested/nested.py:18-122`,
    * which stores per-leaf dtype/shape in the storage type's metadata).
    * The whole schema — nested metadata included — rides the parquet
    * footer, so the tags survive write/read round-trips exactly like
    * top-level [[asTensor]] tags. */
  def withNestedTensorMeta(df: DataFrame, path: String, meta: Metadata): DataFrame =
    df.to(withMetaAt(df.schema, path.split('.').toList, meta))

  private def withMetaAt(schema: StructType, path: List[String],
      meta: Metadata): StructType = {
    require(schema.fieldNames.contains(path.head),
      s"no field '${path.head}' in ${schema.catalogString}")
    StructType(schema.fields.map { f =>
      if (f.name != path.head) f
      else path.tail match {
        case Nil => f.copy(metadata = new MetadataBuilder()
          .withMetadata(f.metadata).withMetadata(meta).build())
        case rest => f.dataType match {
          case s: StructType => f.copy(dataType = withMetaAt(s, rest, meta))
          case other => throw new IllegalArgumentException(
            s"path segment '${f.name}' is not a struct (${other.catalogString})")
        }
      }
    })
  }

  /** The field at a dotted path (jmespath-style access over struct
    * nesting; element access inside the leaf tensor is Catalyst's own
    * `col(path)(i)`). */
  def fieldAt(schema: StructType, path: String): StructField = {
    val segs = path.split('.').toList
    segs.init.foldLeft(schema) { (s, seg) =>
      s(seg).dataType match {
        case st: StructType => st
        case other => throw new IllegalArgumentException(
          s"path segment '$seg' is not a struct (${other.catalogString})")
      }
    }.apply(segs.last)
  }

  /** Declared shape of a (possibly nested) tensor field, read from its
    * metadata. */
  def shapeAt(df: DataFrame, path: String): Option[Seq[Int]] =
    shapeOf(fieldAt(df.schema, path))

  /** Quantize a float-array column to a quint8 binary payload (inverse of
    * [[dequantize]]): `b[i] = clamp(round(x[i] / scale + zeroPoint), 0, 255)`.
    * The affine transform is computed in double so the rounding boundary is
    * well-defined (and replicable by the SQL oracle) instead of depending
    * on float ulps. */
  def quantizeUdf(scale: Float, zeroPoint: Float) = udf { (v: Seq[Float]) =>
    if (v == null) null
    else {
      val a = v.toArray // unbox once: boxed-Seq indexing is slow in hot loops
      val out = new Array[Byte](a.length)
      var i = 0
      while (i < a.length) {
        val q = math.round(a(i).toDouble / scale + zeroPoint)
        out(i) = math.max(0L, math.min(255L, q)).toByte
        i += 1
      }
      out
    }
  }

  /** Dequantize a binary quint8 column: `scale * (x - zeroPoint)`. */
  def dequantize(payload: Column, scale: Float, zeroPoint: Float): Column =
    GraftShims.column(Dequantize(GraftShims.expression(payload), scale, zeroPoint))
}
