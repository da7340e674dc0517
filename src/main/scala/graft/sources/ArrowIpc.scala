package graft.sources

import java.io.{File, FileInputStream}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC **stream** import — the reference engine's only storage
  * format (`/root/reference/src/fenix/io/arrow/arrow.py:6-21` reads and
  * appends `.arrow` stream files), so a migrating user arrives with
  * exactly these files. Reads one file or a directory of them into a
  * DataFrame via the arrow-java classes Spark already bundles.
  *
  * Deliberately DRIVER-SIDE: the IPC stream format has no footer and no
  * block index, so it cannot be split for distributed reads — the right
  * 100 TB move is to run this ONCE per file as the migration step
  * landing data in the store's parquet layout (splittable, partition-
  * prunable, column-pruned), after which every query runs distributed.
  * Memory is bounded per batch on the Arrow side but the produced rows
  * are materialized before `createDataFrame`; import shard-sized files
  * (the reference writes per-put files, `arrow.py:24-34`) rather than
  * one giant stream.
  *
  * Type coverage is the reference's surface: signed ints (8/16/32/64),
  * float32/64, utf8, bool, binary, and lists thereof (the tensor
  * columns). Anything else fails loudly rather than importing wrong.
  */
object ArrowIpc {

  private def sparkType(f: Field): DataType = f.getFieldType.getType match {
    case i: ArrowType.Int =>
      require(i.getIsSigned, s"unsigned Arrow int not supported: '${f.getName}'")
      i.getBitWidth match {
        case 8  => ByteType
        case 16 => ShortType
        case 32 => IntegerType
        case 64 => LongType
        case w  => throw new IllegalArgumentException(
          s"unsupported Arrow int width $w for column '${f.getName}'")
      }
    case fp: ArrowType.FloatingPoint => fp.getPrecision match {
      case FloatingPointPrecision.SINGLE => FloatType
      case FloatingPointPrecision.DOUBLE => DoubleType
      case p => throw new IllegalArgumentException(
        s"unsupported Arrow float precision $p for column '${f.getName}'")
    }
    case _: ArrowType.Utf8   => StringType
    case _: ArrowType.Bool   => BooleanType
    case _: ArrowType.Binary => BinaryType
    case _: ArrowType.List   =>
      ArrayType(sparkType(f.getChildren.get(0)), f.getChildren.get(0).isNullable)
    case other => throw new IllegalArgumentException(
      s"unsupported Arrow type $other for column '${f.getName}'")
  }

  /** Arrow schema → Spark schema (names, types, nullability). */
  def sparkSchema(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.getName, sparkType(f), f.isNullable)))

  /** Arrow's boxed `getObject` values → Spark external row values. */
  private def convert(v: Any): Any = v match {
    case null                                       => null
    case t: org.apache.arrow.vector.util.Text       => t.toString
    case l: java.util.List[_]                       => l.asScala.map(convert).toSeq
    case other                                      => other
  }

  /** Read one `.arrow` stream file — or every file in a directory, in
    * name order — as a DataFrame. All files must share one schema. */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    val p = new File(path)
    require(p.exists(), s"no such file or directory: $path")
    val files =
      if (p.isDirectory) {
        val fs = p.listFiles().filter(_.isFile).sortBy(_.getName).toSeq
        require(fs.nonEmpty, s"no files to import in directory: $path")
        fs
      } else Seq(p)
    val alloc = new RootAllocator()
    try {
      var schema: StructType = null
      val rows = new ArrayBuffer[Row]()
      files.foreach { file =>
        val in = new FileInputStream(file)
        val reader = new ArrowStreamReader(in, alloc)
        try {
          val root = reader.getVectorSchemaRoot
          val fileSchema = sparkSchema(root.getSchema.getFields.asScala.toSeq)
          if (schema == null) schema = fileSchema
          else require(schema == fileSchema,
            s"schema mismatch across files: $file has $fileSchema, expected $schema")
          while (reader.loadNextBatch()) {
            val vectors = root.getFieldVectors.asScala.toSeq
            var i = 0
            while (i < root.getRowCount) {
              rows += Row.fromSeq(vectors.map(v => convert(v.getObject(i))))
              i += 1
            }
          }
        } finally reader.close() // closes the stream too
      }
      spark.createDataFrame(rows.asJava, schema)
    } finally alloc.close()
  }

  /** Write a DataFrame as an Arrow IPC **stream** file — the reverse
    * migration step (results back into the reference's native format,
    * `arrow.py:24-34` shape: one stream file, batched record batches).
    * Uses Spark's own Arrow serialization (see
    * `GraftShims.writeArrowStream`), so the produced file is what any
    * Arrow implementation (pyarrow included) reads back bit-for-bit.
    * Driver-side like the import, for the same no-footer/unsplittable
    * reason; batches bound memory. Returns the row count written. */
  def writeStream(df: DataFrame, path: String,
      maxRecordsPerBatch: Int = 4096): Long = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(f))
    try org.apache.spark.sql.GraftShims.writeArrowStream(df, out, maxRecordsPerBatch)
    finally out.close()
  }
}
