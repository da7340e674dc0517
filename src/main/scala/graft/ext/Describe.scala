package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column table profile (the ANALYZE/DESCRIBE-STATISTICS admin
  * surface): one row per column with row/null counts and typed min/max —
  * numerics (and timestamps, as epoch seconds) in `min_num`/`max_num`,
  * strings in `min_str`/`max_str`; other types report counts only.
  *
  * ONE aggregation pass computes every column's stats together (a
  * per-column loop would re-scan the table N times); the single
  * all-stats row is then exploded into the per-column layout. min/max
  * are DATA VALUES, not accumulated sums, so even double columns
  * hash-match an independent engine — no summation-order caveat.
  */
object Describe {

  def describe(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    def numExpr(f: StructField): Option[Column] = f.dataType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType =>
        Some(col(f.name).cast("double"))
      case _: TimestampType | _: TimestampNTZType =>
        Some(floor(unix_micros(col(f.name).cast("timestamp")) / 1000000L)
          .cast("double"))
      case _: DateType => Some(unix_date(col(f.name)).cast("double"))
      case _ => None
    }
    def strExpr(f: StructField): Option[Column] = f.dataType match {
      case _: StringType => Some(col(f.name))
      case _ => None
    }
    val aggs = fields.zipWithIndex.flatMap { case (f, i) =>
      Seq(count(col(f.name)).as(s"__c$i")) ++
        numExpr(f).map(e => min(e).as(s"__nmin$i")).toSeq ++
        numExpr(f).map(e => max(e).as(s"__nmax$i")).toSeq ++
        strExpr(f).map(e => min(e).as(s"__smin$i")).toSeq ++
        strExpr(f).map(e => max(e).as(s"__smax$i")).toSeq
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs.toIndexedSeq: _*)
    val rows = fields.zipWithIndex.map { case (f, i) =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__c$i")).as("n_nulls"),
        (if (numExpr(f).isDefined) col(s"__nmin$i")
         else lit(null).cast("double")).as("min_num"),
        (if (numExpr(f).isDefined) col(s"__nmax$i")
         else lit(null).cast("double")).as("max_num"),
        (if (strExpr(f).isDefined) col(s"__smin$i")
         else lit(null).cast("string")).as("min_str"),
        (if (strExpr(f).isDefined) col(s"__smax$i")
         else lit(null).cast("string")).as("max_str"))
    }
    one.select(explode(array(rows.toIndexedSeq: _*)).as("__r"))
      .select("__r.*")
  }
}
