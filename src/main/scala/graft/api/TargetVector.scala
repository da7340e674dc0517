package graft.api

import scala.language.implicitConversions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.typedLit

/** A query/target vector accepted by the search APIs.
  *
  * The reference coerces several client-side target shapes to a tensor
  * (`/root/reference/src/fenix/io/index/index.py:101-111`); in Scala the
  * equivalent breadth is float vs double arrays. The literal keeps the
  * caller's element type — a float target against a float corpus stays
  * float end-to-end in the distance expression (no widening cast column
  * over the corpus; [[graft.functions.VectorDistance]] reads each side's
  * element type in place). `doubles` is the driver-side copy used for
  * cell ranking, where precision is free.
  */
final class TargetVector private (val doubles: Array[Double], val lit: Column) {
  def length: Int = doubles.length
}

object TargetVector {
  implicit def fromDoubleArray(a: Array[Double]): TargetVector =
    new TargetVector(a, typedLit(a.toSeq))
  implicit def fromFloatArray(a: Array[Float]): TargetVector =
    new TargetVector(a.map(_.toDouble), typedLit(a.toSeq))
}
