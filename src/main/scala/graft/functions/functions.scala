package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.functions._

import graft.core.Metrics

/** Column-level entry points for the engine's vector functions. */
object functions {

  /** Distance between two vector columns under `metric`
    * (cosine | dot | inner_product | l2 | euclidean — reference formulas,
    * see [[graft.core.Metrics]]). Returns double; smaller = nearer. */
  def vector_distance(u: Column, v: Column, metric: String): Column =
    GraftShims.column(
      VectorDistance(GraftShims.expression(u), GraftShims.expression(v),
        Metrics.canonical(metric)))

  /** A vector literal usable as the `v` side of [[vector_distance]]. */
  def vector_lit(target: Seq[Double]): Column = {
    typedLit(target)
  }

  def vector_lit_f(target: Seq[Float]): Column = typedLit(target)
}
