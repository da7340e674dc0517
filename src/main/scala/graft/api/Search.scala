package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.functions.vector_distance

/** Brute-force and filtered top-k vector search.
  *
  * Capability parity with the reference search pipeline
  * (`/root/reference/src/fenix/io/index/index.py:81-170`): optional
  * predicate filter -> distance column -> optional projection -> top-k.
  * Expressed as one declarative DataFrame chain so Catalyst pushes the
  * filter into the scan, prunes columns, and plans the `orderBy().limit(k)`
  * as `TakeOrderedAndProject` (a distributed per-partition top-k + merge —
  * no total sort, no single-node bottleneck at scale).
  */
object Search {
  /** Name contract from the reference (`index.py:14-15`). */
  val DistCol = "__DISTANCE__"
  val CodeCol = "__CODED_ID__"

  /** Top-k nearest rows to a single target vector.
    *
    * The target arrives as a 1-row DataFrame (column `targetCol`) and is
    * broadcast — the query vector never forces a shuffle of the corpus.
    * Mirrors `index.call`: the distance column is always appended, even
    * under an explicit `select` (`index.py:128-129,163`).
    *
    * @param tieBreak  extra ordering columns after distance, for
    *                  deterministic results under distance ties.
    */
  def knn(
      df: DataFrame,
      vecCol: String,
      target: DataFrame,
      metric: String,
      k: Int,
      filter: Option[Column] = None,
      select: Option[Seq[String]] = None,
      tieBreak: Seq[String] = Nil,
      distCol: String = DistCol): DataFrame = {
    val targetCol = target.columns.head
    val filtered = filter.fold(df)(df.filter)
    val withDist = filtered
      .crossJoin(broadcast(target))
      .withColumn(distCol, vector_distance(col(vecCol), col(targetCol), metric))
      .drop(targetCol)
    val projected = select.fold(withDist)(cols => withDist.select((cols :+ distCol).map(col): _*))
    projected.orderBy(col(distCol).asc +: tieBreak.map(col(_).asc): _*).limit(k)
  }

  /** Batch k-NN join: top-k corpus rows per query row.
    *
    * Generalizes the reference's single-target search to a set of queries
    * (broadcast) — the Spark-shaped replacement for "online" ANN: queries
    * are batched, the corpus streams once, per-query top-k via window rank.
    */
  def knnJoin(
      corpus: DataFrame,
      vecCol: String,
      queries: DataFrame,
      queryIdCol: String,
      queryVecCol: String,
      metric: String,
      k: Int,
      tieBreak: Seq[String] = Nil,
      distCol: String = DistCol): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus
      .crossJoin(broadcast(queries.select(col(queryIdCol), col(queryVecCol))))
      .withColumn(distCol, vector_distance(col(vecCol), col(queryVecCol), metric))
      .drop(queryVecCol)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col(distCol).asc +: tieBreak.map(col(_).asc): _*)
    joined
      .withColumn("__rank__", row_number().over(w))
      .filter(col("__rank__") <= k)
      .drop("__rank__")
  }
}
