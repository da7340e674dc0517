package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Search

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a mandated
  * extension), paired with an equivalent DuckDB SQL oracle in `oracleSql`
  * where SQL-expressible. Column names are aligned between both sides
  * (the driver sorts columns by name and hashes values).
  */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** 1-row DataFrame holding the deterministic query vector (vec_id = 0). */
  private def targetDf(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>").as("__target__"))

  /** Brute-force top-10 under `metric` — SURVEY §2.5 V8 (search without
    * index), one entry per reference metric. */
  private def knnQuery(metric: String)(s: SparkSession, dir: String): DataFrame =
    Search.knn(
      tbl(s, dir, "embeddings"), "embedding", targetDf(s, dir), metric,
      k = 10, select = Some(Seq("vec_id")), tieBreak = Seq("vec_id"),
      distCol = "dist")

  private def knnOracle(distExpr: String): String =
    s"""SELECT e.vec_id AS vec_id, $distExpr AS dist
       |FROM embeddings e
       |CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS t FROM embeddings WHERE vec_id = 0) q
       |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin.replace("\n", " ")

  private val l2Sql  = "list_distance(CAST(e.embedding AS DOUBLE[]), q.t)"
  // Spelled out from inner products (not list_cosine_similarity) so the
  // float ops match our codegen bit-for-bit: dot / sqrt(nu * nv).
  private val cosSql =
    "0.5 - 0.5 * (list_inner_product(CAST(e.embedding AS DOUBLE[]), q.t) / " +
      "sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) * " +
      "list_inner_product(q.t, q.t)))"
  private val dotSql = "-list_inner_product(CAST(e.embedding AS DOUBLE[]), q.t)"

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnQuery("cosine")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // —— V8: brute-force search, all 5 reference metrics ——
    "knn_l2"            -> (knnQuery("l2") _),
    "knn_euclidean"     -> (knnQuery("euclidean") _),
    "knn_cosine"        -> (knnQuery("cosine") _),
    "knn_dot"           -> (knnQuery("dot") _),
    "knn_inner_product" -> (knnQuery("inner_product") _),
    // —— V8 + P2/P1: filtered + projected search ——
    "knn_filtered" -> ((s: SparkSession, dir: String) =>
      Search.knn(
        tbl(s, dir, "embeddings"), "embedding", targetDf(s, dir), "l2",
        k = 10, filter = Some(col("label") >= 5),
        select = Some(Seq("vec_id", "label")), tieBreak = Seq("vec_id"),
        distCol = "dist")),
    // —— S4/S8 + P1/P2: projected, filtered scan ——
    "scan_select_filter" -> ((s: SparkSession, dir: String) =>
      tbl(s, dir, "embeddings")
        .filter(col("label") < 3 && col("vec_id") % 2 === 0)
        .select("vec_id", "label")),
    // —— S4/P7: multi-source load = vertical concat (unionByName) ——
    "table_union" -> ((s: SparkSession, dir: String) => {
      val e = tbl(s, dir, "embeddings")
      val lo = e.filter(col("vec_id") < 100).select("vec_id", "label")
      val hi = e.filter(col("vec_id") >= 100).select("vec_id", "label")
      lo.unionByName(hi).groupBy(col("label").as("label"))
        .agg(count(lit(1)).as("cnt"), sum("vec_id").as("sum_id"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_l2"            -> knnOracle(l2Sql),
    "knn_euclidean"     -> knnOracle(l2Sql),
    "knn_cosine"        -> knnOracle(cosSql),
    "knn_dot"           -> knnOracle(dotSql),
    "knn_inner_product" -> knnOracle(dotSql),
    "knn_filtered" ->
      ("SELECT e.vec_id AS vec_id, e.label AS label, " + l2Sql + " AS dist " +
        "FROM embeddings e CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS t " +
        "FROM embeddings WHERE vec_id = 0) q WHERE e.label >= 5 " +
        "ORDER BY dist ASC, vec_id ASC LIMIT 10"),
    "scan_select_filter" ->
      "SELECT vec_id, label FROM embeddings WHERE label < 3 AND vec_id % 2 = 0",
    "table_union" ->
      ("SELECT label, count(*) AS cnt, CAST(sum(vec_id) AS BIGINT) AS sum_id FROM " +
        "(SELECT vec_id, label FROM embeddings WHERE vec_id < 100 " +
        "UNION ALL SELECT vec_id, label FROM embeddings WHERE vec_id >= 100) " +
        "GROUP BY label"),
  )
}
