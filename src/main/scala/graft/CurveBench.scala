package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.coder.CoderConfig

/** Recall-vs-rerank-budget curve at soak scale (default 1M × 256-d,
  * `GRAFT_CURVE_VECTORS` to override; 0 skips): recall@10 of IVF+PQ and
  * IVF+SQ8 at candidates ∈ {100, 4000} under the same probes.
  *
  * This records the SQ8 tier's operational claim in the bench artifact —
  * near-exact coarse ranking makes its recall budget-INDEPENDENT
  * (candidates ≈ k suffices) where PQ's subspace approximation needs a
  * large rerank budget at the same scale. Previously these numbers lived
  * only in NOTES.md prose; [[Bench]] merges this into
  * `bench_summary.json`'s quality block.
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
    engine.makePqIndex("c", "vectors", "vector",
      graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
        metric = "l2", sampleSize = 8192))
    engine.makeSqIndex("c", "vectors", "vector")

    val target = engine.readTable(Seq("vectors")).filter(col("vec_id") === 0)
      .select(col("vector").cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray
    val brute = engine.search("vectors", "vector", target, metric = Some("l2"),
        k = 10, tieBreak = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet

    def recallPq(candidates: Int): Double = {
      val ids = engine.searchPq("vectors", "vector", target, coding = "c",
          probes = 16, candidates = candidates, idCol = "vec_id", k = 10,
          tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      brute.count(ids.contains) / 10.0
    }
    def recallSq(candidates: Int): Double = {
      val ids = engine.searchSq("vectors", "vector", target, coding = "c",
          probes = 16, candidates = candidates, idCol = "vec_id", k = 10,
          metric = Some("l2"), tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      brute.count(ids.contains) / 10.0
    }

    val out = Seq(
      "curve_vectors" -> NumVectors.toDouble,
      "pq_recall_at_10_at_100" -> recallPq(100),
      "pq_recall_at_10_at_4k" -> recallPq(4000),
      "sq_recall_at_10_at_100" -> recallSq(100),
      "sq_recall_at_10_at_4k" -> recallSq(4000))
    engine.remove()
    out
  }
}
