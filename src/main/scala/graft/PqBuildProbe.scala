package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.coder.CoderConfig

/** Diagnostic: isolates the IVF+PQ build phases at reference shape to
  * attribute wall time (BENCH_r03 recorded pq_index_build=84s for l2 vs
  * 7.5s for cosine in the same run — this pins down which stage pays). */
object PqBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_pqprobe"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val engine = new Engine(spark, root)
    time("ingest")(engine.makeTable("vectors", RefBench.corpus(spark)))
    val cfg = CoderConfig(metric = "l2", codebookSize = 8, numCodebooks = 2,
      batchSize = 2560, numEpochs = 5, maxStepsPerEpoch = 5)
    time("coder_train")(engine.makeCoder("c", "vectors", "vector", cfg))
    time("index_build")(engine.syncIndex("c", "vectors", "vector"))
    val target = engine.readTable(Seq("vectors")).filter(col("vec_id") === 0)
      .select(col("vector").cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray
    time("pq_build_cosine")(engine.makePqIndex("c", "vectors", "vector",
      graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
        metric = "cosine", sampleSize = 8192)))
    time("search_cosine")(engine.searchPq("vectors", "vector", target,
      coding = "c", probes = 16, candidates = 4000, idCol = "vec_id", k = 10,
      metric = Some("cosine"), tieBreak = Seq("vec_id")).count())
    time("pq_build_l2")(engine.makePqIndex("c", "vectors", "vector",
      graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
        metric = "l2", sampleSize = 8192)))
    time("pq_build_l2_again")(engine.makePqIndex("c", "vectors", "vector",
      graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
        metric = "l2", sampleSize = 8192)))
    spark.stop()
  }
}
