package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.coder.CoderConfig
import graft.coder.PQ.PQConfig

/** Diagnostic: recall@10 of the residual IVF+PQ tier across sub-quantizer
  * counts and OPQ settings, at `GRAFT_PROBE_VECTORS` (default 200k) —
  * picks the headline config for [[CurveBench]]'s 1M curve (round-5
  * verdict: m=16 delivered recall 0.70 at a 4k rerank budget at 1M; the
  * fix must be measured, not guessed). Averages over several query
  * points: single-query recall at these budgets is high-variance.
  */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("GRAFT_PROBE_VECTORS", "200000").toLong
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_pqrecallprobe"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val engine = new Engine(spark, root)
    engine.makeTable("vectors", RefBench.corpus(spark, n))
    engine.makeCoder("c", "vectors", "vector",
      CoderConfig(metric = "l2", codebookSize = 8, numCodebooks = 2,
        batchSize = 2560, numEpochs = 3, maxStepsPerEpoch = 5))
    engine.syncIndex("c", "vectors", "vector")

    val queryIds = Seq(0L, 1L, 2L, 3L, 7L, 11L, 13L, 17L)
    val targets = queryIds.map { id =>
      engine.readTable(Seq("vectors")).filter(col("vec_id") === id)
        .select(col("vector").cast("array<double>"))
        .collect()(0).getSeq[Double](0).toArray
    }
    val brute = targets.map { t =>
      engine.search("vectors", "vector", t, metric = Some("l2"),
          k = 10, tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }

    def recallPq(candidates: Int): Double = {
      val rs = targets.zip(brute).map { case (t, b) =>
        val ids = engine.searchPq("vectors", "vector", t, coding = "c",
            probes = 16, candidates = candidates, idCol = "vec_id", k = 10,
            tieBreak = Seq("vec_id"))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        b.count(ids.contains) / 10.0
      }
      rs.sum / rs.length
    }

    val configs = Seq(
      "m64s32k" -> PQConfig(numSubspaces = 64, codebookSize = 256, metric = "l2", sampleSize = 32768),
      "m128" -> PQConfig(numSubspaces = 128, codebookSize = 256, metric = "l2", sampleSize = 8192),
      "m128s32k" -> PQConfig(numSubspaces = 128, codebookSize = 256, metric = "l2", sampleSize = 32768))
    configs.foreach { case (tag, cfg) =>
      val t0 = System.nanoTime()
      engine.makePqIndex("c", "vectors", "vector", cfg)
      val tb = (System.nanoTime() - t0) / 1e9
      val r100 = recallPq(100); val r1k = recallPq(1000); val r4k = recallPq(4000)
      println(f"[pqrecall] $tag n=$n build=$tb%.1fs recall@10: @100=$r100%.2f @1000=$r1k%.2f @4000=$r4k%.2f")
    }
    engine.remove()
    spark.stop()
  }
}
