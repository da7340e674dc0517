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
    // GRAFT_PROBE_LOWRANK=1 swaps in the effective-rank-32 corpus (the
    // regime CurveBench.bqLowRankCurves documents as deployable) — OPQ's
    // rotation only has something to balance when residual variance is
    // NOT isotropic, so compact-tier decisions need both regimes.
    val lowRank = sys.env.get("GRAFT_PROBE_LOWRANK").contains("1")
    val corpusDf =
      if (lowRank) {
        val gen = udf { (id: Long) =>
          val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 7L)
          val cluster = (id % 64).toInt
          val crnd = new java.util.Random(cluster * 7919L + 3L)
          val offset = Array.fill(256)(crnd.nextGaussian().toFloat * 10f)
          val z = Array.fill(32)(rnd.nextGaussian())
          Array.tabulate(256) { i =>
            val brnd = new java.util.Random(i * 1000003L + 11L)
            var acc = 0.0
            var j = 0
            while (j < 32) { acc += brnd.nextGaussian() * z(j); j += 1 }
            (acc / math.sqrt(32.0) + offset(i)).toFloat
          }
        }
        spark.range(n).toDF("vec_id")
          .repartition(spark.sparkContext.defaultParallelism)
          .withColumn("vector", gen(col("vec_id")))
      } else RefBench.corpus(spark, n)
    engine.makeTable("vectors", corpusDf)
    // same coder shape as CurveBench (64 aligned cells, not 8×8 product)
    // so probe numbers predict the 1M curve
    engine.makeCoder("c", "vectors", "vector",
      CoderConfig(metric = "l2", codebookSize = 64, numCodebooks = 1,
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
      // compact-tier candidates (round-9: close the 16 B/row quality gap
      // under a <=32 B/row budget)
      "m16" -> PQConfig(numSubspaces = 16, codebookSize = 256, metric = "l2", sampleSize = 8192),
      "m32" -> PQConfig(numSubspaces = 32, codebookSize = 256, metric = "l2", sampleSize = 8192),
      "m32opq8" -> PQConfig(numSubspaces = 32, codebookSize = 256, metric = "l2", sampleSize = 8192, opqIters = 8),
      "m64" -> PQConfig(numSubspaces = 64, codebookSize = 256, metric = "l2", sampleSize = 8192))
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
