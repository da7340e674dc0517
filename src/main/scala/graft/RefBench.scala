package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.coder.CoderConfig

/** Reference-shape workload: the BASELINE.md fixture re-created at full
  * scale — 100,000 × 256-d float32 clustered vectors
  * (`/root/reference/tests/test_flight.py:9-35`: randn + strong cluster
  * offset), coder {k=8, n=2, batch=2560} (`test_flight.py:72-78`),
  * top-10 search, probes=16/64 (`test_flight.py:138-139`).
  *
  * Used by [[Bench]] to report timings at the *same corpus scale* as the
  * reference's own test suite, plus recall@10 of probed vs brute force
  * (which the reference never measured).
  */
object RefBench {
  val NumVectors: Int = sys.env.getOrElse("GRAFT_REF_VECTORS", "100000").toInt
  val Dim = 256
  val NumClusters = 64

  /** Deterministic clustered corpus, generated distributed (no driver
    * data): per-row RNG seeded by vec_id, plus a shared per-cluster
    * offset pattern — mirrors the reference's `randn + 10·x[0]`. */
  def corpus(spark: SparkSession, numVectors: Long = NumVectors.toLong): DataFrame = {
    import spark.implicits._
    val gen = udf { (id: Long) =>
      val rnd = new java.util.Random(id * 0x9E3779B97F4A7C15L + 42L)
      val cluster = (id % NumClusters).toInt
      val crnd = new java.util.Random(cluster * 7919L + 1L)
      val offset = Array.fill(Dim)(crnd.nextGaussian().toFloat * 10f)
      Array.tabulate(Dim)(i => rnd.nextGaussian().toFloat + offset(i))
    }
    spark.range(numVectors).toDF("vec_id")
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("vector", gen(col("vec_id")))
  }

  /** Runs the reference workload; returns (timings, recall@10). */
  def run(spark: SparkSession): (Seq[(String, Double)], Double) = {
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_refbench"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val engine = new Engine(spark, root)

    val (_, tIngest) = time(engine.makeTable("vectors", corpus(spark)))
    val cfg = CoderConfig(metric = "l2", codebookSize = 8, numCodebooks = 2,
      batchSize = 2560, numEpochs = 5, maxStepsPerEpoch = 5)
    val (_, tTrain) = time(engine.makeCoder("c", "vectors", "vector", cfg))
    val (_, tIndex) = time(engine.syncIndex("c", "vectors", "vector"))

    val target = engine.readTable(Seq("vectors")).filter(col("vec_id") === 0)
      .select(col("vector").cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray

    val metricTimes = graft.core.Metrics.All.map { m =>
      // best-of-2: second run reads from the OS page cache like the
      // reference's mmap'd tables do
      val ts = (1 to 2).map { _ =>
        time {
          engine.search("vectors", "vector", target, metric = Some(m), k = 10,
            tieBreak = Seq("vec_id")).collect()
        }._2
      }
      s"knn_$m" -> ts.min
    }
    val (brute, _) = time {
      engine.search("vectors", "vector", target, metric = Some("l2"), k = 10,
        tieBreak = Seq("vec_id")).select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val (probed, tProbed) = time {
      engine.search("vectors", "vector", target, coding = Some("c"),
        probes = Some(16), k = 10, tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val recall = brute.count(probed.contains) / 10.0

    // Residual-cosine IVF+PQ at reference scale (unit-sphere IVFADC —
    // the most common embedding metric). Runs BEFORE the l2 PQ section:
    // one PQ index per (source, column, coding), so the l2 build below
    // overwrites these codes and the root's final state stays l2 (Soak
    // and any attached tooling search it as l2 afterwards).
    val (bruteCos, _) = time {
      engine.search("vectors", "vector", target, metric = Some("cosine"),
        k = 10, tieBreak = Seq("vec_id"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    // best-of-2 (build is an idempotent overwrite): a single noisy-neighbor
    // spike otherwise lands straight in the recorded artifact (BENCH_r03's
    // 84s pq_index_build vs 4.4s on a quiet machine)
    val tPqCosBuild = (1 to 2).map { _ =>
      time {
        engine.makePqIndex("c", "vectors", "vector",
          graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
            metric = "cosine", sampleSize = 8192))
      }._2
    }.min
    val (cosIds, tPqCosSearch) = {
      val ts = (1 to 2).map { _ =>
        time {
          engine.searchPq("vectors", "vector", target, coding = "c",
            probes = 16, candidates = 4000, idCol = "vec_id", k = 10,
            metric = Some("cosine"), tieBreak = Seq("vec_id"))
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
      }
      (ts.head._1, ts.map(_._2).min)
    }
    val pqCosRecall = bruteCos.count(cosIds.contains) / 10.0

    // IVF+PQ at reference scale: 256-d float32 → 16-byte codes (64×);
    // coarse pass reads (id, code) over 16/64 probed cells only.
    val tPqBuild = (1 to 2).map { _ =>
      time {
        engine.makePqIndex("c", "vectors", "vector",
          graft.coder.PQ.PQConfig(numSubspaces = 16, codebookSize = 256,
            metric = "l2", sampleSize = 8192))
      }._2
    }.min
    val (pqIds, tPqSearch) = {
      val ts = (1 to 2).map { _ =>
        time {
          engine.searchPq("vectors", "vector", target, coding = "c",
            probes = 16, candidates = 4000, idCol = "vec_id", k = 10,
            tieBreak = Seq("vec_id"))
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
      }
      (ts.head._1, ts.map(_._2).min)
    }
    val pqRecall = brute.count(pqIds.contains) / 10.0

    // IVF+SQ8 at reference scale: 256-d float32 → 256-byte codes (4×);
    // near-exact coarse ranking, so a small rerank budget suffices.
    val tSqBuild = (1 to 2).map { _ =>
      time(engine.makeSqIndex("c", "vectors", "vector"))._2
    }.min
    val (sqIds, tSqSearch) = {
      val ts = (1 to 2).map { _ =>
        time {
          engine.searchSq("vectors", "vector", target, coding = "c",
            probes = 16, candidates = 100, idCol = "vec_id", k = 10,
            metric = Some("l2"), tieBreak = Seq("vec_id"))
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
      }
      (ts.head._1, ts.map(_._2).min)
    }
    val sqRecall = brute.count(sqIds.contains) / 10.0

    // IVF+BQ at reference scale: 256-d float32 → 32-byte sign codes
    // (32×); Hamming coarse rank needs a larger rerank budget than SQ8
    // but reads 8× less in the coarse pass.
    val tBqBuild = (1 to 2).map { _ =>
      time(engine.makeBqIndex("c", "vectors", "vector"))._2
    }.min
    val (bqIds, tBqSearch) = {
      val ts = (1 to 2).map { _ =>
        time {
          engine.searchBq("vectors", "vector", target, coding = "c",
            probes = 16, candidates = 1000, idCol = "vec_id", k = 10,
            metric = Some("l2"), tieBreak = Seq("vec_id"))
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
      }
      (ts.head._1, ts.map(_._2).min)
    }
    val bqRecall = brute.count(bqIds.contains) / 10.0

    val timings = Seq("ingest" -> tIngest, "coder_train" -> tTrain,
      "index_build" -> tIndex) ++ metricTimes ++
      Seq("search_probed" -> tProbed, "pq_index_build" -> tPqBuild,
        "search_ivf_pq" -> tPqSearch, "pq_recall_at_10" -> pqRecall,
        "pq_cosine_index_build" -> tPqCosBuild,
        "search_ivf_pq_cosine" -> tPqCosSearch,
        "pq_cosine_recall_at_10" -> pqCosRecall,
        "sq_index_build" -> tSqBuild, "search_sq" -> tSqSearch,
        "sq_recall_at_10" -> sqRecall,
        "bq_index_build" -> tBqBuild, "search_bq" -> tBqSearch,
        "bq_recall_at_10" -> bqRecall)
    (timings, recall)
  }
}
