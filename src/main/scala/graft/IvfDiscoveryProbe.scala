package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown probe for the IVF/SQ single-search serving constant at the
  * 10M tier — the question round-19 NOTES deferred: does
  * `spark.read.parquet` partition DISCOVERY over the cell layout (64
  * dirs in the soak shape; 64-4096 in deployments) cost materially on
  * the probed serving path, the way the fuzzy artifact's 512-bucket
  * discovery dominated the single fuzzy lookup (~85% of 3.23s, round
  * 19)? [[FuzzyLookupProbe]]'s methodology pointed at
  * [[graft.index.Index.searchProbed]] / [[graft.index.Index.searchSq]]:
  *
  *  - sourceStamp: the freshness/advice file listing over the source
  *  - discover(ivf|sq): bare DataFrame creation over the
  *    cell-partitioned artifact — the listing every serving scan pays
  *    before partition pruning can discard cells
  *  - search_probed / search_sq: cold (first call), warm (second),
  *    hot (after everything above — FileStatusCache fully primed)
  *
  * Findings land in NOTES.md (round-20 item: apply readBuckets-style
  * explicit leaf-path roots to the IVF serving reads ONLY if the
  * discovery term shows up here — the honest answer may be "it
  * doesn't": 64 cell dirs is an order less listing than 3×512 buckets).
  *
  * Run: sbt "runMain graft.IvfDiscoveryProbe [n]" (default 10M). */
object IvfDiscoveryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft-ivfprobe").toString
    val e = new graft.api.Engine(spark, root)
    val (ingestSec, _) = time(e.makeTable("vectors", RefBench.corpus(spark, n)))
    // the Soak10M shape: 8^2 = 64 cells, l2
    val cfg = graft.coder.CoderConfig(metric = "l2", codebookSize = 8,
      numCodebooks = 2, batchSize = 2560, numEpochs = 5, maxStepsPerEpoch = 5)
    val (trainSec, _) = time(e.makeCoder("c", "vectors", "vector", cfg))
    val (ivfSec, _) = time(e.syncIndex("c", "vectors", "vector"))
    val (sqSec, _) = time(e.makeSqIndex("c", "vectors", "vector"))
    println(f"[ivfprobe] n=$n ingest=$ingestSec%.1f train=$trainSec%.1f " +
      f"ivf=$ivfSec%.1f sq=$sqSec%.1f")

    val target = e.readTable(Seq("vectors"))
      .filter(col("vec_id") === 424243L)
      .select(col("vector").cast("array<double>"))
      .head().getSeq[Double](0).toArray

    def probed(): Long = e.search("vectors", "vector", target,
      coding = Some("c"), probes = Some(16), k = 10,
      tieBreak = Seq("vec_id")).count()
    def sq(): Long = e.searchSq("vectors", "vector", target, coding = "c",
      probes = 16, candidates = 100, idCol = "vec_id", k = 10,
      metric = Some("l2"), tieBreak = Seq("vec_id")).count()

    val (probedColdSec, _) = time(probed())
    val (probedWarmSec, _) = time(probed())
    val (sqColdSec, _) = time(sq())
    val (sqWarmSec, _) = time(sq())
    val (stampSec, _) = time(e.store.sourceStamp("vectors"))
    // partition discovery alone: DataFrame creation lists the cell
    // layout before any pruning can happen
    val ivfPath = e.store.indexPath("vectors", "vector", "c")
    val sqPath = e.store.sqIndexPath("vectors", "vector", "c")
    val (discIvfSec, _) = time(spark.read.parquet(ivfPath))
    val (discSqSec, _) = time(spark.read.parquet(sqPath))
    // as warm as it gets: everything above primed the status caches
    val (probedHotSec, _) = time(probed())
    val (sqHotSec, _) = time(sq())

    val json =
      f"""{"n_vectors":$n,"cells":64,"ingest_sec":$ingestSec%.1f,""" +
      f""""train_sec":$trainSec%.1f,"ivf_build_sec":$ivfSec%.1f,""" +
      f""""sq_build_sec":$sqSec%.1f,""" +
      f""""probed_cold_sec":$probedColdSec%.2f,""" +
      f""""probed_warm_sec":$probedWarmSec%.2f,""" +
      f""""probed_hot_sec":$probedHotSec%.2f,""" +
      f""""sq_cold_sec":$sqColdSec%.2f,"sq_warm_sec":$sqWarmSec%.2f,""" +
      f""""sq_hot_sec":$sqHotSec%.2f,""" +
      f""""source_stamp_sec":$stampSec%.3f,""" +
      f""""discover_ivf_sec":$discIvfSec%.2f,""" +
      f""""discover_sq_sec":$discSqSec%.2f,""" +
      MachineCanary.jsonFragment(spark) + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("ivf_discovery_probe.json"), json)
    println(json)
    e.remove()
    spark.stop()
  }
}
