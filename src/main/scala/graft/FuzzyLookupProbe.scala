package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Breakdown probe for the fuzzy single-lookup constant
  * (`fuzzy_soak_10m.json` recorded lookup_sec 3.2-4.1s across rounds —
  * seconds for ONE string against a listing-pruned artifact is
  * driver-overhead territory, not scan cost). Builds the soak's corpus
  * shape at `args(0)` strings (default 10M, 512 buckets) and times each
  * serving-path component separately:
  *
  *  - sourceStamp: the freshness check's source file listing
  *  - discover(segs|probes|base): `spark.read.parquet` partition
  *    discovery over the 512-bucket artifact (suspected dominant term:
  *    the candidate scan lists EVERY bucket dir before partition
  *    pruning discards all but the query's few)
  *  - candidates: the pruned candidate plan end-to-end (collect)
  *  - lookup_cold / lookup_warm: the full [[graft.api.Engine.fuzzyLookup]],
  *    first call vs repeat (FileStatusCache / code-path warmup delta)
  *
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.FuzzyLookupProbe [n]".
  * Findings land in NOTES.md (round-19 item). */
object FuzzyLookupProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.GraftShims.quietCheckpointLogs()

    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    def baseStr(id: org.apache.spark.sql.Column) =
      substring(concat(md5(id.cast("string")),
        md5((id + 1000003L).cast("string"))), 1, 40)
    val rows = spark.range(n).select(col("id"), baseStr(col("id")).as("t"))

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft-fzprobe").toString
    val e = new graft.api.Engine(spark, root)
    e.makeTable("fzdocs", rows)
    val (buildSec, _) = time {
      e.buildFuzzyIndex("fzdocs", "id", "t", maxDist = 2, buckets = 512)
    }
    println(f"[fzprobe] n=$n build_sec=$buildSec%.1f")

    val src = rows.filter(col("id") === 424243L).head().getString(1)
    val probe = src.substring(0, 7) + "z" + src.substring(8)
    val base = e.store.fuzzyIndexPath("fzdocs", "t")

    val (coldSec, coldRows) = time(e.fuzzyLookup("fzdocs", "t", probe).count())
    val (warmSec, _) = time(e.fuzzyLookup("fzdocs", "t", probe).count())
    val (stampSec, _) = time(e.store.sourceStamp("fzdocs"))
    // partition discovery alone: DataFrame creation lists the whole
    // 512-bucket layout before any pruning can happen
    val (discSegsSec, _) = time(spark.read.parquet(s"$base/segs"))
    val (discProbesSec, _) = time(spark.read.parquet(s"$base/probes"))
    val (discBaseSec, _) = time(spark.read.parquet(s"$base/base"))
    val (candSec, candN) = time(
      e.fuzzyLookupCandidates(base, probe, maxDist = 2, buckets = 512)
        .count())
    // a second full lookup after everything above is as warm as it gets
    val (hotSec, _) = time(e.fuzzyLookup("fzdocs", "t", probe).count())

    val json =
      f"""{"n_strings":$n,"buckets":512,"build_sec":$buildSec%.1f,""" +
      f""""lookup_cold_sec":$coldSec%.2f,"lookup_warm_sec":$warmSec%.2f,""" +
      f""""lookup_hot_sec":$hotSec%.2f,"lookup_rows":$coldRows,""" +
      f""""source_stamp_sec":$stampSec%.3f,""" +
      f""""discover_segs_sec":$discSegsSec%.2f,""" +
      f""""discover_probes_sec":$discProbesSec%.2f,""" +
      f""""discover_base_sec":$discBaseSec%.2f,""" +
      f""""candidates_sec":$candSec%.2f,"candidate_ids":$candN,""" +
      MachineCanary.jsonFragment(spark) + "}"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("fuzzy_lookup_probe.json"), json)
    println(json)
    e.remove()
    spark.stop()
  }
}
