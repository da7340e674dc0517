package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe for the PassJoin edit-distance dedup
  * ([[graft.ext.Dedup.editDistancePairsBlocked]]): 1M 40-char strings
  * (random hex — base-corpus pairs are all far apart) with 100k PLANTED
  * near-duplicates: 50k single-substitution copies and 50k
  * single-insertion copies (the insertion shifts every following
  * character, exercising the ±k probe window, not just same-offset
  * matching). The method is exact, so planted recall must be 100%.
  * Records wall time, pair counts, and planted recall to
  * editdist_soak_1m.json (folded into bench_summary by [[Bench]]).
  * Run: sbt "runMain graft.EditDistSoak". */
object EditDistSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.GraftShims.quietCheckpointLogs()

    val n = 1000000L
    // 40 hex chars, deterministic per id: two md5 halves → far apart
    // for ANY two distinct ids (an accidental ed≤2 pair needs ≥38
    // matching positions of 40)
    def baseStr(id: Column): Column =
      substring(concat(md5(id.cast("string")),
        md5((id + 1000003L).cast("string"))), 1, 40)
    // deterministic in-bounds edit position 1..37
    val p = (col("id") % 37L + 1L).cast("int")
    val src = baseStr(col("id") - 1L) // planted rows copy id−1's string
    val sub = concat(substring(src, lit(1), p - 1), lit("z"),
      substring(src, p + 1, lit(40)))
    val ins = concat(substring(src, lit(1), p - 1), lit("z"),
      substring(src, p, lit(41)))
    val rows = spark.range(n).select(col("id"),
      when(col("id") % 20L === 0L && col("id") > 0L, sub)
        .when(col("id") % 20L === 10L, ins)
        .otherwise(baseStr(col("id"))).as("t"))

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val (sec, pairs) = time {
      graft.ext.Dedup.editDistancePairsBlocked(rows, "id", "t", maxDist = 2)
        .localCheckpoint(true)
    }
    val nPairs = pairs.count()
    // planted pairs are (id−1, id) with id%20 ∈ {0, 10}, dist 1
    val planted = pairs.filter(col("id_b") - col("id_a") === 1L &&
      (col("id_b") % 20L === 0L || col("id_b") % 20L === 10L) &&
      col("dist") === 1L).count()
    val expected = (n / 20L - 1L) + n / 20L // id=0 can't copy id=−1
    org.apache.spark.sql.GraftShims.releaseCheckpoint(pairs)

    val json =
      f"""{"n_strings":$n,"str_len":40,"max_dist":2,"pairs_sec":$sec%.1f,"n_pairs":$nPairs,"planted_expected":$expected,"planted_found":$planted,"planted_recall":${planted.toDouble / expected}%.4f}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("editdist_soak_1m.json"), json)
    println(json)
    spark.stop()
  }
}
