package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the fuzzy-artifact BATCH join (r17 verdict #7): build
  * one artifact, then time the 1k-query join under (a) the round-18
  * serving path (hit-bucket pruning + broadcast-left) and (b) the old
  * shape (full artifact frames, shuffle joins), plus a 10-query
  * micro-batch under both — the gate regime where pruning actually
  * bites (1k random queries cover all 512 buckets; 10 queries do not).
  * Run: `sbt "runMain graft.FuzzyJoinProbe 2000000"`. */
object FuzzyJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.spark.sql.GraftShims.quietCheckpointLogs()
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    def baseStr(id: org.apache.spark.sql.Column) =
      substring(concat(md5(id.cast("string")),
        md5((id + 1000003L).cast("string"))), 1, 40)
    val rows = spark.range(n).select(col("id"), baseStr(col("id")).as("t"))
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-fzjprobe").toString
    val e = new graft.api.Engine(spark, root)
    e.makeTable("fzp", rows)
    val (buildSec, _) = time {
      e.buildFuzzyIndex("fzp", "id", "t", maxDist = 2, buckets = 512)
    }
    println(f"[fzjoin-probe] n=$n build=$buildSec%.1f s")

    def queries(q: Int) = spark.range(q)
      .select((col("id") * lit(9973L) % lit(n)).as("qsrc"))
      .join(rows, col("qsrc") === col("id"))
      .select(col("qsrc").as("qid"),
        concat(lit("z"), substring(col("t"), 2, 39)).as("qt"))
      .localCheckpoint()

    def runNew(q: org.apache.spark.sql.DataFrame): Long =
      e.fuzzyJoin("fzp", "t", q, "qid", "qt").count()
    def runOld(q: org.apache.spark.sql.DataFrame): Long = {
      val base = e.store.fuzzyIndexPath("fzp", "t")
      val rb = spark.read.parquet(s"$base/base").select("id", "t", "len")
      val rSegs = spark.read.parquet(s"$base/segs")
        .select(col("l"), col("i"), col("g"), col("id").as("id_b"))
      val rProbes = spark.read.parquet(s"$base/probes")
        .select(col("l"), col("i"), col("g"), col("id").as("id_b"))
      val segCounts = spark.read.parquet(s"$base/segcounts")
        .groupBy("l", "i", "g").agg(sum("ns").as("ns"))
      val probeCounts = spark.read.parquet(s"$base/probecounts")
        .groupBy("l", "i", "g").agg(sum("np").as("np"))
      graft.ext.Dedup.editDistanceJoinAgainstFrames(q, "qid", "qt",
        rb, rSegs, rProbes, 2, 50000000L,
        Some(segCounts), Some(probeCounts)).count()
    }
    for (q <- Seq(10, 1000)) {
      val qdf = queries(q)
      val (tNew, rNew) = time(runNew(qdf))
      val (tOld, rOld) = time(runOld(qdf))
      val (tNew2, _) = time(runNew(qdf))
      val (tOld2, _) = time(runOld(qdf))
      println(f"[fzjoin-probe] q=$q new=${math.min(tNew, tNew2)}%.2f s " +
        f"old=${math.min(tOld, tOld2)}%.2f s rows new=$rNew old=$rOld")
      require(rNew == rOld, s"result mismatch: $rNew vs $rOld")
      org.apache.spark.sql.GraftShims.releaseCheckpoint(qdf)
    }
    spark.stop()
  }
}
