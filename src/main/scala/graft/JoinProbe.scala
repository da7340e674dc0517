package graft

import org.apache.spark.sql.SparkSession

/** One-off probe: batch kNN join variants, best-of-3 at a given SF dir —
  * for separating plan regressions from noisy-neighbor swings (the full
  * Bench takes ~40 min under load; this answers the one question in ~1). */
object JoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("knn_join", "knn_join_ivf", "knn_join_sq", "knn_l2")) {
      val fn = SparkEntry.queries(q)
      val ts = (1 to 3).map(_ => time(fn(spark, sfDir).count()))
      println(f"[joinprobe] $q: best=${ts.min}%.3f s (all: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
