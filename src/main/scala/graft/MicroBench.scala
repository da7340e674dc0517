package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Metrics
import graft.functions.functions.vector_distance

/** Micro-benchmark: native codegen VectorDistance vs equivalent Scala UDF
  * on a generated 1M × 64-d corpus. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 64
    val gen = udf { (id: Long) =>
      val r = new java.util.Random(id); Array.fill(dim)(r.nextFloat())
    }
    val df = spark.range(1000000L).toDF("id")
      .withColumn("v", gen(col("id"))).cache()
    df.count()
    val target = Array.fill(dim)(0.5)
    val udfDist = udf { (v: Seq[Float]) =>
      Metrics.dist(v.map(_.toDouble).toArray, target, "l2")
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then best of 3
    def run(c: org.apache.spark.sql.Column): Double =
      (1 to 3).map(_ => time(df.select(sum(c)).collect())).min
    val tExpr = run(vector_distance(col("v"), typedLit(target.toSeq), "l2"))
    val tUdf = run(udfDist(col("v")))
    println(f"[micro] 1M x ${dim}d l2: codegen=$tExpr%.3f s, udf=$tUdf%.3f s, speedup=${tUdf / tExpr}%.1fx")
    spark.stop()
  }
}
