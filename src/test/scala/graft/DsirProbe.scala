package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .localCheckpoint(true)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); a
    }
    time("warm count")(d.count())
    val model = time("train1") {
      graft.ext.Corpus.dsirTrain(d.filter(col("lang") === "en"), d, "text",
        buckets = 512, smoothing = 1.0)
    }
    time("train2") {
      graft.ext.Corpus.dsirTrain(d.filter(col("lang") === "en"), d, "text",
        buckets = 512, smoothing = 1.0)
    }
    time("weights count") {
      graft.ext.Corpus.dsirWeights(d, "doc_id", "text", model)
        .agg(sum("dsir_weight")).head()
    }
    time("ngram explode count") {
      d.filter(col("text").isNotNull)
        .select(explode(graft.ext.Corpus.dsirNgrams(col("text"))).as("g"))
        .count()
    }
    spark.stop()
  }
}
