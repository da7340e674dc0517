package graft

import org.apache.spark.sql.SparkSession

object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val m2 = t("train order2")(graft.ext.NgramLm.train(docs, "text",
      vocabSize = 2048, minCount = 2L, order = 2))
    val m3 = t("train order3")(graft.ext.NgramLm.train(docs, "text",
      vocabSize = 2048, minCount = 2L, order = 3))
    println(s"bigrams=${m3.bigrams.size} trigrams=${m3.trigrams.size}")
    t("score order2")(graft.ext.NgramLm.perplexity(docs, "doc_id", "text", m2).count())
    t("score order3")(graft.ext.NgramLm.perplexity(docs, "doc_id", "text", m3).count())
    t("score order3 again")(graft.ext.NgramLm.perplexity(docs, "doc_id", "text", m3).count())
    t("toJson")(m3.toJson.length)
    spark.stop()
  }
}
