package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: CardRedact kernel vs the HOF chain on the sf0.1
  * documents table (and on a synthetic digit-heavy corpus where the
  * per-candidate Luhn fold actually fires — the real corpus has few
  * candidates, so the chain's interpreted-projection overhead, not the
  * fold, is what the ledger query measures). */
object CardRedactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull).localCheckpoint()
    println(s"[card-probe] docs=${docs.count()}")
    def run(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val agg = () => df.agg(sum(length(col("redacted"))),
        sum(col("n_cards_valid"))).collect()
      agg() // warm
      val t = (1 to 3).map(_ => time(agg())).min
      println(f"[card-probe] $label: $t%.3f s")
    }
    run("kernel_docs", graft.ext.Corpus.redactCards(docs, "text"))
    run("chain_docs", graft.ext.Corpus.redactCardsChain(docs, "text"))
    // synthetic: every row carries several candidates (mixed valid and
    // invalid) embedded in filler — the fold-dominated regime
    import spark.implicits._
    val syn = spark.range(200000L).map { i =>
      val cards = Seq("4532015112830366", "4111 1111 1111 1111",
        "1234567890123456", "371449635398431", "4532-0151-1283-0367")
      val sb = new StringBuilder
      var j = 0
      while (j < 5) {
        sb.append("filler text segment ").append(i + j)
          .append(' ').append(cards((i % 5).toInt))
          .append(" more words here ")
        j += 1
      }
      sb.toString
    }.toDF("text").localCheckpoint()
    println(s"[card-probe] syn=${syn.count()}")
    run("kernel_syn", graft.ext.Corpus.redactCards(syn, "text"))
    run("chain_syn", graft.ext.Corpus.redactCardsChain(syn, "text"))
    spark.stop()
  }
}
