package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-evaluation helpers: measure approximate operators against
  * their exact counterparts on a bounded sample (cheap enough to run in
  * every benchmark round). */
object Eval {

  /** Recall of MinHash-LSH near-dup pairs vs exact n-gram Jaccard pairs,
    * on a deterministic sample of `sampleSize` docs. Returns
    * (recall, precisionProxy=1.0 since candidates are exact-verified,
    * exactPairCount). */
  def minhashRecall(docs: DataFrame, idCol: String, textCol: String,
      sampleSize: Int = 200, shingleSize: Int = 3, threshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8): (Double, Long) = {
    val sample = docs.orderBy(col(idCol)).limit(sampleSize)
      .select(col(idCol).as("id"), col(textCol).as("text")).cache()
    try {
      val a = sample.select(col("id").as("id_a"), col("text").as("text_a"))
      val b = sample.select(col("id").as("id_b"), col("text").as("text_b"))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .withColumn("j", Dedup.jaccardUdf(shingleSize)(col("text_a"), col("text_b")))
        .filter(col("j") >= threshold)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      if (exact.isEmpty) return (1.0, 0L)
      val lsh = Dedup.nearDupPairsMinhash(sample, "id", "text",
          shingleSize, numHashes, bands, threshold)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact.count(lsh.contains).toDouble / exact.size, exact.size.toLong)
    } finally { sample.unpersist(false); () }
  }

  /** Recall@k of probed IVF search vs brute force for one target. */
  def probedRecall(engine: graft.api.Engine, source: String, column: String,
      coding: String, target: Array[Double], k: Int, probes: Int): Double = {
    val brute = engine.search(source, column, target,
        metric = Some(engine.store.loadCoding(coding).config.metric), k = k,
        tieBreak = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val probed = engine.search(source, column, target, coding = Some(coding),
        probes = Some(probes), k = k, tieBreak = Seq("vec_id"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    if (brute.isEmpty) 1.0 else brute.count(probed.contains).toDouble / brute.size
  }
}
