package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted inverted-index tier for BM25 lexical retrieval.
  *
  * [[TextAnalysis.bm25Scores]] is exact but rescans the whole corpus
  * per query (one stats agg + one scoring map) — fine for a batch
  * scoring job, wrong for serving keyword queries against 100 TB. This
  * tier materializes the classic IR artifacts once:
  *
  *  - postings `(term, id, tf, __TERM_BUCKET__)`, written PARTITIONED
  *    BY the term bucket so a query's terms prune to their buckets at
  *    the file-listing level (the lexical analogue of the IVF tiers'
  *    `__CODED_ID__` partition pruning);
  *  - doc lengths `(id, dl)` — the narrow 2-column side every query
  *    needs for the BM25 length normalization.
  *
  * [[bm25FromIndex]] then answers a query touching only the query
  * terms' postings: corpus stats are one bounded agg over doc lengths
  * plus a per-term count over the PRUNED postings, and scoring joins
  * the ≤ (matching docs) pivoted term frequencies back to their
  * lengths. Scores equal [[TextAnalysis.bm25Scores]] bit-for-bit on
  * every document containing at least one query term (documents with
  * zero matching terms score exactly 0 there and are simply absent
  * here — an index cannot, and need not, enumerate non-matches).
  */
object Lexical {

  /** The corpus token convention (shared with
    * [[TextAnalysis.bm25Scores]] and its oracle): lowercase, split on
    * single spaces, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= lit(""))

  /** Term → partition bucket: CRC32 of the UTF-8 bytes mod `buckets`.
    * CRC32 because BOTH sides can compute it identically — Spark's
    * `crc32` expression at build time, `java.util.zip.CRC32` on the
    * driver at query time (term pruning needs the bucket of a query
    * term BEFORE any job runs). */
  def termBucket(term: String, buckets: Int): Int = {
    val c = new java.util.zip.CRC32()
    c.update(term.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (c.getValue % buckets).toInt
  }

  private def termBucketCol(term: Column, buckets: Int): Column =
    (crc32(encode(term, "UTF-8")) % buckets).cast("int")

  /** Postings list of a corpus: one row per (term, document) with the
    * term's occurrence count. One explode + one map-side-combined
    * groupBy — the only shuffle is on (term, id). */
  def postings(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))
      .withColumn("__TERM_BUCKET__", termBucketCol(col("term"), buckets))
  }

  /** Document lengths under the same token convention (null-text docs
    * excluded, matching [[TextAnalysis.bm25Scores]]). */
  def docLengths(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("dl"))

  /** BM25 scores of every document containing at least one query term,
    * from the materialized index. Two bounded driver actions (the
    * 1-row corpus stats; ≤ |terms| document frequencies — both over
    * pruned/narrow frames), then one scoring join.
    *
    * Bit-parity with [[TextAnalysis.bm25Scores]]: per-doc term
    * frequencies are PIVOTED into fixed term order and the score sums
    * left-associatively in input order — a groupBy-sum over per-term
    * contribution rows would re-associate the float additions. idf and
    * avgdl are computed driver-side with the identical IEEE ops;
    * round(…, 6) absorbs ln's ≤1-ulp runtime divergence as there. */
  def bm25FromIndex(post: DataFrame, docLens: DataFrame, terms: Seq[String],
      buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25FromIndex: at least one term")
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "bm25FromIndex: terms must be non-empty and lowercase")
    val bks = terms.map(termBucket(_, buckets)).distinct
    // bucket filter FIRST — it is the partition-pruning predicate when
    // the postings frame is the partitioned parquet artifact
    val hit = post.filter(col("__TERM_BUCKET__").isin(bks: _*) &&
      col("term").isin(terms: _*))
    val s = docLens.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
    val n = s.getLong(0)
    require(n > 0, "bm25FromIndex: empty doc-length table")
    val avgdl = s.getLong(1).toDouble / n.toDouble
    val dfMap = hit.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idfs = terms.map { t =>
      val dfi = dfMap.getOrElse(t, 0L).toDouble
      math.log(1.0 + (n.toDouble - dfi + 0.5) / (dfi + 0.5))
    }
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("tf"))).as(s"__tf$i")
    }
    val tfs = hit.groupBy("id").agg(tfAggs.head, tfAggs.tail: _*)
    val norm = lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))
    val score = terms.indices.map { i =>
      val tf = coalesce(col(s"__tf$i"), lit(0L)).cast("double")
      lit(idfs(i)) * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    tfs.join(docLens, Seq("id"))
      .select(col("id"), round(score, 6).as("bm25"))
  }
}
