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

  /** BM25 scores of every document containing at least one query term
    * (or, with `requireAll`, EVERY query term — conjunctive retrieval:
    * at 100 TB an AND query shrinks the scoring join from the union of
    * the terms' postings to their intersection, and the filter is on
    * the already-pivoted frame so no extra pass runs), from the
    * materialized index. Two bounded driver actions (the 1-row corpus
    * stats; ≤ |terms| document frequencies — both over pruned/narrow
    * frames), then one scoring join.
    *
    * Bit-parity with [[TextAnalysis.bm25Scores]]: per-doc term
    * frequencies are PIVOTED into fixed term order and the score sums
    * left-associatively in input order — a groupBy-sum over per-term
    * contribution rows would re-associate the float additions. idf and
    * avgdl are computed driver-side with the identical IEEE ops;
    * round(…, 6) absorbs ln's ≤1-ulp runtime divergence as there.
    * Conjunctive scores equal disjunctive scores on the surviving docs
    * (document frequencies — hence idfs — still count ALL matches). */
  def bm25FromIndex(post: DataFrame, docLens: DataFrame, terms: Seq[String],
      buckets: Int = 64, k1: Double = 1.2, b: Double = 0.75,
      requireAll: Boolean = false): DataFrame = {
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
    val pivoted = hit.groupBy("id").agg(tfAggs.head, tfAggs.tail: _*)
    val tfs =
      if (requireAll)
        pivoted.filter(terms.indices
          .map(i => col(s"__tf$i").isNotNull).reduce(_ && _))
      else pivoted
    val norm = lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))
    val score = terms.indices.map { i =>
      val tf = coalesce(col(s"__tf$i"), lit(0L)).cast("double")
      lit(idfs(i)) * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    tfs.join(docLens, Seq("id"))
      .select(col("id"), round(score, 6).as("bm25"))
  }

  /** Positional postings: one row per (term, document) carrying the
    * SORTED 0-based token positions of every occurrence — the artifact
    * phrase queries need. Same single explode + map-side-combined
    * groupBy shape as [[postings]] (`tf` = the positions count, so one
    * artifact serves both BM25 and phrase queries), same
    * `__TERM_BUCKET__` partition pruning. */
  def positionalPostings(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))
      .select(col("term"), col("id"), col("positions"),
        size(col("positions")).cast("long").as("tf"),
        termBucketCol(col("term"), buckets).as("__TERM_BUCKET__"))
  }

  /** Documents containing the exact consecutive token sequence
    * `phrase`, with the occurrence count — through the positional
    * index. Pulls only the phrase terms' posting buckets, pivots each
    * term's position array into fixed phrase order, and counts the
    * start positions whose successors all line up
    * (`exists`/`array_contains` over the pivoted arrays — one codegen
    * projection, no per-position explode). A document missing ANY
    * phrase term is dropped by the pivot-null filter before the
    * position intersection runs. Output: (id, hits), hits ≥ 1. */
  def phraseMatch(posPost: DataFrame, phrase: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch: at least one phrase term")
    require(phrase.forall(t => t.nonEmpty && t == t.toLowerCase),
      "phraseMatch: phrase terms must be non-empty and lowercase")
    val bks = phrase.map(termBucket(_, buckets)).distinct
    val hit = posPost.filter(col("__TERM_BUCKET__").isin(bks: _*) &&
      col("term").isin(phrase.distinct: _*))
    val posAggs = phrase.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("positions"))).as(s"__pos$i")
    }
    val pivoted = hit.groupBy("id").agg(posAggs.head, posAggs.tail: _*)
      .filter(phrase.indices.map(i => col(s"__pos$i").isNotNull)
        .reduce(_ && _))
    val hits = size(filter(col("__pos0"), p =>
      phrase.indices.drop(1)
        .map(i => array_contains(col(s"__pos$i"), p + i))
        .foldLeft(lit(true): Column)(_ && _)))
    pivoted.select(col("id"), hits.cast("long").as("hits"))
      .filter(col("hits") > 0L)
  }

  // ——— TF-IDF cosine all-pairs similarity join ———

  /** Unit-normalized TF-IDF document vectors under the corpus token
    * convention: one row per document with the term-ASC-sorted array
    * of (term, u) entries. Weight w = tf · ln(1 + N/df) with N = the
    * non-null-text document count and df = documents containing the
    * term; the norm sums w² by a LEFT FOLD over the term-sorted array
    * so a SQL mirror (`list_inner_product` of the same sorted list
    * with itself) reproduces the float association order bit-for-bit.
    * Docs with no tokens produce no vector. One explode + two
    * map-side-combined aggs + a broadcast 1-row N join — no driver
    * action, no per-row UDF. */
  def tfidfVectors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.filter(col(textCol).isNotNull)
    val tf = base
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).cast("double").as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val n = base.agg(count(lit(1)).cast("double").as("n"))
    val w = tf.join(dfq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf") * log(lit(1.0) + col("n") / col("df"))).as("w"))
    w.groupBy("id")
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("warr"))
      .select(col("id"), col("warr"),
        sqrt(aggregate(col("warr"), lit(0.0),
          (acc, s) => acc + s("w") * s("w"))).as("norm"))
      .select(col("id"), transform(col("warr"),
        s => struct(s("term").as("term"), (s("w") / col("norm")).as("u")))
        .as("vec"))
  }

  /** The pair scorer both variants share: dot = Σ u_a·u_b over shared
    * terms accumulated in ascending-term order — the same multiply-add
    * sequence as the SQL mirror's `list_inner_product` over the sorted
    * shared list. One codegen'd merge pass per pair
    * ([[graft.functions.SparseDot]]); the previous
    * map_from_entries→filter→aggregate HOF chain evaluated INTERPRETED
    * (HOF lambdas are CodegenFallback) at ~140µs/pair — 17s of the two
    * ledger queries' ~14s each sat in it. Rounded to 6 decimals BEFORE
    * the threshold filter so a ≤1-ulp `ln` divergence between engines
    * cannot flip a boundary pair. */
  private def scorePairs(cand: DataFrame, vecs: DataFrame,
      threshold: Double): DataFrame = {
    val va = vecs.select(col("id").as("id_a"), col("vec").as("va"))
    val vb = vecs.select(col("id").as("id_b"), col("vec").as("vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(graft.functions.functions.sparse_dot(col("va"), col("vb")), 6)
          .as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Candidate-volume guard both all-pairs variants run BEFORE their
    * quadratic self-join: the join materializes Σ_t df_t·(df_t−1)/2
    * rows (df_t = the posting length feeding it), so a dense
    * vocabulary — e.g. a 31-term corpus where every term appears in
    * ~78% of documents — silently degenerates to all-pairs no matter
    * how clever the candidate filter is. Over `maxCandidates` the call
    * is REFUSED loudly, naming the worst posting lists — the same
    * fail-don't-degrade discipline as minhash's `maxBucket` star cap
    * and the 32k INSET cap. Two bounded jobs over the vocabulary-sized
    * (term, df) frame; pair counts sum in double (a guard needs
    * magnitude, not exactness, and df² overflows long past ~4.3B
    * docs). */
  private def guardCandidates(terms: DataFrame, op: String,
      maxCandidates: Long): Unit = {
    val dfq = terms.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .withColumn("pairs", col("df") * (col("df") - 1) / 2)
    val row = dfq.agg(sum(col("pairs"))).head()
    val total = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    if (total > maxCandidates.toDouble) {
      val worst = dfq.orderBy(col("pairs").desc).limit(5).collect()
        .map(r => s"'${r.getString(0)}' (df=${r.getDouble(1).toLong})")
        .mkString(", ")
      throw new IllegalArgumentException(
        f"$op: candidate volume ≈ $total%.3g pairs exceeds " +
          s"maxCandidates=$maxCandidates — the shared-term self-join " +
          s"would be quadratic (worst posting lists: $worst). " +
          "Shrink the corpus slice, use tfidfCosinePairsPrefix with a " +
          "higher threshold, or raise maxCandidates deliberately.")
    }
  }

  /** Exact TF-IDF cosine all-pairs join: every unordered document pair
    * with cosine ≥ threshold. Candidates are pairs sharing ≥ 1 term
    * (a pair sharing none has cosine 0), so this is quadratic in the
    * per-term posting lengths — the ORACLE baseline.
    * [[tfidfCosinePairsPrefix]] produces the identical result with the
    * prefix-filtered candidate set and is the variant to run at scale.
    * Refuses (via [[guardCandidates]]) when the shared-term join would
    * exceed `maxCandidates` pair rows. */
  def tfidfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxCandidates: Long = 50000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxCandidates >= 1, s"maxCandidates must be >= 1")
    // localCheckpoint: the tokenize → tf/df aggs → per-doc sort+norm
    // chain is read FOUR times (guard, both self-join sides via terms1,
    // and both scorePairs sides) — materializing the slim (id, vec)
    // rows runs it once (the minhash `banded` discipline); per-doc
    // folds are over sort_array'd entries, so the values are
    // placement-independent. Blocks released after the (small) result
    // materializes.
    val vecs = tfidfVectors(df, idCol, textCol).localCheckpoint()
    try {
      val terms1 = vecs.select(col("id").as("id_a"),
        explode(transform(col("vec"), s => s("term"))).as("term"))
      guardCandidates(terms1, "tfidfCosinePairs", maxCandidates)
      val terms2 = terms1.select(col("id_a").as("id_b"), col("term"))
      val cand = terms1.join(terms2, "term")
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      scorePairs(cand, vecs, threshold).localCheckpoint(true)
    } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(vecs)
  }

  /** Prefix-filtered TF-IDF cosine all-pairs join (Bayardo et al.,
    * WWW 2007 "Scaling Up All Pairs Similarity Search"): identical
    * output to [[tfidfCosinePairs]], candidate generation reduced from
    * every-shared-term to shared-PREFIX-term.
    *
    * Per document, order its unit weights by global term rarity
    * (df ASC, term ASC) and keep position i in the indexed prefix iff
    * the tail norm √(Σ_{j≥i} u_j²) ≥ threshold − ε: if two documents
    * share NO prefix term, every shared term lies in one document's
    * suffix, so cosine ≤ ‖u_suffix‖ < threshold — the pair is safely
    * never generated. Rare terms sort first, so the prefix join's
    * posting lists are the SHORT ones: the frequent-term quadratic
    * blowup of the exact variant is exactly what gets pruned. ε
    * (1e-5) absorbs the float tail-sum error plus the round-to-6
    * output filter so the boundary pair set matches the exact
    * variant's. Tail norms come from one window pass per document
    * (position-descending running sum — no per-doc quadratic slice).
    *
    * Verification then scores ONLY candidate pairs with the same
    * shared-term fold as the exact variant.
    *
    * Refuses (via [[guardCandidates]], measured over the PREFIX
    * posting lists — the ones that actually self-join here) when the
    * candidate volume would exceed `maxCandidates`: prefix filtering
    * prunes a Zipfian vocabulary by orders of magnitude but cannot
    * save a degenerate one where every document's prefix collides. */
  def tfidfCosinePairsPrefix(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxCandidates: Long = 50000000L): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxCandidates >= 1, s"maxCandidates must be >= 1")
    val eps = 1e-5
    // localCheckpoint both reused frames (the minhash `banded`
    // discipline): `vecs` feeds the entry explode AND both scorePairs
    // sides, `prefix` feeds the guard AND both candidate self-join
    // sides — without the cut each branch re-runs the tokenize/agg/
    // window chain (measured: 32 Exchanges in this one plan). Per-doc
    // folds are over sort_array'd entries; the window is order-pinned
    // by (df, term) — placement-independent values.
    val vecs = tfidfVectors(df, idCol, textCol).localCheckpoint()
    try {
      val entries = vecs.select(col("id"),
        explode(col("vec")).as("e")).select(col("id"),
        col("e")("term").as("term"), col("e")("u").as("u"))
      val dfq = entries.groupBy("term").agg(count(lit(1)).as("df"))
      // rarity order is (df ASC, term ASC); the tail-norm running sum
      // walks it REVERSED so one window pass yields Σ_{j≥i} u_j²
      val tail = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("df").desc, col("term").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val prefix = entries.join(dfq, "term")
        .withColumn("tailsq", sum(col("u") * col("u")).over(tail))
        .filter(sqrt(col("tailsq")) >= threshold - eps)
        .select(col("id"), col("term"))
        .localCheckpoint()
      try {
        guardCandidates(prefix.select(col("term")), "tfidfCosinePairsPrefix",
          maxCandidates)
        val p1 = prefix.select(col("id").as("id_a"), col("term"))
        val p2 = prefix.select(col("id").as("id_b"), col("term"))
        val cand = p1.join(p2, "term")
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        scorePairs(cand, vecs, threshold).localCheckpoint(true)
      } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(prefix)
    } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(vecs)
  }
}
