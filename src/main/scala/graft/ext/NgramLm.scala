package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
  * Datasets from Web Crawl Data", LREC 2020): train a small LM on a
  * reference corpus, score candidate documents by per-token perplexity,
  * and keep the low-perplexity (fluent) tail. The model here is a bigram
  * LM with stupid backoff (Brants et al., "Large Language Models in
  * Machine Translation", EMNLP 2007) — unnormalized scores are exactly
  * what a ranking/thresholding filter needs, and the arithmetic is simple
  * enough to mirror term-for-term in a SQL oracle.
  *
  * Scale shape: training is two distributed integer aggs (token counts →
  * top-V vocab; bigram counts over vocab-mapped tokens), both bounded on
  * the driver by `vocabSize` / `maxBigrams` with a loud refusal — never
  * an unbounded collect. Scoring is one narrow map with the model
  * broadcast; no shuffle touches the corpus.
  *
  * Determinism/mirror contract: tokens = lowercase split on single
  * spaces, empties dropped (the corpus convention shared with
  * [[TextAnalysis.bm25Scores]]); vocab tie-break = (count desc, token
  * asc); every probability is formed with the same association the
  * DuckDB mirror uses (`count/count` and `(alpha * count) / total`); the
  * per-document negative log-likelihood folds `-ln(S)` LEFT-TO-RIGHT in
  * token order from 0.0; perplexity = `round(exp(nll / n), 6)` — the
  * rounding absorbs cross-runtime `ln`/`exp` ulp drift.
  */
object NgramLm {

  /** Sentence-start context token. A corpus token spelled exactly
    * `"<s>"`/`"<unk>"` collides with the markers (documented, harmless
    * for filtering: it scores as the marker). */
  val Start = "<s>"
  val Unk = "<unk>"

  /** Total model broadcasts ever created — observable in tests to prove
    * repeated scoring does not accumulate broadcast blocks. */
  private[graft] val broadcastsCreated = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persisted backoff LM. Unigram counts include one [[Start]] per
    * training document; `total` = Σ unigram counts. For `order == 3`, the
    * bigram table is counted over the DOUBLY-[[Start]]-padded sequence
    * (so the `(<s>, <s>)` context of each document's first token is a
    * countable denominator) and `trigrams` holds the min-count-pruned
    * triple counts; for `order == 2` it is singly padded and `trigrams`
    * is empty. */
  case class NgramLmModel(
      vocab: IndexedSeq[String],
      unigrams: Map[String, Long],
      bigrams: Map[(String, String), Long],
      total: Long,
      alpha: Double,
      order: Int = 2,
      trigrams: Map[(String, String, String), Long] = Map.empty) {

    /** Vocab membership for scoring — memoized per instance (driver and,
      * after deserialization, once per executor), so scoring needs no
      * second broadcast alongside the model itself. */
    @transient lazy val vocabSet: Set[String] = vocab.toSet

    /** One broadcast per model INSTANCE, memoized: repeated scoring with
      * the same loaded model (the server's perplexity route) reuses a
      * single broadcast instead of accumulating two new ones per call.
      * When the instance is dropped, Spark's ContextCleaner reclaims the
      * broadcast blocks. */
    @transient private var bcRef: org.apache.spark.broadcast.Broadcast[NgramLmModel] = _
    private[graft] def broadcastFor(sc: org.apache.spark.SparkContext)
        : org.apache.spark.broadcast.Broadcast[NgramLmModel] = synchronized {
      if (bcRef == null) {
        bcRef = sc.broadcast(this)
        NgramLm.broadcastsCreated.incrementAndGet()
      }
      bcRef
    }

    /** Stupid-backoff score S(w | p); both tokens must already be
      * vocab-mapped. */
    def score(p: String, w: String): Double =
      bigrams.get((p, w)) match {
        case Some(c) => c.toDouble / unigrams(p).toDouble
        case None    => alpha * unigrams(w).toDouble / total.toDouble
      }

    /** Trigram stupid backoff S(w | p2 p1) → alpha·S(w | p1) → … */
    def score3(p2: String, p1: String, w: String): Double =
      trigrams.get((p2, p1, w)) match {
        case Some(c) => bigrams.get((p2, p1)) match {
          case Some(ctx) => c.toDouble / ctx.toDouble
          case None      => alpha * score(p1, w)
        }
        case None => alpha * score(p1, w)
      }

    def toJson: String = {
      def q(s: String) =
        "\"" + s.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      val uni = unigrams.toSeq.sortBy(_._1)
        .map { case (t, c) => s"""{"t":${q(t)},"c":$c}""" }
        .mkString("[", ",", "]")
      val big = bigrams.toSeq.sortBy(x => (x._1._1, x._1._2))
        .map { case ((p, w), c) => s"""{"p":${q(p)},"w":${q(w)},"c":$c}""" }
        .mkString("[", ",", "]")
      val tri = trigrams.toSeq.sortBy(x => (x._1._1, x._1._2, x._1._3))
        .map { case ((p2, p1, w), c) =>
          s"""{"p2":${q(p2)},"p1":${q(p1)},"w":${q(w)},"c":$c}""" }
        .mkString("[", ",", "]")
      s"""{"alpha":$alpha,"total":$total,"order":$order,""" +
        s""""vocab":${vocab.map(q).mkString("[", ",", "]")},""" +
        s""""unigrams":$uni,"bigrams":$big,"trigrams":$tri}"""
    }
  }

  def fromJson(json: String): NgramLmModel = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val vocab = (0 until node.get("vocab").size())
      .map(node.get("vocab").get(_).asText())
    val uni = (0 until node.get("unigrams").size()).map { i =>
      val u = node.get("unigrams").get(i)
      u.get("t").asText() -> u.get("c").asLong()
    }.toMap
    val big = (0 until node.get("bigrams").size()).map { i =>
      val b = node.get("bigrams").get(i)
      (b.get("p").asText(), b.get("w").asText()) -> b.get("c").asLong()
    }.toMap
    val triNode = node.get("trigrams")
    val tri =
      if (triNode == null) Map.empty[(String, String, String), Long]
      else (0 until triNode.size()).map { i =>
        val t = triNode.get(i)
        (t.get("p2").asText(), t.get("p1").asText(), t.get("w").asText()) ->
          t.get("c").asLong()
      }.toMap
    val order = if (node.get("order") == null) 2 else node.get("order").asInt()
    NgramLmModel(vocab, uni, big, node.get("total").asLong(),
      node.get("alpha").asDouble(), order, tri)
  }

  /** Lowercase single-space tokens, empties dropped (bm25 convention). */
  private def toksCol(textCol: String) =
    filter(split(lower(col(textCol)), " "), t => t =!= lit(""))

  /** Train a stupid-backoff LM (`order` 2 = bigram, 3 = trigram) over
    * `textCol`.
    *
    * `vocabSize` caps the vocabulary at the top-V tokens by (count desc,
    * token asc) — everything else maps to [[Unk]]. `minCount` prunes rare
    * bigrams/trigrams from the model (they fall back one order at
    * scoring time, exactly like unseen tuples; a surviving trigram's
    * context bigram always survives too, since its count is ≥ the
    * trigram's). `maxBigrams` is the driver-size guard on EACH count
    * table: training REFUSES loudly rather than collecting an oversized
    * model. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 4096,
      minCount: Long = 1L, alpha: Double = 0.4,
      maxBigrams: Long = 4000000L, order: Int = 2): NgramLmModel = {
    require(vocabSize >= 1, s"train: vocabSize must be >= 1, got $vocabSize")
    require(minCount >= 1, s"train: minCount must be >= 1, got $minCount")
    require(alpha > 0 && alpha <= 1, s"train: alpha must be in (0,1], got $alpha")
    require(order == 2 || order == 3, s"train: order must be 2 or 3, got $order")
    // spread + localCheckpoint: the vocab, unigram and bigram/trigram
    // passes each re-ran the single-task tokenize (a plain spread made
    // it WORSE — three actions re-paid the exchange); materializing the
    // token arrays once, parallel, feeds every pass from executor
    // storage. Counts are integers, so placement cannot move the
    // result; blocks are released before returning (the model is
    // driver-side, nothing lazy escapes).
    val base = graft.core.Par.spread(
        df.filter(col(textCol).isNotNull).select(col(textCol)))
      .select(toksCol(textCol).as("__t__"))
      .filter(size(col("__t__")) >= 1)
      .localCheckpoint()
    try {
    val vocab = base.select(explode(col("__t__")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(vocabSize)
      .select("tok").collect().map(_.getString(0)).toIndexedSeq
    val vocabSet = vocab.toSet
    val spark = df.sparkSession
    val bcVocab = spark.sparkContext.broadcast(vocabSet)
    val mapUdf = udf { (ts: Seq[String]) =>
      Start +: ts.map(t => if (bcVocab.value(t)) t else Unk)
    }
    val seqs = base.select(mapUdf(col("__t__")).as("__s__"))
    val uniRows = seqs.select(explode(col("__s__")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect()                                   // ≤ vocabSize + 2 rows
    val counted = uniRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counted.nonEmpty, "train: corpus has no non-empty documents")
    // add-one floor so scoring a corpus with OOV tokens never sees a
    // missing <unk> count even when training saw the full vocabulary
    val unigrams =
      if (counted.contains(Unk)) counted else counted + (Unk -> 1L)
    val total = unigrams.valuesIterator.sum
    // bigram counts: pairs of the (order-3: doubly) padded sequence — the
    // extra (<s>, <s>) per doc is exactly the first-token trigram context.
    // The padding is MATERIALIZED as a column before any lambda touches
    // it: there is no CSE inside HOF lambdas, so an element_at over an
    // inline concat would re-copy the whole array per element (the same
    // d²-work trap the round-3 cosine-norm fix closed).
    val padded =
      if (order == 3)
        seqs.select(concat(array(lit(Start)), col("__s__")).as("__s__"))
      else seqs
    def tupleCounts(n: Int, names: Seq[String]) = {
      val s = col("__s__")
      val tuples = padded.select(explode(transform(
        sequence(lit(1), size(s) - (n - 1)),
        i => struct(names.zipWithIndex.map { case (nm, j) =>
          element_at(s, i + j).as(nm) }: _*))).as("tp"))
      tuples.groupBy(names.map(nm => col(s"tp.$nm").as(nm)): _*)
        .agg(count(lit(1)).as("c"))
        .filter(col("c") >= minCount)
    }
    def guarded(dfc: DataFrame, what: String): Array[org.apache.spark.sql.Row] = {
      // one job: fetch at most the cap + 1 rows, refuse on overflow
      val rows = dfc.limit(
        math.min(maxBigrams, Int.MaxValue - 1L).toInt + 1).collect()
      require(rows.length <= maxBigrams,
        s"train: model has more than maxBigrams = $maxBigrams $what; " +
          "raise minCount or lower vocabSize")
      rows
    }
    val bigrams = guarded(tupleCounts(2, Seq("p", "w")), "bigrams")
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val trigrams =
      if (order == 2) Map.empty[(String, String, String), Long]
      else guarded(tupleCounts(3, Seq("p2", "p1", "w")), "trigrams")
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
        .toMap
    NgramLmModel(vocab, unigrams, bigrams, total, alpha, order, trigrams)
    } finally org.apache.spark.sql.GraftShims.releaseCheckpoint(base)
  }

  /** Per-document perplexity under a trained model: one narrow map, model
    * broadcast, documents with ≥ 1 token only.
    * Output: (idCol, n_tokens, `out`). */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      model: NgramLmModel, out: String = "ppl"): DataFrame = {
    val bc = model.broadcastFor(df.sparkSession.sparkContext)
    val pplUdf = udf { (ts: Seq[String]) =>
      val m = bc.value
      val v = m.vocabSet
      val s = new Array[String](ts.length + 1)
      s(0) = Start
      var i = 0
      while (i < ts.length) {
        val t = ts(i)
        // vocab membership, EXACTLY the training map and the SQL mirror's
        // list_contains(vocab, x)
        s(i + 1) = if (v(t)) t else Unk
        i += 1
      }
      var nll = 0.0
      if (m.order == 2) {
        i = 1
        while (i < s.length) {
          nll += -math.log(m.score(s(i - 1), s(i)))
          i += 1
        }
      } else {
        // doubly padded: the first token's context is (<s>, <s>)
        i = 1
        while (i < s.length) {
          val p2 = if (i >= 2) s(i - 2) else Start
          nll += -math.log(m.score3(p2, s(i - 1), s(i)))
          i += 1
        }
      }
      math.exp(nll / ts.length.toDouble)
    }
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), toksCol(textCol).as("__t__"))
      .filter(size(col("__t__")) >= 1)
      .select(col(idCol), size(col("__t__")).cast("long").as("n_tokens"),
        round(pplUdf(col("__t__")), 6).as(out))
  }
}
