package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Beyond the reference surface (driver mandate): language ID, quality
  * scoring, token counting, document fingerprinting. Everything is either
  * a composition of codegen'd built-ins or a deterministic scalar UDF, so
  * each operator is a single narrow map over the corpus — no shuffle, no
  * driver round-trips, safe at any scale.
  */
object TextAnalysis {

  // ——— unicode / whitespace normalization ———

  /** Unicode NFC canonical composition — decomposed sequences (base +
    * combining marks, the classic mojibake/copy-paste residue) fold into
    * their precomposed forms. Java's Normalizer and DuckDB's
    * `nfc_normalize` implement the same Unicode standard algorithm, so
    * the mirror is term-for-term. Deterministic scalar UDF (the JDK has
    * no Catalyst expression for NFC); everything around it stays in
    * codegen'd built-ins. */
  private val nfcUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  /** Encoding/whitespace cleanup — the normalization stage every crawl
    * pipeline runs before anything hashes or tokenizes text: NFC
    * composition (so "é" and "e"+U+0301 stop being distinct tokens,
    * dedup keys, or vocab entries), C0/C1-style control-character
    * removal (newline KEPT — it is document structure; tab survives the
    * strip but the following collapse folds runs of spaces/tabs into
    * one space), and edge trim. One narrow map; the order (NFC → strip
    * → collapse → trim) is part of the contract and mirrored exactly by
    * the oracle. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(nfcUdf(c), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  // ——— lexical (BM25) scoring ———

  /** Okapi BM25 scores of every document against a fixed term set
    * (Robertson & Zaragoza 2009) — the lexical half of hybrid retrieval;
    * fuse the resulting ranking with a dense one via
    * [[graft.api.Search.rrfFuse]].
    *
    * Scale shape: corpus statistics (N, Σ doc-length, per-term document
    * frequencies) come from ONE map-side-combined agg over integer
    * counters — exact and order-independent — and return to the
    * executors as literals in a single narrow scoring map (per-term
    * `tf` via the codegen `filter` HOF). No shuffle touches the corpus.
    *
    * Determinism/mirror contract: tokens = lowercase split on single
    * spaces with empties dropped (the corpus convention, mirrored by
    * `string_split(…, ' ')`); `avgdl` = exact integer Σdl divided once;
    * idf computed driver-side with the Lucene-style
    * `ln(1 + (N − df + 0.5)/(df + 0.5))`; the score sums the per-term
    * contributions LEFT-ASSOCIATIVELY in input term order and is rounded
    * to 6 decimals, so a SQL mirror reproduces it bit-exactly (the
    * rounding absorbs the ≤1-ulp `ln` divergence across runtimes).
    * Output: (idCol, bm25). */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Scores: at least one term")
    require(terms.forall(t => t.nonEmpty && t == t.toLowerCase),
      "bm25Scores: terms must be non-empty and lowercase")
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= lit(""))
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks__"))
      .withColumn("__dl__", size(col("__toks__")))
    val dfAggs = count(lit(1)).as("n") +: sum(col("__dl__")).as("sdl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__toks__"), t), 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = base.agg(dfAggs.head, dfAggs.tail: _*).collect()(0)
    val n = stats.getLong(0)
    require(n > 0, "bm25Scores: no non-null documents")
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val idfs = terms.indices.map { i =>
      val dfi = stats.getLong(2 + i).toDouble
      math.log(1.0 + (n.toDouble - dfi + 0.5) / (dfi + 0.5))
    }
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl__").cast("double") / lit(avgdl))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__toks__"), x => x === lit(t))).cast("double")
      lit(idfs(i)) * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    base.select(col(idCol), round(score, 6).as("bm25"))
  }

  // ——— token counting ———

  /** Fixed-size overlapping character chunks — the RAG/embedding
    * preprocessing step: each document explodes to
    * ⌈(len − overlap) / (size − overlap)⌉ chunks (≥ 1) of up to `size`
    * chars starting every `size − overlap` chars. Chunk count uses pure
    * INTEGER arithmetic so a SQL mirror cannot drift via float ceil.
    * One narrow map + explode, no shuffle; null-text docs emit nothing.
    * Output: (idCol, chunk_idx, chunk). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunkDocuments: need 0 <= overlap < size, got size=$size overlap=$overlap")
    val step = size - overlap
    df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        expr(s"greatest(CAST((length($textCol) - $overlap + ${step - 1}) " +
          s"DIV $step AS INT), 1)").as("__nchunks__"),
        col(textCol))
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__nchunks__") - 1),
          i => col(textCol).substr(i * step + 1, lit(size)))))
      .toDF(idCol, "chunk_idx", "chunk")
      .withColumn("chunk_idx", col("chunk_idx").cast("long"))
  }

  /** Whitespace token count (codegen'd built-ins only; null ⇒ 0). */
  def tokenCount(text: Column): Column =
    when(text.isNull || length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: word pieces + standalone punctuation. */
  val bpeishTokenCount = udf { (s: String) =>
    if (s == null) 0
    else "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r.findAllIn(s).length
  }

  // ——— quality scoring ———

  /** Length / punctuation / stopword-ratio quality components + a combined
    * score in [0,1]. All built-ins; stays in whole-stage codegen. */
  def qualityComponents(df: DataFrame, textCol: String): DataFrame = {
    val t = trim(col(textCol))
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nPunct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val tokens = split(t, "\\s+")
    val nStop = size(filter(tokens, x => x.isin(stopwords.map(lit(_)): _*)))
    df.withColumn("n_chars_c", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("punct_ratio", when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0))
      .withColumn("stopword_ratio", when(nTokens > 0, nStop.cast("double") / nTokens).otherwise(0.0))
      .withColumn("avg_token_len",
        when(nTokens > 0, (nChars - (nTokens - 1)).cast("double") / nTokens).otherwise(0.0))
  }

  /** The combined quality formula over precomputed components — kept as a
    * standalone expression so the oracle SQL can mirror it term-for-term
    * (identical IEEE evaluation order ⇒ bit-identical doubles). */
  def qualityExpr(nTokens: Column, stopwordRatio: Column, punctRatio: Column): Column = {
    val lenScore = least(nTokens.cast("double") / 64.0, lit(1.0))
    val stopScore = lit(1.0) - abs(stopwordRatio - 0.4) / 0.6
    val punctScore = lit(1.0) - least(punctRatio * 4.0, lit(1.0))
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + stopScore * 0.3 + punctScore * 0.3))
  }

  /** Scalar quality score in [0,1]: rewards mid-length docs with a sane
    * stopword ratio and low punctuation density. */
  def qualityScore(df: DataFrame, textCol: String, out: String = "quality"): DataFrame = {
    val c = qualityComponents(df, textCol)
    c.withColumn(out,
      round(qualityExpr(col("n_tokens"), col("stopword_ratio"), col("punct_ratio")), 6))
      .drop("n_chars_c", "punct_ratio", "stopword_ratio", "avg_token_len")
  }

  /** Gopher-style rule-based quality flags (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021,
    * §A1.1): word-count bounds, mean-word-length bounds, symbol-to-word
    * ratio (`#`, `...`, `…`), bullet-/ellipsis-line fractions,
    * alphabetic-word fraction, and minimum distinct-stopword presence.
    * One narrow map of codegen built-ins per document; every rule is a
    * boolean column plus a conjunctive `keep` — the standard first-pass
    * web-corpus filter, with each threshold exposed as a parameter.
    *
    * Determinism/mirror contract: words = whitespace split with empties
    * dropped; mean word length = exact integer char sum over exact count;
    * symbol counts = non-overlapping left-to-right replacement deltas;
    * fractions are single IEEE divisions of small integers — a SQL engine
    * reproduces every comparison bit-exactly. */
  def gopherQualityFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): DataFrame = {
    val (nW, rules) = gopherRules(col(textCol), minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletRatio,
      maxEllipsisRatio, minAlphaRatio, minStopwords)
    val keep = rules.map(_._2).reduce(_ && _)
    df.filter(col(textCol).isNotNull).select(
      col(idCol) +: nW.cast("long").as("n_words") +:
        rules.map { case (n, c) => c.as(n) } :+ keep.as("keep"): _*)
  }

  /** The rule COLUMNS of [[gopherQualityFlags]] — (word count, named
    * rules) as pure expressions over a text column, so callers that need
    * the flags appended to a wide frame (e.g. [[Curate]]'s one-pass
    * assembly) can avoid a self-join of the input subtree. */
  private[graft] def gopherRules(t: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2): (Column, Seq[(String, Column)]) = {
    val words = filter(split(t, "\\s+"), w => w =!= lit(""))
    val nW = size(words)
    // every nW-divided ratio below is consumed ONLY under a `hasWords`
    // conjunct, so the greatest(nW, 1) divisor changes no rule's value —
    // it exists because Spark 4's ANSI mode throws DIVIDE_BY_ZERO even
    // for double division, and codegen common-subexpression elimination
    // can evaluate the shared ratio BEFORE the short-circuiting
    // conjunction would have skipped it (observed at 1M docs when a
    // strip tier empties documents; the DuckDB mirror's n > 0 AND x/n
    // form is unaffected — DuckDB double division never throws)
    val nWsafe = greatest(nW, lit(1)).cast("double")
    val charSum = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val meanLen = charSum.cast("double") / nWsafe
    val nHash = length(t) - length(regexp_replace(t, "#", ""))
    val nEll = (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / lit(3) +
      (length(t) - length(regexp_replace(t, "…", "")))
    val symbolRatio = (nHash + nEll).cast("double") / nWsafe
    val lines = split(t, "\n")
    val nLines = size(lines)
    val bulletFrac = size(filter(lines, l =>
      startswith(trim(l), lit("-")) || startswith(trim(l), lit("*")) ||
        startswith(trim(l), lit("•")))).cast("double") / nLines.cast("double")
    val ellFrac = size(filter(lines, l =>
      endswith(trim(l), lit("...")) || endswith(trim(l), lit("…"))))
      .cast("double") / nLines.cast("double")
    val alphaFrac = size(filter(words, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWsafe
    val stopHits = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)))
    val hasWords = nW > 0
    val rules = Seq(
      "rule_word_count" -> (nW >= minWords && nW <= maxWords),
      "rule_mean_word_len" ->
        (hasWords && meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen),
      "rule_symbol_ratio" -> (hasWords && symbolRatio <= maxSymbolRatio),
      "rule_bullet_lines" -> (bulletFrac <= maxBulletRatio),
      "rule_ellipsis_lines" -> (ellFrac <= maxEllipsisRatio),
      "rule_alpha_words" -> (hasWords && alphaFrac >= minAlphaRatio),
      "rule_stopwords" -> (stopHits >= minStopwords))
    (nW, rules)
  }

  /** Within-document repeated-segment removal (the line/paragraph dedup
    * of Gopher / RefinedWeb repetition filtering, generic over the
    * separator): split on `sep`, keep only the FIRST occurrence of each
    * segment, report the duplicated fraction, and re-join. One narrow
    * map — the positional `filter` + `array_position` pair stays in
    * codegen; nothing shuffles.
    *
    * Output: (idCol, n_segments, n_kept, dup_segment_ratio, clean_text).
    */
  def dedupSegments(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    require(sep.nonEmpty, "dedupSegments: sep must be non-empty")
    val quoted = java.util.regex.Pattern.quote(sep)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), quoted).as("__l__"))
      .select(col(idCol), col("__l__"),
        expr("filter(__l__, (x, i) -> array_position(__l__, x) = i + 1)")
          .as("__k__"))
      .select(col(idCol),
        size(col("__l__")).cast("long").as("n_segments"),
        size(col("__k__")).cast("long").as("n_kept"),
        ((size(col("__l__")) - size(col("__k__"))).cast("double") /
          size(col("__l__")).cast("double")).as("dup_segment_ratio"),
        array_join(col("__k__"), sep).as("clean_text"))
  }

  // ——— corpus statistics (vocabulary / n-grams) ———

  /** Token frequency table — the vocabulary-building primitive. One
    * narrow explode + one partial-agg shuffle on the token; at 100 TB the
    * map-side combine collapses each partition to its distinct tokens
    * before anything moves. */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))

  /** Top-n vocabulary, deterministic under frequency ties (token asc).
    * The `orderBy.limit` plans as TakeOrderedAndProject — a distributed
    * per-partition top-n + driver merge, never a total sort. */
  def topVocab(df: DataFrame, textCol: String, n: Int): DataFrame =
    tokenFrequencies(df, textCol)
      .orderBy(col("freq").desc, col("token").asc).limit(n)

  /** Word n-gram frequency counts (n ≥ 2) via built-ins only
    * (`sequence` + `transform` + `element_at` stay in codegen): each doc
    * emits its (len − n + 1) n-grams, then the same partial-agg shuffle
    * as [[tokenFrequencies]]. */
  def wordNgramCounts(df: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 2, s"wordNgramCounts needs n >= 2, got $n")
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*)))
        .as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("freq"))
  }

  /** Per-document DEFLATE compression ratio (compressed/raw bytes) — the
    * entropy-proxy quality signal (highly compressible ⇒ repetitive or
    * templated; near-1 ⇒ high-entropy text or binary junk; both tails
    * are filter candidates in RedPajama-style pipelines). Fixed level-6
    * raw deflate, one narrow per-row UDF, no shuffle. No SQL oracle —
    * the ratio depends on the zlib encoder's exact emitted stream, which
    * an independent engine cannot be guaranteed to reproduce; pinned by
    * ScalaTest ordering properties instead (repetitive < prose < random,
    * same discipline as the coder_train holdout). Empty/null docs score
    * 1.0 (incompressible by convention, not a divide-by-zero). */
  val compressionRatio = udf { (s: String) =>
    if (s == null || s.isEmpty) 1.0
    else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      d.end()
      total.toDouble / bytes.length
    }
  }

  /** [[compressionRatio]] over a frame: (id, compress_ratio). */
  def compressionRatios(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      compressionRatio(col(textCol)).as("compress_ratio"))

  /** Within-document repetition: the fraction of a doc's word n-grams
    * that are duplicates (1 − distinct/total) — the classic
    * repetitiousness quality signal for training-corpus filtering (Rae
    * et al., "Scaling Language Models: ... Gopher", 2021 filter on
    * repeated-n-gram fractions). Pure narrow map over built-ins (stays
    * in codegen, no shuffle — embarrassingly parallel at 100 TB). Docs
    * with fewer than `n` tokens score 0.0 over 0 n-grams. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"repetitionRatio needs n >= 2, got $n")
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), toks.as("toks"))
      .withColumn("ngrams", when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
      .select(col(idCol),
        when(col("ngrams").isNull, lit(0.0d))
          .otherwise(lit(1.0d) -
            size(array_distinct(col("ngrams"))).cast("double") /
              size(col("ngrams")).cast("double"))
          .as("rep_ratio"),
        coalesce(size(col("ngrams")), lit(0)).cast("long").as("n_ngrams"))
  }

  /** Per-doc distinct word n-grams (helper for containment/dedup). */
  private[graft] def distinctNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, out: String): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(0), size(col("toks")) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(col("toks"), i + j + 1)): _*))))
        .as(out))
  }

  /** Benchmark decontamination: n-gram containment of every benchmark
    * doc in every corpus doc — containment(c, b) = |G(b) ∩ G(c)| / |G(b)|
    * over distinct word n-grams (the standard eval-leakage check for
    * training corpora). The benchmark side is small by definition, so its
    * exploded n-grams broadcast; the corpus n-grams stream through one
    * map-side-combined groupBy — the corpus is never shuffled by itself
    * at 100 TB. Pairs at or above `threshold` come back with the shared
    * count and score. Id columns must be pre-renamed to be distinct. */
  def ngramContainment(
      corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int, threshold: Double): DataFrame = {
    require(corpusId != benchId,
      s"rename the id columns apart (both are '$corpusId')")
    val bGrams = distinctNgrams(bench, benchId, benchText, n, "ngram")
    val bTotals = bGrams.groupBy(benchId).agg(count(lit(1)).as("b_total"))
    val cGrams = distinctNgrams(corpus, corpusId, corpusText, n, "ngram")
    cGrams.join(broadcast(bGrams), Seq("ngram"))
      .groupBy(corpusId, benchId).agg(count(lit(1)).as("shared"))
      .join(broadcast(bTotals), Seq(benchId))
      .withColumn("containment", col("shared").cast("double") / col("b_total"))
      .filter(col("containment") >= threshold)
      .select(corpusId, benchId, "shared", "containment")
  }

  /** The persistable benchmark-gram ARTIFACT for decontamination at
    * scale: one row per (benchId, distinct n-gram) of the benchmark set,
    * written once as a plain table (the discipline of
    * [[graft.ext.Dedup.minhashSignatures]] / `textFingerprints` — hash
    * the static side once, not per run/batch) and fed to
    * [[containmentWithBloom]] or the streaming gate. */
  def benchGrams(bench: DataFrame, benchId: String, benchText: String,
      n: Int): DataFrame =
    distinctNgrams(bench, benchId, benchText, n, "ngram")

  /** Bloom filter over a gram table's `gramCol` — one distributed
    * count + one distributed `stat.bloomFilter` aggregate; the only
    * driver-resident artifact of the large-benchmark decontamination
    * path (~1.2 bytes/gram at fpp 1e-3, so 100 M grams ≈ 170 MB where
    * the exploded-string broadcast of [[ngramContainment]] would be
    * many GB and the collected map of the broadcast gate is capped). */
  def buildGramBloom(grams: DataFrame, fpp: Double = 1e-3,
      gramCol: String = "ngram"): org.apache.spark.util.sketch.BloomFilter = {
    require(fpp > 0 && fpp < 1, s"buildGramBloom: fpp must be in (0,1), got $fpp")
    val cnt = grams.select(col(gramCol)).distinct().count()
    grams.stat.bloomFilter(gramCol, math.max(cnt, 1L), fpp)
  }

  /** Benchmark decontamination for benchmarks TOO BIG to broadcast or
    * collect — the same containment contract and bit-identical output as
    * [[ngramContainment]], with the benchmark side held as the
    * [[benchGrams]] table plus a broadcast Bloom filter instead of an
    * exploded-gram broadcast.
    *
    * Scale shape: corpus grams are prefiltered MAP-SIDE by bloom
    * membership, so the only shuffle carries true matches + fpp × corpus
    * grams — at fpp 1e-3 a 100 TB corpus sheds 99.9 % of its non-matching
    * grams before any exchange. Bloom false positives CANNOT reach the
    * output: every survivor still passes the exact equi-join on the gram
    * string, which discards them — the bloom bounds shuffle volume, it
    * never decides a match, so exactness is independent of fpp. The
    * per-benchmark totals join is a plain (benchId, count) shuffle join,
    * also unbounded-bench-safe (no broadcast hint; AQE picks). */
  def containmentWithBloom(
      corpus: DataFrame, corpusId: String, corpusText: String,
      bGrams: DataFrame, benchId: String, n: Int, threshold: Double,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame =
    containmentWithBloomBc(corpus, corpusId, corpusText, bGrams, benchId,
      n, threshold, corpus.sparkSession.sparkContext.broadcast(bloom))

  /** [[containmentWithBloom]] over a caller-held `Broadcast` — for
    * long-lived callers (the streaming gate) that must ship the bloom to
    * executors ONCE and reuse it across many invocations instead of
    * leaking one broadcast per call. */
  def containmentWithBloomBc(
      corpus: DataFrame, corpusId: String, corpusText: String,
      bGrams: DataFrame, benchId: String, n: Int, threshold: Double,
      bloomBc: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): DataFrame = {
    require(corpusId != benchId,
      s"rename the id columns apart (both are '$corpusId')")
    val bTotals = bGrams.groupBy(benchId).agg(count(lit(1)).as("b_total"))
    val mightContain =
      udf((g: String) => g != null && bloomBc.value.mightContainString(g))
    distinctNgrams(corpus, corpusId, corpusText, n, "ngram")
      .filter(mightContain(col("ngram")))
      .join(bGrams, Seq("ngram"))
      .groupBy(corpusId, benchId).agg(count(lit(1)).as("shared"))
      .join(bTotals, Seq(benchId))
      .withColumn("containment", col("shared").cast("double") / col("b_total"))
      .filter(col("containment") >= threshold)
      .select(corpusId, benchId, "shared", "containment")
  }

  /** Frame-to-frame convenience over [[containmentWithBloom]]: derives
    * the gram table and the bloom from the benchmark frame. The gram
    * derivation deliberately RECOMPUTES (bloom sizing, bloom build,
    * verify join) rather than checkpointing: the benchmark is the small
    * side by definition, and a localCheckpoint would pin corpus-lifetime
    * blocks in a long-lived server with no reliable release. Use the
    * artifact form directly when the grams are already persisted. */
  def ngramContainmentLarge(
      corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int, threshold: Double, fpp: Double = 1e-3): DataFrame = {
    val bGrams = benchGrams(bench, benchId, benchText, n)
    containmentWithBloom(corpus, corpusId, corpusText, bGrams, benchId, n,
      threshold, buildGramBloom(bGrams, fpp))
  }

  // ——— language identification ———

  private val StopwordTable: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"))

  /** n-gram/stopword heuristic language ID. CJK codepoint density decides
    * zh; otherwise the language whose stopword set hits the most tokens
    * ("und" = undetermined when nothing hits). Pure function of the text. */
  val langId = udf { (s: String) =>
    if (s == null || s.trim.isEmpty) "und"
    else {
      val cjk = s.codePoints().toArray.count(cp =>
        (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF))
      if (cjk * 1.0 / math.max(1, s.length) > 0.2) "zh"
      else {
        val tokens = s.toLowerCase.split("\\W+").filter(_.nonEmpty)
        if (tokens.isEmpty) "und"
        else {
          val scores = StopwordTable.view.mapValues { sw =>
            val set = sw.toSet
            tokens.count(set.contains)
          }.toSeq
          val (best, hits) = scores.maxBy { case (lang, h) => (h, lang) }
          if (hits == 0) "und" else best
        }
      }
    }
  }

  // ——— fingerprinting ———

  /** Deterministic 63-bit polynomial rolling hash of the
    * whitespace-normalized, lower-cased text — a stable document
    * fingerprint for exact near-normalization dedup. */
  val fingerprint = udf { (s: String) =>
    if (s == null) 0L
    else {
      val norm = s.toLowerCase.trim.replaceAll("\\s+", " ")
      var h = 1125899906842597L // prime
      var i = 0
      while (i < norm.length) { h = 31 * h + norm.charAt(i); i += 1 }
      h & Long.MaxValue
    }
  }

  /** Winnowing k-gram fingerprints (Schleimer et al., SIGMOD 2003 — the
    * MOSS document-fingerprinting algorithm): a 63-bit polynomial hash of
    * every k-character gram of the lower-cased text, then the minimum of
    * each `window`-hash sliding window, deduplicated. Two documents
    * sharing a run of ≥ k+window−1 characters are guaranteed to share a
    * fingerprint, so partial overlap (quotes, boilerplate, near-copies)
    * is detectable by a plain equi-join on `fp` — a hash-partitioned
    * shuffle of (doc_id, fp) longs, never of the documents.
    *
    * One codegen'd expression over the lower-cased string
    * ([[graft.functions.WinnowFingerprints]]): an O(len) rolling hash of
    * CODE POINTS whose per-gram values are mirrored term-for-term by the
    * DuckDB oracle's `unicode()`-based fold — identical for all text,
    * not just ASCII (the earlier HOF pipeline hashed UTF-8 lead bytes
    * via `ascii()`, collapsing e.g. every CJK char to one value). The
    * map is narrow and embarrassingly parallel; lower-casing stays in
    * Spark's `lower` so engine-specific case-mapping edge cases sit in
    * one visible place.
    *
    * Returns (`idCol`, fp: bigint), one row per distinct fingerprint;
    * documents shorter than k code points yield no rows.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, window: Int = 4): DataFrame =
    df.select(col(idCol),
      explode(org.apache.spark.sql.GraftShims.column(
        graft.functions.WinnowFingerprints(
          org.apache.spark.sql.GraftShims.expression(lower(col(textCol))),
          k, window))).as("fp"))

  /** Document-overlap candidate pairs from shared winnowing
    * fingerprints: pairs of documents sharing ≥ `minShared` fingerprints
    * ([[winnowFingerprints]]), i.e. ≥ minShared distinct selected
    * k-gram regions in common — the MOSS "detect partial copies across
    * a corpus" step. Plan shape mirrors the LSH dedup family:
    * fingerprint (narrow map) → document-frequency filter → fp-bucket
    * self-join → pair count; only (doc_id, fp) longs ride the shuffles.
    * Fingerprints appearing in more than `maxDocFreq` documents are
    * dropped up front — corpus-wide boilerplate grams would otherwise
    * form quadratic buckets (and carry no overlap signal; same reasoning
    * as a stopword list), so per-fp join work is bounded at
    * maxDocFreq². Returns (id_a, id_b, shared), id_a < id_b.
    *
    * `durableCheckpoint = true` writes the materialized fingerprints to
    * the configured `sparkContext.setCheckpointDir` instead of executor-
    * local storage: `localCheckpoint` cuts lineage, so on a real cluster
    * an executor loss fails the job rather than recomputing — the
    * durable variant survives it at the cost of one distributed write. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, window: Int = 4, minShared: Int = 10,
      maxDocFreq: Long = 1000L, durableCheckpoint: Boolean = false): DataFrame = {
    // materialize the fingerprints once (the duplicateGroups precedent):
    // they are read by the doc-frequency agg and BOTH self-join sides,
    // and recomputing the hashing three times dominated the query's wall
    // time
    // placed on fp before the checkpoint: the doc-frequency groupBy and
    // the rare-filter join then run exchange-free on the materialized
    // rows (the self-join below already was — join outputs keep the fp
    // partitioning)
    val fps0 = winnowFingerprints(df, idCol, textCol, k, window)
      .repartition(col("fp"))
    val fps =
      if (!durableCheckpoint) fps0.localCheckpoint()
      else {
        require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "durableCheckpoint requires sparkContext.setCheckpointDir(...)")
        fps0.checkpoint()
      }
    val rare = fps.join(
      fps.groupBy("fp").count().filter(col("count") <= maxDocFreq).select("fp"),
      Seq("fp"))
    rare.select(col("fp"), col(idCol).as("id_a"))
      .join(rare.select(col("fp"), col(idCol).as("id_b")), Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** One-pass text-stats table: doc id, char/token counts, fingerprint,
    * language, quality. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityScore(df, textCol)
      .withColumn("token_count", tokenCount(col(textCol)))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))

  /** One-pass corpus PROFILE — the audit rollup run before/after every
    * curation step of a training-data pipeline: per `groupCols` group
    * (e.g. source × predicted language), document count, exact token
    * count, exact distinct-fingerprint count (the upper bound on unique
    * normalized texts — n_docs − n_distinct_fp estimates the exact-dup
    * mass), total quality mass, and Gopher-keep count.
    *
    * Scale shape: one groupBy over per-row narrow expressions — partial
    * (map-side) aggregation everywhere, with `countDistinct` planned as
    * the standard two-phase expand. Nothing but (group, metric) rows
    * ever shuffle.
    *
    * Determinism/mirror contract: every metric is an exact INTEGER sum —
    * quality is summed in micro-units (`round(q·1e6)` per doc, exact
    * long addition) precisely because a double `sum`/`avg` would depend
    * on partition combine order and could never hash-match a mirror.
    * Derive means downstream as single divisions. Null text: 0 tokens,
    * fingerprint 0, quality micro 400000 (the formula's empty-text
    * value), Gopher keep false. */
  def corpusProfile(df: DataFrame, textCol: String, groupCols: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    require(groupCols.nonEmpty, "corpusProfile: at least one group column")
    val t = trim(col(textCol))
    val nChars = length(t)
    val nTok = tokenCount(t)
    val nPunct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val nStop = size(filter(split(t, "\\s+"),
      x => x.isin(stopwords.map(lit(_)): _*)))
    val punctRatio = when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0)
    val stopRatio = when(nTok > 0, nStop.cast("double") / nTok).otherwise(0.0)
    val qMicro = round(qualityExpr(nTok, stopRatio, punctRatio) * lit(1000000.0), 0)
      .cast("long")
    val (_, rules) = gopherRules(col(textCol), minWords = minWords,
      maxWords = maxWords)
    val keep = coalesce(rules.map(_._2).reduce(_ && _), lit(false))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTok.cast("long")).as("n_tokens"),
        countDistinct(fingerprint(col(textCol))).as("n_distinct_fp"),
        sum(qMicro).as("quality_micro"),
        sum(keep.cast("long")).as("n_gopher_keep"))
  }
}
