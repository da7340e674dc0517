package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for LLM training-data pipelines: C4-style
  * heuristic cleaning, fixed-window token chunking, sequential token
  * packing, deterministic hash sampling, and PII redaction.
  *
  * Everything here is either a narrow map over codegen'd built-ins (clean,
  * chunk, sample, redact — embarrassingly parallel at 100 TB) or one
  * window over a per-shard sort (pack — sequential only within a shard,
  * which is inherent to packing order). No UDFs, no driver round-trips.
  */
object Corpus {

  // ——— C4-style heuristic cleaning ———

  /** Line-level corpus cleaning in the style of C4 (Raffel et al., "Exploring
    * the Limits of Transfer Learning with a Unified Text-to-Text
    * Transformer", 2020, §2.2): keep only lines that end in terminal
    * punctuation and have at least `minWordsPerLine` words, and drop lines
    * carrying boilerplate/code markers (`{`, "lorem ipsum",
    * case-insensitive "javascript"). Emits the cleaned text plus
    * kept/total line counts so callers can apply a doc-level minimum
    * (C4 drops docs with < 3 surviving sentences).
    *
    * One narrow map — the line filter runs inside a higher-order
    * `filter` on the split array, entirely in whole-stage codegen. */
  def c4CleanLines(df: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val keep = (l: Column) => {
      val t = trim(l)
      size(split(t, " +")).geq(minWordsPerLine) &&
        t.rlike("[.!?\"]$") &&
        !t.contains("{") &&
        !lower(t).contains("lorem ipsum") &&
        !lower(t).contains("javascript")
    }
    val kept = filter(lines, keep)
    df.select(col(idCol),
      array_join(kept, "\n").as("clean_text"),
      size(kept).cast("long").as("n_lines_kept"),
      size(lines).cast("long").as("n_lines_total"))
  }

  // ——— fixed-window token chunking ———

  /** Split each document into fixed-size token windows (`window` tokens,
    * advancing by `stride` — overlapping when stride < window), the
    * standard long-document → training-sequence step. Every document with
    * at least one token emits ceil(max(n − window, 0) / stride) + 1
    * chunks; the last chunk may be short. Narrow map + explode, no
    * shuffle. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, s"window/stride must be >= 1")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // ceil((n - window) / stride) via integer arithmetic; 0 when n <= window
    val extra = when(n > window,
      (n - window + stride - 1).cast("int").divide(stride).cast("int"))
      .otherwise(lit(0))
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks__"), extra.as("__extra__"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), col("__extra__")),
        i => array_join(slice(col("__toks__"), i * stride + 1, lit(window)), " "))))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_text")
      .withColumn("n_tokens",
        size(split(col("chunk_text"), " ")).cast("long"))
  }

  // ——— sequential token packing ———

  /** Assign each document a (bin, offset) in a token-budget packing of its
    * shard: documents are concatenated in `orderCol` order within each
    * `shardCol` group, and a document's bin is the training sequence its
    * first token lands in (documents may straddle bins — exactly how
    * concat-then-chunk LLM data packing behaves). One shuffle on the shard
    * key + a per-shard ordered window; packing order is inherently
    * sequential per shard, so sharding IS the scale path (a 100 TB corpus
    * packs shard-parallel). */
  def packByTokenBudget(df: DataFrame, shardCol: String, orderCol: String,
      textCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    import org.apache.spark.sql.expressions.Window
    // ROWS frame, not the default RANGE: RANGE gives tied orderCol rows
    // IDENTICAL cumulative sums → overlapping bins over capacity. The md5
    // tiebreak makes tie order deterministic (and engine-portable — the
    // DuckDB oracle spells the same bytes).
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(orderCol).asc, md5(coalesce(trim(col(textCol)), lit(""))).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nTok = TextAnalysis.tokenCount(col(textCol)).cast("long")
    df.withColumn("n_tokens", nTok)
      .withColumn("__cum__", sum(col("n_tokens")).over(w))
      .select(col(shardCol), col(orderCol), col("n_tokens"),
        ((col("__cum__") - col("n_tokens")) / capacity).cast("long").as("bin"),
        ((col("__cum__") - col("n_tokens")) % capacity).as("bin_offset"))
  }

  /** Materialize the packed training sequences that
    * [[packByTokenBudget]] only ASSIGNS: within each shard, documents
    * concatenate in `orderCol` order and every `capacity`-token window
    * becomes one output row — token-exact, documents straddling bin
    * boundaries split mid-document (GPT-style concat-then-chunk). Every
    * bin except a shard's last holds exactly `capacity` tokens, and
    * concatenating a shard's `seq_text`s reproduces its concatenated
    * documents.
    *
    * Scale shape: one window cumsum per shard (longs), then the one
    * inherent shuffle — tokens move to their (shard, bin) — with a
    * per-bin sort bounded by `capacity`. Output:
    * (shardCol, bin, n_tokens, seq_text). */
  def packedSequences(df: DataFrame, shardCol: String, orderCol: String,
      textCol: String, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    import org.apache.spark.sql.expressions.Window
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= lit(""))
    // ROWS frame + md5 tiebreak — see packByTokenBudget for why (the
    // default RANGE frame garbles bins when orderCol has ties).
    val w = Window.partitionBy(col(shardCol))
      .orderBy(col(orderCol).asc, col("__tb__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.filter(col(textCol).isNotNull)
      .select(col(shardCol), col(orderCol),
        md5(coalesce(trim(col(textCol)), lit(""))).as("__tb__"),
        toks.as("__t__"))
      .filter(size(col("__t__")) >= 1)
      .withColumn("__start__",
        sum(size(col("__t__")).cast("long")).over(w) - size(col("__t__")))
    base
      .select(col(shardCol), col("__start__"),
        posexplode(col("__t__")).as(Seq("__p__", "__tok__")))
      .select(col(shardCol),
        (col("__start__") + col("__p__")).as("__pos__"), col("__tok__"))
      .withColumn("bin", (col("__pos__") / capacity).cast("long"))
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("__pos__"), col("__tok__")))),
          s => s("__tok__")), " ").as("seq_text"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): a `rate`
    * fraction of documents — chosen by the same stable id-hash as
    * [[hashSample]] — are split at two hash-derived character offsets
    * into (prefix, middle, suffix) and reassembled in PSM order
    * `<fim_prefix>P<fim_suffix>S<fim_middle>M`; the rest pass through
    * verbatim (`fim_mode = 'plain'`). Everything is integer/substring
    * arithmetic on code points, so an independent SQL engine reproduces
    * the exact split — and re-running a pipeline reproduces the exact
    * same training mix (no RNG state). Narrow per-row projection; no
    * shuffle. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      rate: Double = 0.5, salt: String = "fim"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val threshold = (rate * U60Denom).toLong
    val selected = hashU60(concat(col(idCol).cast("string"), lit(salt)))
      .< (threshold)
    val len = length(col(textCol))
    val a = pmod(hashU60(concat(col(idCol).cast("string"), lit(s"$salt:a"))),
      len + 1)
    val b = pmod(hashU60(concat(col(idCol).cast("string"), lit(s"$salt:b"))),
      len + 1)
    val p1 = least(a, b)
    val p2 = greatest(a, b)
    val prefix = col(textCol).substr(lit(1), p1)
    val middle = col(textCol).substr(p1 + 1, p2 - p1)
    val suffix = col(textCol).substr(p2 + 1, len - p2)
    df.select(col(idCol),
      when(selected, lit("fim")).otherwise(lit("plain")).as("fim_mode"),
      when(selected, concat(lit("<fim_prefix>"), prefix,
          lit("<fim_suffix>"), suffix, lit("<fim_middle>"), middle))
        .otherwise(col(textCol)).as("fim_text"))
  }

  /** Deterministic negative sampling for contrastive training: for each
    * distinct id, `k` pseudo-random OTHER ids — uniform over the corpus,
    * reproducible across runs and engines (pure hash arithmetic, no RNG
    * state), never the anchor itself (a hash landing on the anchor's own
    * slot shifts to the next one, mod n).
    *
    * Scale shape: ids get a dense index by distributed sort +
    * `zipWithIndex` (per-partition offsets from counts — NOT a
    * single-partition row_number window), checkpointed once; the k
    * negatives are an explode + one equi-join back on the index. Output:
    * (anchor_id, j, neg_id), k rows per distinct id. */
  def negativeSample(df: DataFrame, idCol: String, k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    val ids = df.select(col(idCol)).distinct().orderBy(col(idCol))
    val schema = org.apache.spark.sql.types.StructType(
      ids.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__idx__", org.apache.spark.sql.types.LongType, nullable = false))
    val indexed = spark.createDataFrame(
      ids.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema).localCheckpoint(true)
    val n = indexed.count()
    require(n >= 2, s"negativeSample needs >= 2 distinct ids, got $n")
    val anchors = indexed.select(col(idCol).as("anchor_id"),
      col("__idx__").as("__ai__"))
    val expanded = anchors
      .select(col("anchor_id"), col("__ai__"),
        explode(array((0 until k).map(lit): _*)).as("j"))
      .withColumn("__t__", pmod(hashU60(concat(
        col("anchor_id").cast("string"), lit(s"$salt:"),
        col("j").cast("string"))), lit(n)))
      .withColumn("__t2__", when(col("__t__") === col("__ai__"),
        (col("__t__") + 1) % n).otherwise(col("__t__")))
    // shuffle_hash: both sides are id-count-sized, and sort-merge would
    // sort each for one equi-lookup (guide §3.1)
    expanded.join(
        indexed.select(col(idCol).as("neg_id"), col("__idx__"))
          .hint("shuffle_hash"),
        col("__t2__") === col("__idx__"))
      .select("anchor_id", "j", "neg_id")
  }

  // ——— deterministic hash sampling ———

  /** Uniform u in [0, 1) as a 60-bit integer derived from md5 of the key —
    * stable across runs, machines, and engines (the DuckDB oracle spells
    * the same bytes), unlike `rand(seed)` which is partition-layout
    * dependent. */
  private[graft] def hashU60(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  private val U60Denom = math.pow(2, 60)

  /** Deterministic uniform sample: keep rows whose key-hash falls under
    * `rate`. Re-running (or resuming) a pipeline reproduces the exact
    * sample; different `salt`s give independent samples. Narrow filter,
    * pushed to the scan. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
      salt: String = ""): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val threshold = (rate * U60Denom).toLong
    df.filter(hashU60(concat(col(keyCol).cast("string"), lit(salt)))
      < threshold)
  }

  // ——— clustered corpus organization ———

  /** Seeded cluster profile — organize a corpus around k exemplar rows
    * (curriculum / domain discovery over an embedding column): every
    * row is assigned to its NEAREST seed under `metric` (distance ties
    * break on the smaller seed id), and each cluster reports occupancy
    * and distance spread: (cluster_id = seed id, n, mean_dist rounded
    * to 6 decimals, max_dist).
    *
    * Spark shape: the seed frame is broadcast (k exemplars — always
    * small), the per-row argmin is the lexicographic
    * `min(struct(dist, seed))` — a map-side partial aggregate, so the
    * k× row amplification of the broadcast cross join collapses before
    * any exchange — and the only shuffles carry scalars: one row per
    * corpus id, then one per cluster. No corpus re-shuffle, no driver
    * loop, no UDF. For the IVF-cell variant over a BUILT index (cells
    * from the trained coder instead of explicit seeds) see
    * `Engine.cellProfile`. */
  def clusterProfile(corpus: DataFrame, idCol: String, vecCol: String,
      seeds: DataFrame, seedIdCol: String, seedVecCol: String,
      metric: String): DataFrame = {
    val s = seeds.select(col(seedIdCol).as("__seed_id__"),
      col(seedVecCol).cast("array<double>").as("__seed_vec__"))
    corpus.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(s))
      .withColumn("__d__", graft.functions.functions.vector_distance(
        col(vecCol), col("__seed_vec__"), metric))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d__"), col("__seed_id__"))).as("__a__"))
      .groupBy(col("__a__.__seed_id__").as("cluster_id"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__a__.__d__")), 6).as("mean_dist"),
        max(col("__a__.__d__")).as("max_dist"))
  }

  /** Deterministic importance sampling: keep each row with probability
    * `weightCol` (clamped to [0,1]) — the quality-weighted resampling step
    * of a data-mix pipeline (e.g. weight = quality score). Same stable
    * hash as [[hashSample]]. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: Column,
      salt: String = ""): DataFrame =
    df.filter(hashU60(concat(col(keyCol).cast("string"), lit(salt)))
      .cast("double") / U60Denom
      < greatest(lit(0.0), least(lit(1.0), weightCol)))

  /** Resample a corpus toward a target DOMAIN MIXTURE (the data-mix step
    * of LLM pipelines, cf. DoReMi / The Pile's per-source weights):
    * given target shares per domain, compute per-domain keep-rates that
    * hit the target proportions in expectation while only ever
    * DOWN-sampling (the domain with the highest target/actual ratio
    * keeps 100%; everything else scales down relative to it). Rows whose
    * domain is not in `targetWeights` are dropped.
    *
    * Deterministic: the per-domain rates come from one counts agg plus
    * driver arithmetic, and row selection is the same stable md5
    * threshold as [[hashSample]] — re-running reproduces the exact
    * sample, and a SQL engine can mirror the whole operator (counts →
    * rate arithmetic → hash compare) bit-exactly. One agg + one narrow
    * filter; nothing shuffles the corpus.
    *
    * `targetWeights` need not sum to 1 — only ratios matter. Domains
    * listed in the map but absent from the data are ignored. */
  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
      targetWeights: Map[String, Double], salt: String = ""): DataFrame = {
    require(targetWeights.nonEmpty, "mixtureSample: empty targetWeights")
    targetWeights.foreach { case (d, w) =>
      require(w > 0, s"mixtureSample: weight for '$d' must be > 0, got $w")
    }
    val domains = targetWeights.keys.toSeq.sorted
    val counts = df
      .filter(col(domainCol).isin(domains: _*))
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = domains.filter(counts.contains)
    require(present.nonEmpty,
      s"mixtureSample: no rows in any target domain $domains")
    val total = present.map(counts).sum
    // factor = target share / actual share; the max-factor domain keeps
    // everything (pure downsampling), association mirrors the SQL oracle
    val factors = present.map(d =>
      d -> targetWeights(d) / (counts(d).toDouble / total.toDouble)).toMap
    val maxF = factors.values.max
    val thresholds = present.map(d =>
      d -> (factors(d) / maxF * U60Denom).toLong).toMap
    val thr = present.tail.foldLeft(
      when(col(domainCol) === present.head, lit(thresholds(present.head)))) {
      (acc, d) => acc.when(col(domainCol) === d, lit(thresholds(d)))
    }.otherwise(lit(-1L))
    df.filter(hashU60(concat(col(keyCol).cast("string"), lit(salt))) < thr)
  }

  /** Temperature-flattened domain mixture over TOKEN mass (the
    * multilingual-sampling rule of XLM-R / mBERT: target share ∝
    * actual-token-share^τ, τ in (0, 1] flattening the distribution so
    * low-resource domains keep relatively more). The token-mass sibling
    * of [[mixtureSample]]: per-domain token sums come from ONE
    * map-side-combined agg (bounded by the domain count), target weights
    * are derived driver-side as `floor(share^τ·1e9 + 0.5)/1e9` (the
    * explicit decimal rounding absorbs the ≤1-ulp `pow` divergence
    * across engines — the BM25 discipline — so a SQL mirror reproduces
    * the thresholds bit-exactly), and row selection is the same stable
    * md5-threshold downsampling: the domain with the highest
    * target/actual ratio keeps 100 %, everything else scales down. Rows
    * outside `domains` are dropped. One agg + one narrow filter; the
    * corpus never shuffles. */
  def temperatureMixture(df: DataFrame, keyCol: String, domainCol: String,
      textCol: String, domains: Seq[String], temperature: Double,
      salt: String = "", tokensCol: Option[String] = None): DataFrame = {
    require(domains.nonEmpty, "temperatureMixture: empty domains")
    require(temperature > 0 && temperature <= 1,
      s"temperatureMixture: temperature must be in (0,1], got $temperature")
    // dedupe: a repeated domain name would double-count its token mass
    // in `total` and silently skew every share (the Seq form can receive
    // duplicates — raw JSON over the wire — unlike mixtureSample's Map)
    val ds = domains.distinct.sorted
    // token mass: whitespace tokenCount of textCol, or — when a
    // precomputed count column is named (e.g. a trained-BPE count from
    // [[graft.ext.Bpe]]) — that column directly
    val tokExpr = tokensCol.map(c => col(c).cast("long"))
      .getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val counts = df.filter(col(domainCol).isin(ds: _*))
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(sum(tokExpr).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = ds.filter(d => counts.getOrElse(d, 0L) > 0L)
    require(present.nonEmpty,
      s"temperatureMixture: no tokens in any target domain $ds")
    val total = present.map(counts).sum
    val shares = present.map(d =>
      d -> counts(d).toDouble / total.toDouble).toMap
    // decimal-rounded target weight — engine-portable (floor/×/÷ are
    // correctly rounded IEEE; only pow differs by ulps, absorbed here)
    val weights = present.map(d =>
      d -> math.floor(math.pow(shares(d), temperature) * 1e9 + 0.5) / 1e9).toMap
    val factors = present.map(d => d -> weights(d) / shares(d)).toMap
    val maxF = factors.values.max
    val thresholds = present.map(d =>
      d -> (factors(d) / maxF * U60Denom).toLong).toMap
    val thr = present.tail.foldLeft(
      when(col(domainCol) === present.head, lit(thresholds(present.head)))) {
      (acc, d) => acc.when(col(domainCol) === d, lit(thresholds(d)))
    }.otherwise(lit(-1L))
    df.filter(hashU60(concat(col(keyCol).cast("string"), lit(salt))) < thr)
  }

  // ——— DSIR importance resampling (Xie et al. 2023) ———

  /** A fitted DSIR model: per-bucket log-likelihood ratios
    * log p_target(b) − log p_raw(b) over hashed n-gram features —
    * everything scoring needs, exportable as JSON so a SQL engine can
    * replay the scoring arithmetic bit-exactly (the NgramLm/QualityModel
    * exported-model oracle pattern; Double.toString round-trips). */
  case class DsirModel(buckets: Int, smoothing: Double,
      logRatio: Array[Double]) {
    def toJson: String =
      s"""{"buckets":$buckets,"smoothing":$smoothing,""" +
        s""""logRatio":[${logRatio.mkString(",")}]}"""
  }

  /** The hashed n-gram feature sequence of one document: word unigrams
    * then word bigrams, each in token order (the order is part of the
    * scoring contract — weights are LEFT FOLDS of per-feature log
    * ratios, and float addition order must match the SQL mirror).
    * Tokens are whitespace-split lowercased words, the DSIR paper's
    * hashed n-gram featurization (Xie et al. 2023 §3.2). */
  private[graft] def dsirNgrams(text: Column): Column = {
    val toks = filter(split(lower(trim(text)), "\\s+"), t => t =!= "")
    val n = size(toks)
    // bigrams via zip_with over two SLICED copies — the slices are
    // child expressions, evaluated once per row; an element_at(toks, i)
    // lambda would re-evaluate the whole tokenization subtree per
    // element (HOF lambdas don't bind captured subtrees — O(n²) splits
    // per row, measured 5.6s of a 5k-doc pass collapsing to ~0.3s).
    // The n >= 2 guard keeps slice/sequence away from the 0/1-token
    // degenerate lengths.
    val bigrams = when(n >= 2,
        zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
          (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** Per-feature bucket id: the shared u60 content hash mod `buckets` —
    * the same deterministic hash every sampling operator here uses, so
    * the SQL oracle mirrors it with the same md5 fold. */
  private def dsirBucket(g: Column, buckets: Int): Column =
    pmod(hashU60(g), lit(buckets.toLong)).cast("int")

  /** Fit a DSIR model: hashed-n-gram bag counts of the TARGET corpus
    * (what the data should look like) and the RAW corpus (what it does
    * look like), add-λ smoothed into per-bucket log-likelihood ratios.
    * Two map-side-combined aggregates, each bounded by `buckets` rows
    * to the driver — fitting cost is two corpus scans regardless of
    * scale, and the model is a `buckets`-sized array. */
  def dsirTrain(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 4096, smoothing: Double = 1.0): DsirModel = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    def counts(df: DataFrame): Array[Long] = {
      val out = new Array[Long](buckets)
      // bucket ids straight from the codegen kernel — same hash, same
      // gram order as the exploded-STRING chain (spec-pinned via the
      // weight kernel's shared tokenizer), without materializing gram
      // strings through the interpreted HOF chain or hashing them with
      // per-gram Md5 expressions
      df.filter(col(textCol).isNotNull)
        .select(explode(graft.functions.functions.dsir_buckets(
          col(textCol), buckets)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().foreach(r => out(r.getInt(0)) = r.getLong(1))
      out
    }
    val ct = counts(target)
    val cr = counts(raw)
    val denomT = ct.sum.toDouble + smoothing * buckets
    val denomR = cr.sum.toDouble + smoothing * buckets
    DsirModel(buckets, smoothing, Array.tabulate(buckets)(b =>
      math.log((ct(b) + smoothing) / denomT) -
        math.log((cr(b) + smoothing) / denomR)))
  }

  /** One document's DSIR importance weight — the left fold of its
    * features' log ratios (Σ_g logRatio[h(g)], token order). A pure
    * column expression with the model as an array literal: narrow,
    * partition-parallel, no join. NULL text scores NULL. */
  def dsirWeightExpr(text: Column, model: DsirModel): Column =
    graft.functions.functions.dsir_weight(text, model.logRatio,
      model.buckets)

  /** The ORIGINAL column composition (aggregate over [[dsirNgrams]]
    * with a per-gram md5 bucket lookup), kept as the differential twin
    * of the codegen kernel that replaced it
    * ([[graft.functions.DsirWeightAlgo]] — the HOF fold evaluated
    * interpreted and allocated three arrays + one Md5 per gram per
    * row; scoring is a full-corpus pass). CorpusRulesSpec pins
    * kernel == chain bit-exactly on adversarial token soup. */
  private[graft] def dsirWeightExprChain(text: Column,
      model: DsirModel): Column = {
    val lr = typedLit(model.logRatio.toSeq)
    aggregate(dsirNgrams(text), lit(0.0), (acc, g) =>
      acc + element_at(lr, dsirBucket(g, model.buckets) + 1))
  }

  /** Per-document DSIR weights of a corpus: (idCol, `out`) for every
    * non-null-text row. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      model: DsirModel, out: String = "dsir_weight"): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), dsirWeightExpr(col(textCol), model).as(out))

  /** Deterministic DSIR resampling: keep each row with probability
    * min(1, e^(w − pivot)) — rows at or above the pivot weight always
    * survive, rows below it decay exponentially, the importance-
    * resampling rule made reproducible by the same stable hash
    * threshold as [[hashSample]] (re-running reproduces the exact
    * sample; `pivot` tunes the kept mass). The keep probability is
    * decimal-rounded to 1e-9 BEFORE the compare (floor(x·1e9 + 0.5))
    * so a SQL engine's `exp` — correct only to ulps — reproduces the
    * selection bit-exactly, the [[temperatureMixture]] discipline.
    * One narrow filter; nothing shuffles. When `weightCol` aliases an
    * EXPENSIVE scoring projection ([[dsirWeightExpr]]'s per-ngram
    * fold), materialize that narrow (key, weight) frame first
    * (localCheckpoint or a table) — predicate pushdown substitutes the
    * alias into the filter and runs the scoring twice per row
    * otherwise (measured 2.2× on the sf0.1 ledger query). */
  def dsirSample(df: DataFrame, keyCol: String, weightCol: Column,
      pivot: Double = 0.0, salt: String = ""): DataFrame =
    df.filter(dsirKeepExpr(col(keyCol), weightCol, pivot, salt))

  /** Derive the [[dsirSample]] pivot that keeps (in expectation) a
    * requested FRACTION of the rows — the paper's actual workflow
    * ("resample raw down to N docs") rather than a hand-tuned pivot.
    * One bounded histogram pass over the weights (the
    * [[Sketches.histogramQuantilesAuto]] discipline: min/max agg →
    * `targetBins` equi-width bins → ≤ targetBins+1 count rows to the
    * driver), then a driver-side binary search for the p with
    * Σ_bins count·min(1, e^(midpoint − p)) = keepFraction·n. The
    * result is a deterministic function of the weight distribution —
    * re-deriving on the same frame reproduces it bit-exactly, so a
    * batch filter and its attribution twin can derive independently
    * and still agree. Accuracy is bin-width bound (keepFraction·n to
    * within the mass of one bin); the SELECTION under the derived
    * pivot is exact and deterministic as always.
    *
    * Call on the MATERIALIZED narrow weights frame (the [[dsirSample]]
    * pushdown note) — this runs an aggregate over it, and a lazy
    * scoring projection would re-run the per-ngram fold here and again
    * in the sample filter. */
  def dsirPivotForKeep(weights: DataFrame, weightCol: String,
      keepFraction: Double, targetBins: Int = 2048): Double = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction must be in (0, 1], got $keepFraction")
    require(targetBins >= 1, s"targetBins must be >= 1, got $targetBins")
    val w = col(weightCol).cast("double")
    val r = weights.filter(w.isNotNull)
      .agg(min(w).as("mn"), max(w).as("mx"), count(lit(1)).as("n")).head()
    require(!r.isNullAt(0),
      s"dsirPivotForKeep: '$weightCol' has no non-NULL values")
    val mn = r.getDouble(0)
    val mx = r.getDouble(1)
    val n = r.getLong(2)
    if (keepFraction == 1.0) return mn // every row at/above pivot: prob 1
    // all-equal degenerate case is closed-form: min(1, e^(mn−p)) = f
    if (mx == mn) return mn - math.log(keepFraction)
    val width = (mx - mn) / targetBins.toDouble
    val hist = weights.filter(w.isNotNull)
      .select(floor((w - lit(mn)) / lit(width)).cast("int").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect().map(row => (mn + (row.getInt(0) + 0.5) * width,
        row.getLong(1).toDouble))
    def kept(p: Double): Double = {
      var acc = 0.0
      hist.foreach { case (wb, c) =>
        acc += c * math.min(1.0, math.exp(wb - p)) }
      acc
    }
    val target = keepFraction * n
    // kept(p) is strictly decreasing; e^(−60) bounds the tail
    var lo = mn
    var hi = mx + 60.0
    var i = 0
    while (i < 100) {
      val mid = (lo + hi) / 2
      if (kept(mid) > target) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }

  /** [[dsirSample]] sized by kept fraction: derive the pivot
    * ([[dsirPivotForKeep]]) and apply the existing deterministic rule.
    * Returns the kept rows AND the derived pivot (callers export the
    * pivot — to an oracle, a config, or the streaming gate, which needs
    * a CONSTANT pivot for stream==batch parity). */
  def dsirSampleSized(weights: DataFrame, keyCol: String,
      weightCol: String, keepFraction: Double, salt: String = "",
      targetBins: Int = 2048): (DataFrame, Double) = {
    val pivot = dsirPivotForKeep(weights, weightCol, keepFraction,
      targetBins)
    (dsirSample(weights, keyCol, col(weightCol), pivot, salt), pivot)
  }

  /** The [[dsirSample]] keep predicate as a reusable expression (the
    * curation pipeline's resampling stage and its drop-attribution
    * twin need the same boolean). */
  def dsirKeepExpr(key: Column, weight: Column, pivot: Double,
      salt: String = ""): Column = {
    // the >= pivot branch avoids floor(exp(huge)·1e9) long overflow AND
    // pins the boundary case to both engines' THEN branch
    val p = when(weight >= pivot, lit(1.0))
      .otherwise(floor(exp(weight - lit(pivot)) * 1e9 + 0.5)
        .cast("double") / 1e9)
    hashU60(concat(key.cast("string"), lit(salt)))
      .cast("double") / U60Denom < p
  }

  /** Deterministic per-domain TOKEN-BUDGET cut: within each domain, take
    * documents in ascending (u60 hash, key) order until the cumulative
    * token count reaches the domain's budget — the "give me exactly B
    * tokens of domain d, reproducibly" step that sizes a training set.
    * The first document crossing the budget is included (its preceding
    * mass is under budget), so every budget is met when the domain has
    * enough tokens. Output: (keyCol, domainCol, n_tokens).
    *
    * Scale shape — two bounding layers around one tiny sort:
    *   1. A hash-threshold PREFILTER (rate ≈ slack·budget/domainTokens,
    *      one bounded agg) cuts each domain to ≈slack× its budget.
    *      Survivors of a hash threshold form a PREFIX of the (hash, key)
    *      order, so the cut over survivors equals the cut over the full
    *      domain whenever surviving mass covers the budget — a driver
    *      loop VERIFIES that (one agg per round), doubling undershot
    *      rates with a rate-1 fallback after `maxWiden` rounds.
    *   2. The per-domain prefix itself is found WITHOUT sorting the
    *      survivors: hash-range `buckets` (top bits of the u60, so
    *      bucket order = hash order) are summed in one agg (≤ domains ×
    *      buckets rows to the driver), the budget-CROSSING bucket is
    *      located driver-side, every bucket before it is taken whole
    *      (no exchange at all), and only the crossing bucket — ~1/buckets
    *      of the survivors — is window-sorted with the residual budget.
    *      A naive `Window.partitionBy(domain)` would put a whole
    *      domain's survivors in ONE task; at a 10¹²-token budget that
    *      single task is the job. Here the one sort touches
    *      ~slack·budget/buckets tokens.
    * The output CONTRACT is exactly the pure-window semantics at any
    * (slack, buckets) — both parameters only bound work. `buckets = 1`
    * degenerates to the plain full-survivor window (used by tests as
    * the reference). */
  def tokenBudgetSample(df: DataFrame, keyCol: String, domainCol: String,
      textCol: String, budgets: Map[String, Long], salt: String = "",
      slack: Double = 1.3, maxWiden: Int = 6,
      tokensCol: Option[String] = None, buckets: Int = 4096): DataFrame = {
    require(budgets.nonEmpty, "tokenBudgetSample: empty budgets")
    budgets.foreach { case (d, b) =>
      require(b > 0, s"tokenBudgetSample: budget for '$d' must be > 0, got $b")
    }
    require(slack > 1.0, s"tokenBudgetSample: slack must be > 1, got $slack")
    require(buckets >= 1 && buckets <= (1 << 20),
      s"tokenBudgetSample: buckets must be in [1, 2^20], got $buckets")
    import org.apache.spark.sql.expressions.Window
    val ds = budgets.keys.toSeq.sorted
    val tokExpr = tokensCol.map(c => col(c).cast("long"))
      .getOrElse(TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val base = df.filter(col(domainCol).isin(ds: _*))
      .select(col(keyCol), col(domainCol), tokExpr.as("n_tokens"),
        hashU60(concat(col(keyCol).cast("string"), lit(salt))).as("__h__"))
    val totals = base
      .groupBy(col(domainCol).cast("string").as("d"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def thrExpr(rates: Map[String, Double]): Column =
      ds.tail.foldLeft(
        when(col(domainCol) === ds.head,
          lit((rates(ds.head) * U60Denom).toLong))) { (acc, d) =>
        acc.when(col(domainCol) === d, lit((rates(d) * U60Denom).toLong))
      }.otherwise(lit(-1L))
    var rates: Map[String, Double] = ds.map { d =>
      val t = totals.getOrElse(d, 0L)
      d -> (if (t <= 0L) 1.0
            else math.min(1.0, slack * budgets(d).toDouble / t.toDouble))
    }.toMap
    // exactness loop: a domain whose surviving mass is under its budget
    // (possible only while its rate < 1) widens until covered
    var widen = 0
    var under = Seq.empty[String]
    do {
      val mass = base.filter(col("__h__") < thrExpr(rates))
        .groupBy(col(domainCol).cast("string").as("d"))
        .agg(sum(col("n_tokens")).as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      under = ds.filter(d => rates(d) < 1.0 &&
        mass.getOrElse(d, 0L) < budgets(d))
      if (under.nonEmpty) {
        widen += 1
        val bump = if (widen >= maxWiden) Double.MaxValue else 2.0
        rates = rates ++ under.map(d =>
          d -> math.min(1.0, rates(d) * bump))
      }
    } while (under.nonEmpty && widen <= maxWiden)
    val surv = base.filter(col("__h__") < thrExpr(rates))
    def perDomain(m: Map[String, Long], default: Long): Column =
      ds.tail.foldLeft(
        when(col(domainCol) === ds.head,
          lit(m.getOrElse(ds.head, default)))) { (acc, d) =>
        acc.when(col(domainCol) === d, lit(m.getOrElse(d, default)))
      }.otherwise(lit(default))
    // bucketed prefix: hash-range buckets preserve hash order, so the
    // budget-crossing bucket is locatable from one bounded agg and only
    // ITS rows need the window sort
    val width = (U60Denom / buckets).toLong
    val bCol = (col("__h__") / lit(width)).cast("long")
    val bStats = surv
      .groupBy(col(domainCol).cast("string").as("d"), bCol.as("b"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val crossing: Map[String, (Long, Long)] = ds.flatMap { d =>
      val rows = bStats.filter(_._1 == d).map(r => (r._2, r._3)).sortBy(_._1)
      var acc = 0L
      var found: Option[(Long, Long)] = None
      for ((b, t) <- rows if found.isEmpty) {
        if (acc + t >= budgets(d)) found = Some((b, acc))
        acc += t
      }
      found.map(d -> _) // None = domain total under budget: take it all
    }.toMap
    val cbCol = perDomain(crossing.view.mapValues(_._1).toMap, Long.MaxValue)
    val pmCol = perDomain(crossing.view.mapValues(_._2).toMap, 0L)
    val budgetCol = perDomain(budgets, 0L)
    val before = surv.filter(bCol < cbCol)
      .select(col(keyCol), col(domainCol), col("n_tokens"))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("__h__").asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val crossKept = surv.filter(bCol === cbCol)
      .withColumn("__cum__", sum(col("n_tokens")).over(w))
      .filter(col("__cum__") - col("n_tokens") < budgetCol - pmCol)
      .select(col(keyCol), col(domainCol), col("n_tokens"))
    before.union(crossKept)
  }

  /** The u60 interval boundaries for [[assignSplits]] — public so an
    * oracle mirror can embed the EXACT same longs (the cumulative-sum
    * float arithmetic must happen once, not be re-derived). Returns one
    * boundary per split except the last (which takes the remainder). */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty, "assignSplits: at least one split")
    splits.foreach { case (s, w) =>
      require(w > 0, s"assignSplits: weight for '$s' must be > 0, got $w")
    }
    require(splits.map(_._1).distinct.size == splits.size,
      s"assignSplits: duplicate split names in ${splits.map(_._1)}")
    val total = splits.map(_._2).sum
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => (c / total * U60Denom).toLong)
  }

  /** Deterministic train/val/test SPLIT assignment: each row gets the
    * label whose cumulative-weight interval contains its u60 key hash —
    * disjoint, exhaustive, resume-stable (the md5 discipline of
    * [[hashSample]]), and a different `salt` re-deals the split. One
    * narrow map; nothing shuffles. Weights need not sum to 1. */
  def assignSplits(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], salt: String = "",
      out: String = "split"): DataFrame = {
    val thresholds = splitThresholds(splits)
    val h = hashU60(concat(col(keyCol).cast("string"), lit(salt)))
    val expr = thresholds.zip(splits.map(_._1))
      .foldRight(lit(splits.last._1): Column) { case ((thr, name), acc) =>
        when(h < lit(thr), lit(name)).otherwise(acc)
      }
    df.withColumn(out, expr)
  }

  /** LEAKAGE-FREE splits: near-duplicate clusters are assigned as a
    * unit. The split hash is taken on each document's duplicate-group
    * REPRESENTATIVE (connected components over `pairs`, min-id rep via
    * [[Dedup.duplicateGroups]]), so two near-duplicates can never land
    * in different splits — the classic train/test-contamination mistake
    * that inflates held-out scores (a test doc whose near-copy sits in
    * train). Documents in no pair are their own representative; the
    * split RATIOS hold over clusters, not documents (a mega-cluster
    * moves as one). Adds one bounded-iteration CC pass + an id-only
    * join over [[assignSplits]]'s narrow map. */
  def assignSplitsByGroup(df: DataFrame, keyCol: String,
      pairs: DataFrame, aCol: String, bCol: String,
      splits: Seq[(String, Double)], salt: String = "",
      out: String = "split"): DataFrame = {
    require(keyCol != "rep",
      "assignSplitsByGroup: rename the key column apart from 'rep'")
    val groups = Dedup.duplicateGroups(df.select(col(keyCol)), keyCol,
      pairs, aCol, bCol)
    assignSplits(df.join(groups, Seq(keyCol)), "rep", splits, salt, out)
      .drop("rep")
  }

  // ——— PII redaction ———

  /** Regex PII scrubbing: emails → `<EMAIL>`, IPv4 addresses → `<IP>`,
    * international-format phone numbers (leading `+`) → `<PHONE>`.
    * Patterns are RE2-compatible (no lookaround), so the DuckDB oracle
    * runs the identical expressions. Order matters: emails first (their
    * local parts can contain digits), then IPs, then phones. Narrow map,
    * stays in codegen. */
  def redactPii(df: DataFrame, textCol: String,
      out: String = "redacted"): DataFrame =
    df.withColumn(out, piiRedactedExpr(col(textCol)))

  /** The email → IP → phone redaction chain as a column expression
    * (the [[redactPii]] body, reusable by the curation pipeline's
    * output-scrub stage). */
  def piiRedactedExpr(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val phone = "\\+\\d{1,3}[- ]?\\d{3}[- ]?\\d{3,4}[- ]?\\d{3,4}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ipv4, "<IP>"),
      phone, "<PHONE>")
  }

  /** Payment-card-number detection + redaction with Luhn validation —
    * the scrubbing step regex alone cannot do: a 13-19-digit run is only
    * PII if its Luhn mod-10 checksum holds (ISO/IEC 7812), so order ids
    * and timestamps that happen to be long digit runs survive while real
    * card numbers are masked.
    *
    * Candidates: `\b`-anchored runs of 13-19 digits with optional single
    * space/dash separators between digits (the common display groupings;
    * RE2-compatible pattern — no lookaround — so the DuckDB oracle runs
    * the identical regex). Each candidate's digits (separators stripped)
    * are Luhn-checked — double every second digit from the RIGHT,
    * subtract 9 when the double exceeds 9, valid iff the sum is ≡ 0
    * (mod 10); only VALID candidates are replaced with `<CARD>`.
    *
    * Replacement is REPLACE-ALL per candidate STRING, not per matched
    * span: every occurrence of a valid candidate's exact text is
    * substituted, including an occurrence embedded in a longer digit
    * run that was never itself a candidate (where it can splice
    * `<CARD>` between surviving digits). This is deliberate — a
    * positional splice cannot be expressed in RE2-safe built-ins that
    * an external SQL mirror replays (no lookaround, no callback
    * replace), and over-redaction of PII-adjacent digits is the safe
    * direction for a scrubbing stage. The codegen kernel replays the
    * same fold bit-exactly.
    *
    * Adds `n_card_candidates`, `n_cards_valid`, and `out` (the redacted
    * text). All pure built-ins — regexp_extract_all, higher-order
    * filter/aggregate over the candidate array, integer Luhn arithmetic
    * — one narrow map, no UDF, embarrassingly parallel at 100 TB and
    * deterministic enough to hash-match an external SQL mirror.
    * NULL text passes through as NULL with NULL counts (no candidates
    * is `0`, unknown text is unknown — the SQL-natural convention). */
  def redactCards(df: DataFrame, textCol: String,
      out: String = "redacted"): DataFrame = {
    val k = graft.functions.functions.card_redact(col(textCol))
    df.withColumn("__cr__", k)
      .withColumn("n_card_candidates",
        col("__cr__.n_candidates").cast("long"))
      .withColumn("n_cards_valid", col("__cr__.n_valid").cast("long"))
      .withColumn(out, col("__cr__.redacted"))
      .drop("__cr__")
  }

  /** The ORIGINAL column composition of [[redactCards]] (candidates →
    * HOF Luhn filter → replace fold), kept as the differential twin of
    * the [[graft.functions.CardRedact]] kernel (the HOFs evaluate
    * interpreted — the DESIGN §14/16 ceiling — on what
    * `redactOutputPii` makes a full-corpus pass). CorpusRulesSpec pins
    * kernel == chain bit-exactly on adversarial digit soup. */
  private[graft] def redactCardsChain(df: DataFrame, textCol: String,
      out: String = "redacted"): DataFrame = {
    val cands = cardCandidatesExpr(col(textCol))
    val valid = filter(cands, luhnValidExpr(_))
    df.withColumn("__cc__", cands)
      .withColumn("__ccv__", valid)
      .withColumn("n_card_candidates", size(col("__cc__")).cast("long"))
      .withColumn("n_cards_valid", size(col("__ccv__")).cast("long"))
      .withColumn(out,
        aggregate(col("__ccv__"), col(textCol),
          (acc: Column, c: Column) => replace(acc, c, lit("<CARD>"))))
      .drop("__cc__", "__ccv__")
  }

  /** The card-candidate extraction of [[redactCards]] as an expression:
    * `\b`-anchored 13-19-digit runs with optional single space/dash
    * separators (RE2-compatible — no lookaround). */
  def cardCandidatesExpr(text: Column): Column =
    regexp_extract_all(text, lit("\\b[0-9](?:[ -]?[0-9]){12,18}\\b"), lit(0))

  /** Luhn mod-10 validity of one candidate string (separators stripped;
    * 13-19 digits required). Double every second digit from the RIGHT
    * (reverse + 0-based index i, odd i doubles, −9 when the double
    * exceeds 9); valid iff the sum ≡ 0 (mod 10). `aggregate` over
    * `sequence` keeps the whole check inside codegen'd built-ins. */
  def luhnValidExpr(c: Column): Column = {
    val ds = regexp_replace(c, "[ -]", "")
    val rev = reverse(ds)
    val luhnSum = aggregate(
      sequence(lit(0), length(ds) - 1),
      lit(0),
      (acc: Column, i: Column) => {
        val d = ascii(rev.substr(i + 1, lit(1))) - 48
        val dbl = d * 2
        acc + when(i % 2 === 1, when(dbl > 9, dbl - 9).otherwise(dbl))
          .otherwise(d)
      })
    // the regex already bounds total run length; re-check the DIGIT
    // count so separator-heavy matches can't sneak a short number in.
    // The length guard WRAPS the fold (not just conjoins): on a <13-char
    // (or empty) input `sequence(0, length-1)` would infer a negative
    // step and the fold would run substr over out-of-range indices —
    // the && is not short-circuit per-row, so the garbage arithmetic
    // would actually evaluate. Guarded, the sum only exists for
    // plausible candidates; the boolean result is unchanged.
    when(length(ds).between(13, 19), luhnSum % 10 === 0)
      .otherwise(lit(false))
  }

  /** [[redactCards]]' rewrite as a single column expression: every
    * Luhn-VALID candidate replaced with `<CARD>` (literal replace fold
    * seeded with the text — an empty valid list is the identity).
    * This is the HOF CHAIN form, kept as the differential twin of the
    * codegen kernel ([[graft.functions.CardRedactText]]) that the
    * pipeline actually runs. */
  def cardRedactedExpr(text: Column): Column =
    aggregate(filter(cardCandidatesExpr(text), luhnValidExpr(_)), text,
      (acc: Column, c: Column) => replace(acc, c, lit("<CARD>")))

  /** The full output-scrub chain of the curation pipeline: emails →
    * IPs → phones → Luhn-valid cards. Cards must run LAST — the phone
    * rule's digit runs could otherwise be consumed as card candidates
    * (a 13-digit "+"-less phone body passes Luhn for ~10% of numbers),
    * while no earlier tag leaves digits behind for the card rule to
    * misread. The card stage is the codegen kernel
    * ([[graft.functions.CardRedactText]] — bit-exact to
    * [[cardRedactedExpr]]); the email/IP/phone stages are
    * `regexp_replace` built-ins, already codegen'd. */
  def piiAndCardsRedactedExpr(text: Column): Column =
    graft.functions.functions.card_redact_text(piiRedactedExpr(text))
}
