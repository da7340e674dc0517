package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation: the standard LLM-data cleaning
  * sequence composed from this library's oracle-checked stages, in the
  * order production pipelines run them (cheapest-per-byte first, so each
  * stage shrinks the input of the next):
  *
  *   0. (optional) line-level boilerplate strip — rewrite each doc with
  *                           cross-document common segments removed
  *                           ([[Dedup.stripCommonSegments]] /
  *                           [[graft.streaming.Streams.stripSegmentsGate]]
  *                           for arrivals) so shared nav/banner chrome
  *                           can't make near-identical pages look
  *                           distinct to the doc-level stages;
  *   1. exact dedup        — keep the min-id row per identical text
  *                           ([[Dedup.exactDedup]]; map-side-combined
  *                           hash aggregate, id-only semi-join back);
  *   2. near-dup removal   — MinHash/LSH pairs at a Jaccard threshold,
  *                           drop the higher-id side of every verified
  *                           pair ([[Dedup.nearDupPairsMinhash]]; banded
  *                           signature join, bucket-capped star on
  *                           boilerplate clusters). Dropping every id
  *                           that has a smaller near-dup is closure-free
  *                           and deterministic — no connected-components
  *                           pass is needed to pick survivors;
  *   3. decontamination    — drop any doc whose n-gram containment of a
  *                           benchmark doc crosses the threshold
  *                           ([[TextAnalysis.ngramContainment]];
  *                           broadcast bench grams). Benchmark rows that
  *                           are themselves in the corpus self-match at
  *                           containment 1.0 and are dropped — the
  *                           desired "test set must not be trained on"
  *                           semantics;
  *   4. quality filter     — Gopher rule flags, keep only docs passing
  *                           every rule ([[TextAnalysis.gopherQualityFlags]];
  *                           one narrow codegen map);
  *   5. language filter    — n-gram/stopword language id, optionally
  *                           dropping unidentifiable docs
  *                           ([[TextAnalysis.langId]]).
  *
  * Every stage is shuffle-light at 100 TB: stages 1–3 move only ids,
  * signatures, or n-grams (never full text more than once), stages 4–5
  * are narrow maps. The whole pipeline is one declarative plan — Catalyst
  * fuses the filters and the scan is shared.
  *
  * Output: the surviving rows of `docs` (all original columns) plus
  * `n_words` (long, from the quality stage) and `lang_pred` (string).
  *
  * Reference corpus-pipeline semantics: Rae et al. 2021 (Gopher §A1.1),
  * Lee et al. ACL 2022 (dedup), Brown et al. 2020 §C (benchmark
  * decontamination via n-gram overlap).
  */
object Curate {

  /** Knobs for [[curate]]; defaults mirror the individual operators'. */
  case class Config(
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      jaccardThreshold: Double = 0.5,
      maxBucket: Long = 8192L,
      contamNgram: Int = 2,
      contamThreshold: Double = 0.2,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minStopwords: Int = 2,
      dropUnknownLang: Boolean = true,
      // optional model tier AFTER the rule tier: a trained
      // [[QualityModel.Logistic]] appends quality_prob and drops docs
      // under minQualityProb (rules gate the obvious junk; the model
      // ranks what survives — the FineWeb-style two-tier filter)
      qualityModel: Option[QualityModel.Logistic] = None,
      minQualityProb: Double = 0.5,
      // Some(fpp) routes the decontamination stage through the Bloom
      // scale tier ([[TextAnalysis.ngramContainmentLarge]]) instead of
      // the exploded-gram broadcast — for benchmarks too big to
      // broadcast. Identical output at any fpp (the tier's contract),
      // so the pipeline's oracle mirror is unchanged.
      deconBloomFpp: Option[Double] = None,
      // Some(minDocs) PREPENDS the CCNet/RefinedWeb line-level stage:
      // each doc is rewritten with cross-document common segments
      // removed ([[Dedup.stripCommonSegments]]; the ingest twin strips
      // against the persisted hash artifact) before any doc-level
      // stage. This is the production order — removing shared
      // boilerplate is what stops two pages differing only in nav
      // chrome from LOOKING distinct to the dedup stages.
      stripSegmentsMinDocs: Option[Int] = None,
      stripSep: String = "\n",
      // true = SURGICAL decontamination: strip the leaked benchmark
      // `contamNgram`-gram windows from each doc
      // ([[Dedup.stripContaminatedSpans]]) instead of relying on the
      // drop stage — for corpora precious enough that a quote shouldn't
      // cost the whole document. The containment DROP stage still runs
      // afterwards as the safety net (gap closure after a strip can in
      // principle mint a new adjacency that matches a bench gram; in
      // practice it measures zero residual — spec-pinned), and a doc
      // that was a verbatim benchmark copy strips to nothing and falls
      // to the quality stage.
      contamStripSpans: Boolean = false,
      // true = unicode/whitespace normalization
      // ([[TextAnalysis.normalizeText]]) as the very first rewrite —
      // before ANY hash is taken, so "é" and "e"+U+0301 can't produce
      // distinct fingerprints/signatures for visually identical text.
      // A pure column expression: no join, no shuffle, fused into the
      // base scan.
      normalizeUnicode: Boolean = false,
      // Some((model, pivot)) APPENDS the DSIR importance-resampling
      // stage (Xie et al. 2023) after every filter: each surviving doc
      // is kept with probability min(1, e^(w − pivot)), w its hashed-
      // n-gram target-vs-raw log-likelihood ratio under the trained
      // [[Corpus.DsirModel]] — the data-SELECTION step that tilts a
      // cleaned corpus toward a target distribution. Deterministic
      // (stable hash threshold keyed on the doc id), a pure expression:
      // no join, no shuffle.
      dsir: Option[(Corpus.DsirModel, Double)] = None,
      // Some(f) SIZES the dsir stage by kept mass instead of the raw
      // pivot: the pivot is derived once per run from the INPUT
      // corpus' weight distribution ([[Corpus.dsirPivotForKeep]] —
      // one bounded histogram pass), overriding the tuple's pivot.
      // Derivation is deterministic in the corpus, so [[curate]] and
      // [[curateDrops]] derive independently and agree (the partition
      // property holds). The STREAMING gate refuses this knob — a
      // stream has no corpus to derive from; resolve the fraction to
      // a constant pivot offline and pass it in `dsir` (stream==batch
      // parity requires a constant).
      dsirKeepFraction: Option[Double] = None,
      // true = PII scrubbing as the FINAL rewrite on the survivors'
      // text ([[Corpus.piiAndCardsRedactedExpr]]: emails → IPs →
      // phones → Luhn-valid card numbers). An OUTPUT-hygiene rewrite,
      // not a filter: it runs after every stage so no upstream hash
      // sees masked text (two spam variants differing only in their
      // contact emails must still near-dup-pair on the real content),
      // it adds/removes no row (drop attribution and the
      // curate ∪ curateDrops partition property are untouched), and
      // the streaming gate applies the identical expression per batch
      // (stream == batch parity is free — the rewrite is per-row).
      redactOutputPii: Boolean = false)

  /** Although the SEMANTICS are a staged cascade (each stage filtering
    * the last), the PLAN is not: a literal cascade re-derives every
    * upstream stage wherever it is referenced, and the whole pipeline
    * re-scans the corpus ~56 times (measured at sf0.001). Instead each
    * stage's drop/keep set is computed from the BASE scan and the
    * survivors assembled in one final pass over narrow id-sets — ~6
    * corpus scans total, each one column-pruned. This is legal because
    * decontamination, quality and language are per-row (restriction
    * commutes with filtering), and the near-dup drop set over the FULL
    * corpus equals the staged one: if pair (a, b) fires where `a` is an
    * exact-dup of an earlier rep `m`, then `m` shares `a`'s text, hence
    * its signature and buckets, so pair (m, b) fires too (under the
    * bucket cap the star anchors at the bucket minimum, which is never
    * the dropped side) — every extra full-corpus pair only re-drops a
    * doc the exact stage already dropped. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      cfg: Config = Config()): DataFrame = {
    require(idCol != "n_words" && idCol != "lang_pred" &&
      textCol != "n_words" && textCol != "lang_pred",
      "rename the id/text columns apart from the appended n_words/lang_pred")

    // 0 (optional) — line-level boilerplate strip, then 0b (optional) —
    // surgical decontamination, both rewriting textCol in place before
    // any doc-level stage sees it (a leaked quote must not make two
    // otherwise-distinct docs look alike, nor differently-quoted copies
    // of one doc look distinct)
    val docs1 = materializedRewrites(contamStripped(
      segStripped(normalized(docs, textCol, cfg), idCol, textCol, cfg),
      idCol, textCol, bench, benchIdCol, benchTextCol, cfg), cfg)
    curatePostStrip(docs1, idCol, textCol, bench, benchIdCol, benchTextCol, cfg)
  }

  /** Materialize the rewritten corpus ONCE when a strip-JOIN tier is on.
    * The one-pass id-set assembly references the corpus from ~6 branches
    * (exact keep, near-dup pairs, contamination, the survivor pass, and
    * curateDrops' marker joins); with a rewrite JOIN under it, every
    * branch re-derives the whole strip subtree — and the replicated
    * sort-merge sorts running concurrently exhaust the task memory pool
    * (measured: full-tier curate at 1M docs x 32 threads dies with
    * UNABLE_TO_ACQUIRE_MEMORY; with the checkpoint it completes). An
    * eager localCheckpoint truncates the lineage so each branch reads
    * the materialized rows instead — the [[Dedup.nearDupPairsMinhash]]
    * banded-frame discipline. Pure-column rewrites (normalizeUnicode
    * alone) replicate safely and skip the materialization; blocks are
    * freed by the ContextCleaner when the per-call frame dies. */
  private def materializedRewrites(docs: DataFrame, cfg: Config): DataFrame =
    if (cfg.stripSegmentsMinDocs.nonEmpty || cfg.contamStripSpans)
      docs.localCheckpoint()
    else docs

  /** Apply [[Config.normalizeUnicode]]'s rewrite (identity when off) —
    * a pure column expression, so Catalyst fuses it into the scan. */
  private def normalized(docs: DataFrame, textCol: String,
      cfg: Config): DataFrame =
    if (!cfg.normalizeUnicode) docs
    else docs.withColumn(textCol,
      when(col(textCol).isNotNull, TextAnalysis.normalizeText(col(textCol))))

  /** Apply [[Config.stripSegmentsMinDocs]]'s rewrite (identity when off). */
  private def segStripped(docs: DataFrame, idCol: String,
      textCol: String, cfg: Config): DataFrame =
    cfg.stripSegmentsMinDocs match {
      case Some(m) => withStrippedText(docs, idCol, textCol,
        Dedup.stripCommonSegments(docs, idCol, textCol, cfg.stripSep, m))
      case None => docs
    }

  /** Apply [[Config.contamStripSpans]]'s rewrite (identity when off). */
  private def contamStripped(docs: DataFrame, idCol: String,
      textCol: String, bench: DataFrame, benchIdCol: String,
      benchTextCol: String, cfg: Config): DataFrame =
    if (!cfg.contamStripSpans) docs
    else withStrippedText(docs, idCol, textCol,
      Dedup.stripContaminatedSpans(docs, idCol, textCol,
        bench, benchIdCol, benchTextCol, cfg.contamNgram))

  /** Stages 1–5 over an (optionally pre-stripped) corpus. */
  private def curatePostStrip(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      cfg: Config): DataFrame = {
    // 1 — exact-dedup survivors (min id per identical text)
    val exactKeep = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol)).select(idCol)

    // 2 — near-dup drop set: the distinct higher-id side of every
    // verified pair (id_a < id_b by construction)
    val ndDrop = Dedup.nearDupPairsMinhash(docs, idCol, textCol,
        cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.jaccardThreshold,
        cfg.maxBucket)
      .select(col("id_b").as(idCol)).distinct()

    // 3 — decontamination drop set (containment >= threshold); the
    // bloom tier produces the identical set when configured
    val corpusSide = docs.select(col(idCol).as("__corpus_id__"), col(textCol))
    val benchSide = bench.select(col(benchIdCol).as("__bench_id__"),
      col(benchTextCol).as(textCol))
    val contamDrop = (cfg.deconBloomFpp match {
      case Some(fpp) => TextAnalysis.ngramContainmentLarge(
        corpusSide, "__corpus_id__", textCol, benchSide, "__bench_id__",
        textCol, cfg.contamNgram, cfg.contamThreshold, fpp)
      case None => TextAnalysis.ngramContainment(
        corpusSide, "__corpus_id__", textCol, benchSide, "__bench_id__",
        textCol, cfg.contamNgram, cfg.contamThreshold)
    }).select(col("__corpus_id__").as(idCol)).distinct()

    // 4–5 assemble: one pass over the base scan against the id-sets,
    // then the per-row quality/language maps
    // shuffle_hash on the drop-id sides: their post-agg size estimates
    // defeat auto-broadcast, and the default sort-merge SORTS the whole
    // corpus side per anti join (guide §3.1) — hashing the slim id sets
    // streams the corpus through both anti joins sort-free, on the one
    // exchange-by-id it pays either way
    val survivors = docs
      .join(exactKeep, Seq(idCol), "left_semi")
      .join(ndDrop.hint("shuffle_hash"), Seq(idCol), "left_anti")
      .join(contamDrop.hint("shuffle_hash"), Seq(idCol), "left_anti")
    val cleaned = qualityAndLang(survivors, idCol, textCol, cfg)
    // 6 (optional) — DSIR importance resampling over what survived
    // every filter (resampling a corpus that still holds junk would
    // just re-weight the junk); a pure expression filter, no join
    val resampled =
      resolvedDsir(docs, textCol, cfg).fold(cleaned) { case (model, pivot) =>
        cleaned.filter(Corpus.dsirKeepExpr(col(idCol),
          Corpus.dsirWeightExpr(col(textCol), model), pivot))
      }
    redactedOutput(resampled, textCol, cfg)
  }

  /** Apply [[Config.redactOutputPii]]'s FINAL rewrite (identity when
    * off) — after every filter, so no upstream hash ever sees masked
    * text. A pure column expression: fused into the survivor pass. */
  private def redactedOutput(survivors: DataFrame, textCol: String,
      cfg: Config): DataFrame =
    if (!cfg.redactOutputPii) survivors
    else survivors.withColumn(textCol,
      when(col(textCol).isNotNull,
        Corpus.piiAndCardsRedactedExpr(col(textCol))))

  /** The effective (model, pivot) of the dsir stage: when
    * [[Config.dsirKeepFraction]] is set, the pivot is DERIVED from this
    * corpus' weight distribution ([[Corpus.dsirPivotForKeep]] — one
    * bounded histogram pass over a materialized narrow weights frame,
    * released after). The derivation is deterministic in the corpus,
    * so [[curate]] and [[curateDrops]] — which both call this on the
    * same (post-strip) frame — agree without sharing state, preserving
    * the partition property. The fraction is of the SCORED docs (text
    * non-NULL, the full rewritten corpus — the paper's "resample raw",
    * not of the post-filter survivors): the realized kept share of
    * curate's OUTPUT can sit slightly off f where the quality stages
    * correlate with the weights. */
  private def resolvedDsir(docs: DataFrame, textCol: String,
      cfg: Config): Option[(Corpus.DsirModel, Double)] =
    cfg.dsir.map { case (model, pivot) =>
      cfg.dsirKeepFraction match {
        case None => (model, pivot)
        case Some(f) =>
          val w = docs.filter(col(textCol).isNotNull)
            .select(Corpus.dsirWeightExpr(col(textCol), model)
              .as("__dsir_w"))
            .localCheckpoint()
          try (model, Corpus.dsirPivotForKeep(w, "__dsir_w", f))
          finally org.apache.spark.sql.GraftShims.releaseCheckpoint(w)
      }
    }

  /** Drop ATTRIBUTION — the audit/explain twin of [[curate]]: one row
    * per DROPPED document with the FIRST pipeline stage that drops it
    * (`drop_stage` ∈ exact_dup, near_dup, contaminated, quality,
    * language, model_quality, dsir_resampled — pipeline order;
    * survivors are absent).
    * [[curate]]'s ids and [[curateDrops]]'s ids partition the corpus:
    * this is the "why was my document removed" report every curation
    * run owes its operators, and the per-stage drop counts fall out of
    * one groupBy over the result.
    *
    * Same one-pass id-set assembly as [[curate]] (the drop sets are
    * computed from the base scan; per-row stages are pure expressions),
    * so the plan adds only the three marker joins over the same
    * subtrees. Stage attribution matches the staged-cascade semantics
    * by the same argument as [[curate]]'s survivor equivalence: the
    * full-corpus near-dup/contamination sets only differ from the
    * staged ones on documents an EARLIER stage already dropped, and the
    * `when` precedence consults each set only for documents that
    * survived every earlier stage. */
  def curateDrops(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      cfg: Config = Config()): DataFrame = {
    require(idCol != "drop_stage" && textCol != "drop_stage",
      "rename the id/text columns apart from the appended drop_stage")
    // same optional pre-rewrites as [[curate]] — attribution is judged
    // over the REWRITTEN text (a doc emptied by a strip attributes to
    // "quality", which is what operationally happened to it), and the
    // curate ∪ curateDrops partition property is preserved because the
    // left-join rewrite keeps every row, null texts included
    val docs1 = materializedRewrites(contamStripped(
      segStripped(normalized(docs, textCol, cfg), idCol, textCol, cfg),
      idCol, textCol, bench, benchIdCol, benchTextCol, cfg), cfg)
    curateDropsPostStrip(docs1, idCol, textCol, bench, benchIdCol,
      benchTextCol, cfg)
  }

  private def curateDropsPostStrip(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      cfg: Config): DataFrame = {
    val exactKeep = docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val ndDrop = Dedup.nearDupPairsMinhash(docs, idCol, textCol,
        cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.jaccardThreshold,
        cfg.maxBucket)
      .select(col("id_b").as(idCol)).distinct()
    val corpusSide = docs.select(col(idCol).as("__corpus_id__"), col(textCol))
    val benchSide = bench.select(col(benchIdCol).as("__bench_id__"),
      col(benchTextCol).as(textCol))
    val contamDrop = (cfg.deconBloomFpp match {
      case Some(fpp) => TextAnalysis.ngramContainmentLarge(
        corpusSide, "__corpus_id__", textCol, benchSide, "__bench_id__",
        textCol, cfg.contamNgram, cfg.contamThreshold, fpp)
      case None => TextAnalysis.ngramContainment(
        corpusSide, "__corpus_id__", textCol, benchSide, "__bench_id__",
        textCol, cfg.contamNgram, cfg.contamThreshold)
    }).select(col("__corpus_id__").as(idCol)).distinct()
    val (_, rules) = TextAnalysis.gopherRules(col(textCol),
      minWords = cfg.minWords, maxWords = cfg.maxWords,
      minStopwords = cfg.minStopwords)
    val ruleKeep = rules.map(_._2).reduce(_ && _)
    val modelFail: Column = cfg.qualityModel match {
      case Some(m) =>
        QualityModel.scoreExpr(textCol, m) < cfg.minQualityProb
      case None => lit(false)
    }
    val dsirDrop: Column = resolvedDsir(docs, textCol, cfg) match {
      case Some((model, pivot)) => !Corpus.dsirKeepExpr(col(idCol),
        Corpus.dsirWeightExpr(col(textCol), model), pivot)
      case None => lit(false)
    }
    val stage = when(col("__ex__").isNull, "exact_dup")
      .when(col("__nd__").isNotNull, "near_dup")
      .when(col("__ct__").isNotNull, "contaminated")
      .when(col(textCol).isNull || !coalesce(ruleKeep, lit(false)), "quality")
      .when(lit(cfg.dropUnknownLang) &&
        TextAnalysis.langId(col(textCol)) === "und", "language")
      .when(modelFail, "model_quality")
      .when(dsirDrop, "dsir_resampled")
    // shuffle_hash on the drop-marker sides (exactKeep broadcasts fine
    // under its estimate) — same sort-free streaming as
    // [[curatePostStrip]]'s survivor assembly
    docs
      .join(exactKeep.withColumn("__ex__", lit(true)), Seq(idCol), "left")
      .join(ndDrop.withColumn("__nd__", lit(true))
        .hint("shuffle_hash"), Seq(idCol), "left")
      .join(contamDrop.withColumn("__ct__", lit(true))
        .hint("shuffle_hash"), Seq(idCol), "left")
      .select(col(idCol), stage.as("drop_stage"))
      .filter(col("drop_stage").isNotNull)
  }

  /** Replace `textCol` with the strip rewrite's `text_kept`, preserving
    * every other column and every row: null-text docs have no strip row
    * (the strip operators skip them) and keep their null text through
    * the left join, so downstream stages see exactly the rows they
    * would have without the strip tier. */
  private def withStrippedText(docs: DataFrame, idCol: String,
      textCol: String, stripped: DataFrame): DataFrame = {
    require(idCol != "text_kept" && textCol != "text_kept",
      "rename the id/text columns apart from the strip tier's text_kept")
    docs.join(stripped.select(col(idCol), col("text_kept")), Seq(idCol), "left")
      .withColumn(textCol,
        when(col("text_kept").isNotNull, col("text_kept"))
          .otherwise(col(textCol)))
      .drop("text_kept")
  }

  /** Stages 4–5 (Gopher quality rules + language id), shared by the
    * batch pipeline and the streaming ingest gate — ONE narrow map over
    * the survivors (the rules are pure expressions via
    * [[TextAnalysis.gopherRules]]; a join back against a flags
    * projection would double the whole upstream subtree). Null-text
    * rows are dropped, matching the flags operator's contract. */
  private[graft] def qualityAndLang(dc: DataFrame, idCol: String,
      textCol: String, cfg: Config): DataFrame = {
    val (nW, rules) = TextAnalysis.gopherRules(col(textCol),
      minWords = cfg.minWords, maxWords = cfg.maxWords,
      minStopwords = cfg.minStopwords)
    val keep = rules.map(_._2).reduce(_ && _)
    val out = dc.filter(col(textCol).isNotNull && keep)
      .withColumn("n_words", nW.cast("long"))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
    val langed =
      if (cfg.dropUnknownLang) out.filter(col("lang_pred") =!= "und") else out
    cfg.qualityModel match {
      case Some(m) => // model tier: still one narrow map, no join
        require(idCol != "quality_prob" && textCol != "quality_prob",
          "rename the id/text columns apart from the appended quality_prob")
        langed
          .withColumn("quality_prob", QualityModel.scoreExpr(textCol, m))
          .filter(col("quality_prob") >= cfg.minQualityProb)
      case None => langed
    }
  }

  /** Arrival-vs-corpus curation — the ingest twin of [[curate]], run per
    * micro-batch by
    * [[graft.streaming.Streams.curateGateForEachBatch]]:
    *
    *   1. in-batch exact dedup (arrivals identical to a CORPUS doc are
    *      caught by stage 2 at jaccard 1.0);
    *   2. near-dup flagging against the PERSISTED corpus signature
    *      artifact ([[graft.streaming.Streams.nearDupAgainstSignatures]]
    *      — the corpus text is never re-hashed per batch);
    *   3. benchmark decontamination via the broadcast gram gate
    *      ([[graft.streaming.Streams.decontaminateGate]]);
    *   4–5. Gopher quality + language id (narrow maps).
    *
    * Output contract matches [[curate]]: surviving arrival rows plus
    * `n_words` and `lang_pred`. */
  def curateArrivals(
      arrivals: DataFrame,
      idCol: String,
      textCol: String,
      refSigs: DataFrame,
      refTexts: DataFrame,
      bench: DataFrame,
      benchIdCol: String,
      benchTextCol: String,
      cfg: Config = Config(),
      refFps: Option[DataFrame] = None,
      refSegHashes: Option[DataFrame] = None): DataFrame = {
    require(idCol != "n_words" && idCol != "lang_pred" &&
      textCol != "n_words" && textCol != "lang_pred",
      "rename the id/text columns apart from the appended n_words/lang_pred")
    // tier -1 (optional): line-level boilerplate strip against the
    // persisted common-segment artifact
    // ([[Dedup.commonSegmentHashes]] of the corpus). Must run BEFORE
    // the fingerprint/signature tiers: those artifacts were built from
    // the corpus's (stripped) text, so arrivals have to be compared in
    // the same rewritten space — un-stripped arrivals would never
    // fingerprint-match a stripped corpus twin.
    val arrivalsNorm = normalized(arrivals, textCol, cfg)
    val arrivalsSeg = refSegHashes match {
      case Some(hashes) => withStrippedText(arrivalsNorm, idCol, textCol,
        graft.streaming.Streams.stripSegmentsGate(
          arrivalsNorm, idCol, textCol, hashes, cfg.stripSep))
      case None => arrivalsNorm
    }
    // surgical decontamination of the batch itself (the bench frame is
    // static and small; its gram set re-derives per batch). Same
    // rewrite materialization as the batch pipeline — per micro-batch,
    // so the checkpointed rows die with the batch.
    val arrivals0 = materializedRewrites(contamStripped(arrivalsSeg,
      idCol, textCol, bench, benchIdCol, benchTextCol, cfg), cfg)
    // tier 0 (optional): exact re-crawl rejection on the persisted
    // 8-byte fingerprint artifact. Changes NO survivor (an identical
    // normalized text has identical shingles, so the near-dup tier would
    // flag it at jaccard 1.0) — it exists so the shingle/minhash UDF
    // never runs on the re-crawled fraction, which in real crawls is a
    // large share of every batch.
    val base = refFps match {
      case Some(fps) =>
        arrivals0.join(
          graft.streaming.Streams.exactDupAgainstFingerprints(
              arrivals0, idCol, textCol, fps, refTexts)
            .select(col(idCol)).distinct(),
          Seq(idCol), "left_anti")
      case None => arrivals0
    }
    // same one-pass assembly as [[curate]]: the gate flag of one arrival
    // never depends on the other arrivals (it is a per-doc decision vs
    // STATIC corpus/bench state), so every drop set is computed from the
    // base batch and applied once — an arrival that is an in-batch exact
    // dup of a flagged arrival shares its text and therefore its flags
    val exactKeep = base.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val ndDrop = graft.streaming.Streams.nearDupAgainstSignatures(
        base, idCol, textCol, refSigs, refTexts,
        cfg.shingleSize, cfg.numHashes, cfg.bands, cfg.jaccardThreshold,
        cfg.maxBucket)
      .select(col(idCol)).distinct()
    val contamDrop = (cfg.deconBloomFpp match {
      case Some(fpp) => // bloom tier for benchmarks above the gate's
        // collect cap — identical output, batch-legal in foreachBatch.
        // NOTE: per-call bloom build; a long-running stream with a huge
        // benchmark should prefer Streams.decontaminateGateForEachBatch,
        // which builds and broadcasts the bloom once.
        TextAnalysis.ngramContainmentLarge(
          base.select(col(idCol).as("__corpus_id__"), col(textCol)),
          "__corpus_id__", textCol,
          bench.select(col(benchIdCol).as("__bench_id__"),
            col(benchTextCol).as(textCol)),
          "__bench_id__", textCol,
          cfg.contamNgram, cfg.contamThreshold, fpp)
          .select(col("__corpus_id__").as(idCol))
      case None => graft.streaming.Streams.decontaminateGate(
          base, idCol, textCol, bench, benchIdCol, benchTextCol,
          cfg.contamNgram, cfg.contamThreshold)
        .select(col(idCol))
    }).distinct()
    val survivors = base
      .join(exactKeep, Seq(idCol), "left_semi")
      .join(ndDrop, Seq(idCol), "left_anti")
      .join(contamDrop, Seq(idCol), "left_anti")
    val cleaned = qualityAndLang(survivors, idCol, textCol, cfg)
    // optional DSIR resampling — stream == batch parity with [[curate]]:
    // the keep decision is per-doc (stable id hash vs the model's
    // weight), so gating each arrival is EXACTLY the batch filter
    // restricted to the batch's rows. A stream has no corpus to derive
    // a sized pivot from — the fraction knob must be resolved to a
    // constant offline ([[Corpus.dsirPivotForKeep]]), or every batch
    // would re-derive a drifting pivot and break the parity.
    require(cfg.dsirKeepFraction.isEmpty,
      "dsirKeepFraction is a batch-corpus knob: resolve it to a pivot " +
        "with Corpus.dsirPivotForKeep and pass Config.dsir = " +
        "Some((model, pivot)) to the streaming gate")
    val resampled = cfg.dsir.fold(cleaned) { case (model, pivot) =>
      cleaned.filter(Corpus.dsirKeepExpr(col(idCol),
        Corpus.dsirWeightExpr(col(textCol), model), pivot))
    }
    // same FINAL output-scrub as [[curate]] (per-row rewrite, so
    // gating each arrival is exactly the batch rewrite restricted to
    // the batch's rows — stream == batch parity holds by construction)
    redactedOutput(resampled, textCol, cfg)
  }
}
