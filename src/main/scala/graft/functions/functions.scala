package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.functions._

import graft.core.Metrics

/** Column-level entry points for the engine's vector functions. */
object functions {

  /** Adds `outCol` = the L2-normalized copy of `vec` (zero vectors pass
    * through unchanged, matching [[Metrics.normalize]]). The norm goes
    * through its OWN intermediate column on purpose: HOF lambdas get no
    * common-subexpression elimination, so referencing an inline
    * `sqrt(aggregate(...))` from `transform()` re-evaluates the whole
    * aggregate per ELEMENT — d² work per row (observed 79s vs 6s on a
    * 100k×256-d build). One shared implementation for the cosine coder
    * training and the residual-PQ build/sync paths. */
  def withUnitNormalized(df: DataFrame, vec: Column, outCol: String): DataFrame = {
    val tmp = s"__${outCol}_norm__"
    val v = vec.cast("array<double>")
    df.withColumn(tmp, sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x)))
      .withColumn(outCol, when(col(tmp) === 0.0d, v)
        .otherwise(transform(v, x => x / col(tmp))))
      .drop(tmp)
  }

  /** Distance between two vector columns under `metric`
    * (cosine | dot | inner_product | l2 | euclidean — reference formulas,
    * see [[graft.core.Metrics]]). Returns double; smaller = nearer. */
  def vector_distance(u: Column, v: Column, metric: String): Column =
    GraftShims.column(
      VectorDistance(GraftShims.expression(u), GraftShims.expression(v),
        Metrics.canonical(metric)))

  /** A vector literal usable as the `v` side of [[vector_distance]]. */
  def vector_lit(target: Seq[Double]): Column = {
    typedLit(target)
  }

  def vector_lit_f(target: Seq[Float]): Column = typedLit(target)

  /** Late-interaction (ColBERT) MaxSim "distance" between a multi-vector
    * document column and a multi-vector query: −Σ_q max_d sim(q, d),
    * `metric` ∈ dot | cosine (see [[MaxSim]]). Smaller = nearer. */
  def maxsim(docTokens: Column, queryTokens: Column, metric: String): Column =
    GraftShims.column(
      MaxSim(GraftShims.expression(docTokens), GraftShims.expression(queryTokens),
        metric))

  /** Jaro-Winkler similarity in [0, 1] between two string columns
    * ([[JaroWinkler]] — codegen'd; DuckDB-parity semantics). */
  def jaro_winkler(a: Column, b: Column): Column =
    GraftShims.column(
      JaroWinkler(GraftShims.expression(a), GraftShims.expression(b)))

  /** [[jaro_winkler]] with the kernel length early-out: exact value
    * whenever ≥ `minSim`, else 0.0 — the filter companion for all-pairs
    * paths ([[JaroWinklerMin]]; internal, not SQL-registered). */
  def jaro_winkler_min(a: Column, b: Column, minSim: Double): Column =
    GraftShims.column(
      JaroWinklerMin(GraftShims.expression(a), GraftShims.expression(b),
        minSim))

  /** Merge-pass dot product of two term-sorted sparse vectors
    * (array<struct<term, u>>) — [[SparseDot]], codegen'd; ascending-term
    * accumulation order (the oracle-mirrorable arithmetic). */
  def sparse_dot(a: Column, b: Column): Column =
    GraftShims.column(
      SparseDot(GraftShims.expression(a), GraftShims.expression(b)))

  /** RFC 3986 percent-encoding canonicalization ([[PctNormalize]] —
    * codegen'd single-pass kernel, bit-exact to the legacy replace
    * chain; internal to [[graft.ext.Web.urlNormalize]]). */
  def pct_normalize(s: Column): Column =
    GraftShims.column(PctNormalize(GraftShims.expression(s)))

  /** Tracker-param filter for a URL query string ([[StripTrackerParams]]
    * — codegen'd; bit-exact to the HOF lambda it replaced; internal to
    * [[graft.ext.Web.urlNormalize]]). */
  def strip_trackers(q: Column): Column =
    GraftShims.column(StripTrackerParams(GraftShims.expression(q)))

  /** DSIR document weight under a trained model ([[DsirWeight]] —
    * codegen'd; bit-exact to the HOF fold it replaced; internal to
    * [[graft.ext.Corpus.dsirWeightExpr]]). */
  def dsir_weight(text: Column, logRatio: Seq[Double],
      buckets: Int): Column =
    GraftShims.column(DsirWeight(GraftShims.expression(text), logRatio,
      buckets))

  /** DSIR uni+bigram bucket ids for model fitting ([[DsirBuckets]] —
    * codegen'd; same hash and order as the exploded-gram chain;
    * internal to [[graft.ext.Corpus.dsirTrain]]). */
  def dsir_buckets(text: Column, buckets: Int): Column =
    GraftShims.column(DsirBuckets(GraftShims.expression(text), buckets))

  /** MinHash signature ([[MinhashSig]] — codegen'd; bit-exact to
    * [[graft.ext.Dedup.minhashUdf]], which stays as the differential
    * twin; internal to the minhash dedup/gate operators). */
  def minhash_sig(text: Column, numHashes: Int, shingleSize: Int): Column =
    GraftShims.column(MinhashSig(GraftShims.expression(text), numHashes,
      shingleSize))

  /** Card detection + Luhn + redaction in one pass ([[CardRedact]] —
    * codegen'd; struct<redacted, n_candidates, n_valid>; bit-exact to
    * the regexp_extract_all + HOF chain it replaced, which stays as
    * the differential twin in [[graft.ext.Corpus.cardRedactedExpr]]). */
  def card_redact(text: Column): Column =
    GraftShims.column(CardRedact(GraftShims.expression(text)))

  /** [[card_redact]]'s redacted text only ([[CardRedactText]] —
    * codegen'd; the output-scrub hot path). */
  def card_redact_text(text: Column): Column =
    GraftShims.column(CardRedactText(GraftShims.expression(text)))

  /** A multi-vector (token-matrix) literal usable as the query side of
    * [[maxsim]]. */
  def tokens_lit(tokens: Seq[Seq[Double]]): Column = typedLit(tokens)

  /** Mean-pool a multi-vector (token-matrix) column to a single
    * array<double> — the coarse-stage representation for late-interaction
    * retrieval (persist it next to the tokens and index it with the IVF
    * tiers). Pure builtin HOFs, stays in codegen. */
  def pooled_tokens(tokens: Column): Column = {
    val toks = tokens.cast("array<array<double>>")
    aggregate(toks,
      transform(element_at(toks, 1), _ => lit(0.0d)),
      (acc, t) => zip_with(acc, t, (a, b) => a + b),
      acc => transform(acc, x => x / size(toks)))
  }
}
