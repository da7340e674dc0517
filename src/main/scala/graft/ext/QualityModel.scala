package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the model-based filtering step
  * of modern web-corpus pipelines (CCNet's LM filter, FineWeb-Edu's
  * classifier distillation): learn a smooth quality probability from
  * labeled examples (typically weak labels from a rule set like
  * [[TextAnalysis.gopherQualityFlags]], distilling the hard rules into a
  * rankable score), then score the whole corpus in one narrow map.
  *
  * Model: L2-regularized logistic regression over the three bounded text
  * features of [[TextAnalysis.qualityComponents]] (capped length,
  * punctuation ratio, stopword ratio) plus a bias. Training is IRLS
  * (Newton steps): each iteration is ONE map-side-combined aggregation
  * of the 4×4 weighted Gram matrix + 4-vector gradient (14 double sums,
  * a bounded driver collect), and the 4×4 solve happens driver-side —
  * `iters` ≈ 8 aggregations total regardless of corpus size, the same
  * driver-bounded training discipline as the k-means coder and PCA.
  * Scoring is pure codegen'd column arithmetic; the corpus never
  * shuffles in either phase.
  *
  * Determinism/mirror contract (the exported-model pattern of
  * `embed_pca`/`text_perplexity`): trained weights export as JSON; the
  * SQL oracle replays SCORING only — identical feature expressions (the
  * `text_quality` mirror, already bit-matched), left-associative
  * z = ((w0 + w1·f1) + w2·f2) + w3·f3, prob = 1/(1 + exp(−z)) rounded
  * to 6 decimals (absorbs cross-engine `exp` ulps — the BM25
  * discipline). */
object QualityModel {

  /** Trained logistic model: weights = [bias, w_len, w_punct, w_stop]. */
  case class Logistic(weights: Array[Double]) {
    require(weights.length == 4, s"expected 4 weights, got ${weights.length}")
    def toJson: String =
      weights.mkString("{\"weights\": [", ", ", "]}")
  }

  def fromJson(json: String): Logistic = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val arr = node.get("weights")
    require(arr != null && arr.isArray && arr.size() == 4,
      s"malformed quality model: $json")
    Logistic(Array.tabulate(4)(arr.get(_).asDouble()))
  }

  /** The three bounded features, expression-for-expression identical to
    * [[TextAnalysis.qualityComponents]] (so the existing `text_quality`
    * SQL mirror covers them): capped length least(n_tokens/64, 1),
    * punctuation ratio, stopword ratio. Null/empty text → (0, 0, 0). */
  private[graft] def featureCols(textCol: String): Seq[Column] = {
    val t = trim(col(textCol))
    val nChars = length(t)
    val nTokens = TextAnalysis.tokenCount(t)
    val nPunct = length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val tokens = split(t, "\\s+")
    val nStop = size(filter(tokens, x => x.isin(stopwords.map(lit(_)): _*)))
    Seq(
      least(nTokens.cast("double") / 64.0, lit(1.0)),
      when(nChars > 0, nPunct.cast("double") / nChars).otherwise(0.0),
      when(nTokens > 0, nStop.cast("double") / nTokens).otherwise(0.0))
  }

  /** Labeled (textCol, __label__) training frame: explicit `labelCol`
    * when given, else weak labels from the Gopher rule conjunction
    * (rule distillation — the no-labeled-data default). ONE shared
    * construction for the engine verb, the wire route and ad-hoc
    * callers, so named and stateless training can never drift. The
    * weak path must drop null text (the rules need text); explicit
    * labels keep every labeled row (null text = all-zero features,
    * still a valid example). */
  def labeledFrame(df: DataFrame, textCol: String,
      labelCol: Option[String]): DataFrame = labelCol match {
    case Some(lc) => df.select(col(textCol), col(lc).as("__label__"))
    case None =>
      val (_, rules) = TextAnalysis.gopherRules(col(textCol))
      df.filter(col(textCol).isNotNull)
        .select(col(textCol), rules.map(_._2).reduce(_ && _).as("__label__"))
  }

  /** Train by IRLS. `labelCol` must be boolean/0-1 castable to double.
    * `l2` regularizes the Newton system (and handles separable data);
    * the bias is regularized too — acceptable at these magnitudes and
    * keeps the system uniformly conditioned. */
  def train(df: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, l2: Double = 1e-3): Logistic = {
    require(iters >= 1, s"train: iters must be >= 1, got $iters")
    require(l2 > 0, s"train: l2 must be > 0, got $l2")
    val fs = featureCols(textCol)
    // persist (not localCheckpoint): unpersist below actually releases
    // the blocks when training ends — a localCheckpoint would pin them
    // until RDD GC, which in a long-lived server is unbounded
    val base = df.select(
      (col(labelCol).cast("double").as("y") +:
        fs.zipWithIndex.map { case (f, i) => f.as(s"f${i + 1}") }): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    require(n > 0, "train: empty training frame")
    val w = Array.fill(4)(0.0)
    val feats: Seq[Column] = lit(1.0) +: (1 to 3).map(i => col(s"f$i"))
    for (_ <- 1 to iters) {
      val z = feats.zipWithIndex.tail.foldLeft(lit(w(0)): Column) {
        case (acc, (f, i)) => acc + lit(w(i)) * f
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val r = p * (lit(1.0) - p) // IRLS weight
      // upper triangle of X'RX (10 sums) + X'(y − p) (4 sums)
      val gram = for { i <- 0 until 4; j <- i until 4 }
        yield sum(r * feats(i) * feats(j)).as(s"g${i}_$j")
      val grad = (0 until 4).map(i =>
        sum((col("y") - p) * feats(i)).as(s"d$i"))
      val row = base.agg((gram ++ grad).head, (gram ++ grad).tail: _*)
        .collect()(0)
      val a = Array.ofDim[Double](4, 4)
      var idx = 0
      for { i <- 0 until 4; j <- i until 4 } {
        a(i)(j) = row.getDouble(idx); a(j)(i) = row.getDouble(idx); idx += 1
      }
      val b = Array.tabulate(4)(i => row.getDouble(10 + i) - l2 * n * w(i))
      for (i <- 0 until 4) a(i)(i) += l2 * n
      // solve a · delta = b (Gaussian elimination, partial pivot)
      val m = Array.tabulate(4)(i => a(i) :+ b(i))
      for (c <- 0 until 4) {
        val piv = (c until 4).maxBy(r2 => math.abs(m(r2)(c)))
        val tmp = m(c); m(c) = m(piv); m(piv) = tmp
        require(math.abs(m(c)(c)) > 1e-12, "train: singular IRLS system")
        for (r2 <- c + 1 until 4) {
          val fct = m(r2)(c) / m(c)(c)
          for (k <- c to 4) m(r2)(k) -= fct * m(c)(k)
        }
      }
      val delta = Array.fill(4)(0.0)
      for (i <- 3 to 0 by -1) {
        var s = m(i)(4)
        for (k <- i + 1 until 4) s -= m(i)(k) * delta(k)
        delta(i) = s / m(i)(i)
      }
      for (i <- 0 until 4) w(i) += delta(i)
    }
    base.unpersist(blocking = false)
    Logistic(w)
  }

  /** The scoring expression alone — round(σ(w·x), 6) over `textCol` —
    * so wider plans (e.g. [[Curate]]'s one-pass assembly) can append the
    * score as a narrow column instead of joining a scored projection. */
  def scoreExpr(textCol: String, model: Logistic): Column = {
    val fs = featureCols(textCol)
    val z = fs.zipWithIndex.foldLeft(lit(model.weights(0)): Column) {
      case (acc, (f, i)) => acc + lit(model.weights(i + 1)) * f
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** Score every document: (idCol, out = round(σ(w·x), 6)). One narrow
    * codegen map; weights are literals in the plan. */
  def score(df: DataFrame, idCol: String, textCol: String, model: Logistic,
      out: String = "quality_prob"): DataFrame =
    df.select(col(idCol), scoreExpr(textCol, model).as(out))
}
