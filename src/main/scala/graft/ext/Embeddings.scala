package graft.ext

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction: PCA / whitening.
  *
  * The standard pre-index transform for large embedding corpora (3072-d
  * API embeddings → 256-d cuts storage and scan cost ~12× before the
  * IVF/PQ/SQ8 tiers even start; whitening additionally equalizes
  * per-direction variance, which helps the product quantizer's subspace
  * split the same way OPQ's rotation does). Beyond the reference surface
  * (its coder consumes raw vectors only — `/root/reference/src/fenix/io/
  * coder/coder.py:94-127`).
  *
  * Training is one distributed pass: per-partition (n, Σx, upper
  * triangle of Σxxᵀ) accumulated imperatively (the d×d gram update is
  * genuine per-partition loop work — the one place `mapPartitions` beats
  * any declarative form), combined on the driver IN PARTITION ORDER so
  * repeated runs over the same files give bit-identical covariance, then
  * a d×d symmetric eigendecomposition (breeze, ships with Spark) —
  * O(d³) driver work, microseconds at embedding dims. Eigenvector sign
  * is normalized (largest-|component| positive) so the persisted model
  * is stable across BLAS implementations.
  *
  * Projection is the codegen'd [[graft.functions.PcaProject]] — one
  * narrow map, no shuffle; whitening (component rows scaled by
  * 1/√(λ+eps)) is folded into the stored components at train time.
  */
object Embeddings {

  /** Persisted PCA model: projection = components · (x − mean), row r =
    * component r (already whitened when `whitened`). */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      eigenvalues: Array[Double], whitened: Boolean) {
    def dim: Int = mean.length
    def k: Int = components.length
    def flat: IndexedSeq[Double] = components.flatten.toIndexedSeq

    def toJson: String = {
      def arr(a: Array[Double]) = a.map(_.toString).mkString("[", ",", "]")
      s"""{"whitened":$whitened,"mean":${arr(mean)},""" +
        s""""eigenvalues":${arr(eigenvalues)},""" +
        s""""components":${components.map(arr).mkString("[", ",", "]")}}"""
    }
  }

  def fromJson(json: String): PcaModel = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def arr(n: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val out = new Array[Double](n.size())
      var i = 0
      while (i < out.length) { out(i) = n.get(i).asDouble(); i += 1 }
      out
    }
    val comps = node.get("components")
    PcaModel(
      arr(node.get("mean")),
      Array.tabulate(comps.size())(r => arr(comps.get(r))),
      arr(node.get("eigenvalues")),
      node.get("whitened").asBoolean())
  }

  /** Fit a k-component PCA (optionally whitened) on up to `maxRows`
    * vectors (a deterministic `limit`, NOT an RNG sample — training must
    * be reproducible for the oracle pipeline; covariance over ≥100k rows
    * is insensitive to which rows at these dims). */
  def pcaTrain(df: DataFrame, vecCol: String, k: Int, whiten: Boolean = false,
      maxRows: Long = 200000L, eps: Double = 1e-9): PcaModel = {
    require(k > 0, "pcaTrain: k must be > 0")
    import df.sparkSession.implicits._
    // limit (deterministic) then round-robin repartition: the global limit
    // funnels through one partition, which would serialize the O(d²) gram
    // accumulation; redistributing first keeps the heavy loop parallel
    // (round-robin placement is deterministic for a fixed input order)
    val vecs = df.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull).limit(maxRows.toInt)
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .as[Seq[Double]]
    val parts: Array[(Long, Array[Double], Array[Double])] =
      vecs.mapPartitions { it =>
        var n = 0L
        var sum: Array[Double] = null
        var gram: Array[Double] = null // upper triangle, row-major packed
        it.foreach { v =>
          val d = v.length
          if (sum == null) { sum = new Array(d); gram = new Array(d * (d + 1) / 2) }
          require(v.length == sum.length,
            s"pcaTrain: ragged vectors (${v.length} vs ${sum.length})")
          n += 1
          var i = 0
          var p = 0
          while (i < d) {
            val xi = v(i)
            sum(i) += xi
            var j = i
            while (j < d) { gram(p) += xi * v(j); j += 1; p += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, sum, gram))
      }.collect()
    require(parts.nonEmpty, s"pcaTrain: no non-null vectors in $vecCol")
    val d = parts.head._2.length
    require(k <= d, s"pcaTrain: k=$k exceeds dim $d")
    // combine in partition order — deterministic for a fixed file layout
    val n = parts.map(_._1).sum.toDouble
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    parts.foreach { case (_, s, g) =>
      var i = 0
      while (i < d) { sum(i) += s(i); i += 1 }
      var p = 0
      while (p < gram.length) { gram(p) += g(p); p += 1 }
    }
    val mean = sum.map(_ / n)
    val cov = DenseMatrix.zeros[Double](d, d)
    var i = 0
    var p = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gram(p) / n - mean(i) * mean(j)
        cov(i, j) = c; cov(j, i) = c
        j += 1; p += 1
      }
      i += 1
    }
    val es = eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(r => -es.eigenvalues(r)).take(k)
    val components = order.toArray.map { r =>
      val v = Array.tabulate(d)(i => es.eigenvectors(i, r))
      // sign convention: largest-|component| positive (eigenvector sign is
      // arbitrary; pin it so persisted models are BLAS-independent)
      val m = v.indices.maxBy(i => math.abs(v(i)))
      val signed = if (v(m) < 0) v.map(-_) else v
      if (whiten) {
        val s = 1.0 / math.sqrt(math.max(es.eigenvalues(r), 0.0) + eps)
        signed.map(_ * s)
      } else signed
    }
    PcaModel(mean, components,
      order.toArray.map(r => es.eigenvalues(r)), whiten)
  }

  /** Project `vecCol` onto the model's components (codegen'd; output
    * array<double> of length k). */
  def projectCol(vec: Column, model: PcaModel): Column =
    org.apache.spark.sql.GraftShims.column(graft.functions.PcaProject(
      org.apache.spark.sql.GraftShims.expression(vec),
      model.mean.toIndexedSeq, model.flat))

  def project(df: DataFrame, vecCol: String, model: PcaModel,
      out: String = "projection"): DataFrame =
    df.withColumn(out, projectCol(col(vecCol), model))
}
