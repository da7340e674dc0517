package graft.coder

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Metrics

/** Training configuration — field-for-field the reference's `Config`
  * (`/root/reference/src/fenix/io/coder/coder.py:14-21` /
  * `tests/test_flight.py:72-78`), plus Spark-side knobs. */
case class CoderConfig(
    metric: String = "l2",
    codebookSize: Int = 8,
    numCodebooks: Int = 2,
    batchSize: Int = 2560,
    numEpochs: Int = 5,
    seed: Long = 42L,
    /** Bounds the driver-orchestrated Lloyd steps per epoch so training cost
      * is independent of corpus size (each step samples its mini-batches). */
    maxStepsPerEpoch: Int = 25) {
  require(codebookSize >= 1 && numCodebooks >= 1)
  /** Guard the k^n cell-space blow-up (SURVEY §7 hard part (b)). */
  def numCells: Long = {
    val cells = math.pow(codebookSize.toDouble, numCodebooks.toDouble)
    require(cells <= 1e6,
      s"codebook_size^num_codebooks = $cells cells exceeds the 1e6 cap")
    cells.toLong
  }
}

/** A trained multi-codebook quantizer.
  *
  * Capability parity with the reference `Coding`
  * (`/root/reference/src/fenix/io/coder/coder.py:24-35`): `numCodebooks`
  * independent codebooks of `codebookSize` centroids each; a vector's cell
  * id is the mixed-radix number of its per-codebook nearest-centroid
  * indices, codebook 0 most significant (`coder.py:171-181`).
  */
case class Coding(centroids: Array[Array[Array[Double]]], config: CoderConfig) {
  def n: Int = centroids.length
  def k: Int = centroids(0).length
  def dim: Int = centroids(0)(0).length
  def numCells: Long = config.numCells

  private def nearest(codebook: Int, v: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue; var i = 0
    while (i < k) {
      val d = Metrics.dist(centroids(codebook)(i), v, config.metric)
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** Cell id of a vector: Σ_j digit_j · k^(n−1−j) (mirrors `coder.py:87-89`,
    * the k=1 path of the coder UDF). */
  def assign(v: Array[Double]): Long = {
    var cell = 0L; var j = 0
    while (j < n) { cell = cell * k + nearest(j, v); j += 1 }
    cell
  }

  /** The reference coder-UDF's full signature (`coder.py:83-89`):
    * the `p` nearest cells for one vector (k=1 is [[assign]]). */
  def assignTopP(v: Array[Double], p: Int): Array[Long] = rankCells(v, p)

  /** A full-dim anchor point for a cell: the mean of the cell's n
    * codebook centroids. Used by residual PQ (IVFADC, Jégou et al. 2011
    * §III) — l2 in residual space is EXACT for any fixed per-cell anchor
    * (||(q−a)−(x−a)|| = ||q−x||), and the centroid mean sits near the
    * cell's data mean, which is what gives the residual codebooks their
    * resolution. */
  def anchor(cell: Long): Array[Double] = {
    val out = new Array[Double](dim)
    var rem = cell; var j = n - 1
    while (j >= 0) {
      val c = centroids(j)((rem % k).toInt); rem /= k
      var t = 0
      while (t < dim) { out(t) += c(t); t += 1 }
      j -= 1
    }
    var t = 0
    while (t < dim) { out(t) /= n; t += 1 }
    out
  }

  /** Rank all k^n cells by additive score Σ_j d(target, centroid[j][digit_j])
    * and return the `probes` nearest cell ids ascending by score — the IVF
    * probe list (`coder.py:143-194`). Driver-side: k^n is capped small. */
  def rankCells(target: Array[Double], probes: Int): Array[Long] = {
    val cells = numCells.toInt
    // n×k distance table
    val d = Array.tabulate(n, k)((j, i) => Metrics.dist(centroids(j)(i), target, config.metric))
    val scores = new Array[Double](cells)
    var c = 0
    while (c < cells) {
      var rem = c; var score = 0.0; var j = n - 1
      while (j >= 0) { score += d(j)(rem % k); rem /= k; j -= 1 }
      scores(c) = score
      c += 1
    }
    (0 until cells).sortBy(c => (scores(c), c)).take(math.min(probes, cells)).map(_.toLong).toArray
  }
}

/** Element-wise vector sum over array<double> columns — the one typed UDAF
  * the engine needs (centroid re-averaging, SURVEY §2.7). */
object VecSumAgg extends Aggregator[Array[Double], Array[Double], Array[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], a: Array[Double]): Array[Double] =
    if (a == null) b
    else if (b.isEmpty) a.clone()
    else { var i = 0; while (i < b.length) { b(i) += a(i); i += 1 }; b }
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2 else if (b2.isEmpty) b1
    else { var i = 0; while (i < b1.length) { b1(i) += b2(i); i += 1 }; b1 }
  override def finish(r: Array[Double]): Array[Double] = r
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Element-wise vector reduce under an associative binary op — the shared
  * shape of the per-dimension min/max aggs the SQ8 build needs (one
  * map-side-combined pass; only `parts × dim` doubles ever shuffle).
  * Ragged inputs fail loudly: a silent truncation would mis-fit the
  * per-dimension affine params. */
sealed abstract class VecReduceAgg(op: (Double, Double) => Double)
    extends Aggregator[Array[Double], Array[Double], Array[Double]] {
  private def combine(b: Array[Double], a: Array[Double]): Array[Double] =
    if (a == null) b
    else if (b.isEmpty) a.clone()
    else {
      require(a.length == b.length,
        s"ragged vectors in per-dimension agg: ${a.length} vs ${b.length} dims")
      var i = 0; while (i < b.length) { b(i) = op(b(i), a(i)); i += 1 }; b
    }
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], a: Array[Double]): Array[Double] = combine(b, a)
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = combine(b1, b2)
  override def finish(r: Array[Double]): Array[Double] = r
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Per-dimension minimum over array<double> rows. */
object VecMinAgg extends VecReduceAgg(math.min)

/** Per-dimension maximum over array<double> rows. */
object VecMaxAgg extends VecReduceAgg(math.max)

/** Mini-batch multi-codebook k-means, Spark-first.
  *
  * Semantics mirror the reference trainer
  * (`/root/reference/src/fenix/io/coder/coder.py:94-127`):
  *   - init = k·n random corpus rows viewed as (n,k,d) centroids;
  *   - each step is one Lloyd update on a fresh random mini-batch, each
  *     codebook trained on a disjoint random slice (here: a uniform random
  *     codebook tag per sampled row);
  *   - the new centroid is the mean of its assigned points *including the
  *     old centroid* (torch `index_reduce(include_self=True)` ⇒
  *     (Σ points + old) / (count + 1)), so empty cells stay put;
  *   - cosine metric ⇒ inputs are L2-normalized and centroids re-normalized
  *     after every update (`coder.py:57-64`).
  *
  * Execution shape for scale: the corpus is only ever *sampled* (never
  * collected); assignment + partial aggregation run on executors via a
  * codegen'd groupBy over (codebook, cell) — at most n·k rows reach the
  * driver per step, so a 1000-executor corpus trains with the same driver
  * memory as local[32].
  */
object Coder {

  private def vecSum = udaf(VecSumAgg)

  def train(df: DataFrame, vecCol: String, config: CoderConfig): Coding = {
    config.numCells // validate cap early
    val spark = df.sparkSession
    import spark.implicits._
    val k = config.codebookSize; val n = config.numCodebooks
    val cosine = Metrics.canonical(config.metric) == "cosine"

    val vecsRaw = df.select(col(vecCol).cast("array<double>").as("v")).filter(col("v").isNotNull)
    val vecs = if (cosine) {
      // L2-normalize once at the source (reference normalizes every
      // batch); shared helper keeps the norm out of the HOF lambda
      // (no CSE there ⇒ d² work per row) and zero vectors finite.
      graft.functions.functions.withUnitNormalized(vecsRaw, col("v"), "vn")
        .select(col("vn").as("v"))
    } else vecsRaw

    val total = vecs.count()
    require(total >= k.toLong * n, s"need at least ${k * n} rows to init $n×$k centroids")

    val stepsPerEpoch = math.max(1, math.min(config.maxStepsPerEpoch,
      (total / (config.batchSize.toLong * n)).toInt))

    // Scale design: training touches at most numEpochs·steps·batch·n rows,
    // so sample that bound ONCE (a single corpus pass) and cache it —
    // every Lloyd step then iterates over the small in-memory training set
    // instead of re-scanning a (potentially 100 TB) corpus per step.
    val wantRows = config.numEpochs.toLong * stepsPerEpoch * config.batchSize * n
    val sampled =
      if (wantRows < total) {
        // oversample slightly so the bound is met w.h.p.
        val frac = math.min(1.0, wantRows * 1.2 / total.toDouble)
        vecs.sample(withReplacement = false, frac, config.seed)
      } else vecs
    // Size partitions to the SAMPLE, not the corpus: ~100k vectors per
    // partition keeps per-step jobs at a handful of tasks even when the
    // source is thousands of parquet splits.
    val totalSteps = config.numEpochs * stepsPerEpoch
    // The step loop runs on a plain RDD hash-partitioned BY MINI-BATCH:
    // each cached row is assigned its step once, so a step's job reads
    // exactly its own partition (PartitionPruningRDD) instead of
    // re-scanning the whole sample to draw 1/totalSteps of it. Per-step
    // work is then one narrow no-shuffle job (partition-local assignment
    // + n·k·d partial sums, ~32 KB to the driver). Unlike the reference
    // (which revisits every row each epoch), the budget-bounded sample is
    // consumed once across all steps — same per-step batch statistics,
    // one corpus pass total.
    val seed0 = config.seed
    val nSteps = totalSteps
    val trainSet = sampled.as[Array[Double]].rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val rnd = new java.util.Random(seed0 ^ (pid.toLong * 0x9E3779B97F4A7C15L))
        it.map(v => (rnd.nextInt(nSteps), v))
      }
      .partitionBy(new org.apache.spark.HashPartitioner(nSteps) {
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    trainSet.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainTotal = trainSet.count()
    require(trainTotal >= k.toLong * n, s"training sample too small: $trainTotal")

    // Init: k·n distinct random rows → (n, k, d) (coder.py:98-104)
    var init = trainSet.takeSample(withReplacement = false, k * n, config.seed)
    if (init.length < k * n) init = trainSet.take(k * n)
    val centroids = Array.tabulate(n, k)((j, i) => init(j * k + i).clone())

    val dim = centroids(0)(0).length
    val metric = Metrics.canonical(config.metric)

    var step = 0
    for (_ <- 0 until config.numEpochs; _ <- 0 until stepsPerEpoch) {
      val stepSeed = config.seed + 7919L * (step + 1)
      val current = centroids.map(_.map(_.clone()))
      val stepId = step
      val (sums, counts) = org.apache.spark.rdd.PartitionPruningRDD
        .create(trainSet, _ == stepId)
        .mapPartitionsWithIndex { (pid, it) =>
          val rnd = new java.util.Random(stepSeed ^ (pid.toLong * 0x9E3779B97F4A7C15L))
          val s = Array.ofDim[Double](n, k, dim)
          val c = Array.ofDim[Long](n, k)
          it.foreach { v =>
            val cb = rnd.nextInt(n)
            var best = 0; var bestD = Double.MaxValue; var i = 0
            while (i < k) {
              val d = Metrics.dist(current(cb)(i), v, metric)
              if (d < bestD) { bestD = d; best = i }
              i += 1
            }
            val tgt = s(cb)(best); var t = 0
            while (t < dim) { tgt(t) += v(t); t += 1 }
            c(cb)(best) += 1
          }
          Iterator.single((s, c))
        }
        .treeReduce { case ((s1, c1), (s2, c2)) =>
          for (j <- 0 until n; i <- 0 until k) {
            val a = s1(j)(i); val b = s2(j)(i); var t = 0
            while (t < dim) { a(t) += b(t); t += 1 }
            c1(j)(i) += c2(j)(i)
          }
          (s1, c1)
        }
      for (j <- 0 until n; i <- 0 until k if counts(j)(i) > 0) {
        val old = centroids(j)(i); val sum = sums(j)(i); val cnt = counts(j)(i)
        var t = 0
        while (t < dim) { old(t) = (sum(t) + old(t)) / (cnt + 1.0); t += 1 }
        if (cosine) {
          val norm = Metrics.normalize(old)
          System.arraycopy(norm, 0, old, 0, old.length)
        }
      }
      step += 1
    }
    trainSet.unpersist(blocking = false)
    Coding(centroids, config)
  }
}
