package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * typed `Aggregator` — a mergeable frequency sketch for heavy-hitter
  * counting over keys too numerous to groupBy exactly. Deterministic
  * (fixed seeds), and mergeable across partitions, so it runs as a
  * map-side-combined aggregate with a w·d-long buffer regardless of key
  * cardinality — the reason to use it at 100 TB instead of an exact
  * groupBy whose state is O(distinct keys).
  *
  * Guarantee: estimate(k) ≥ true(k), and ≤ true(k) + εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
  */
case class CountMinSketch(width: Int, depth: Int) {
  def serializedSize: Int = width * depth
}

object CountMinAgg {
  /** Row-`row` bucket of a key: xorshift-style integer mix over
    * (key, row). Shared by the aggregator and the codegen probe
    * ([[graft.functions.CmsEstimate]] inlines the identical Java
    * arithmetic), so sketch build and probe agree bit-for-bit. */
  def bucket(key: Long, row: Int, width: Int): Int = {
    var h = key * 0x9E3779B97F4A7C15L + (row + 1) * 0xC2B2AE3D27D4EB4FL
    h ^= (h >>> 29); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 32)
    ((h & Long.MaxValue) % width).toInt
  }
}

class CountMinAgg(width: Int = 1024, depth: Int = 4)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private def bucket(key: Long, row: Int): Int =
    CountMinAgg.bucket(key, row, width)
  override def zero: Array[Long] = new Array[Long](width * depth)
  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var r = 0
    while (r < depth) { b(r * width + bucket(key, r)) += 1; r += 1 }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** Point-estimate a key's frequency from a finished sketch. */
  def estimate(sketch: Array[Long], key: Long): Long = {
    var min = Long.MaxValue; var r = 0
    while (r < depth) {
      val v = sketch(r * width + bucket(key, r))
      if (v < min) min = v
      r += 1
    }
    min
  }
}

/** K-minimum-values distinct-count sketch (Bar-Yossef et al., RANDOM
  * 2002): keep the k smallest DISTINCT 60-bit hashes of the key; the
  * k-th smallest, viewed as a uniform draw on [0, 2^60), estimates the
  * distinct count as (k−1)·2^60 / h_k. Mergeable (union = merge of the
  * min-sets), O(k) state regardless of cardinality, and — because the
  * hash is the md5-prefix `hashU60` the engine uses everywhere — fully
  * deterministic and mirrorable in an external SQL engine, unlike
  * HLL-family `approx_count_distinct` whose register layout is private.
  *
  * Buffer = sorted long array (≤ k). Insertion cost is O(log k) for the
  * common reject case (binary search against the current max); the
  * O(k) memcpy happens only on a new record-minimum, which occurs
  * O(k·log n) times over a stream of n keys.
  */
class KMinValuesAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  private def insert(b: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, h)
    if (idx >= 0) return b // already present (distinct-ness)
    val ins = -idx - 1
    if (b.length >= k && ins >= k) return b // not among the k smallest
    val n = math.min(b.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(b, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], h: Long): Array[Long] = insert(b, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var r = a; var i = 0
    while (i < b.length) { r = insert(r, b(i)); i += 1 }
    r
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Sketch-based approximate operators surfaced as DataFrame verbs. */
object Sketches {

  /** Estimate the number of distinct values of `keyCol` with a KMV
    * sketch: one map-side-combined aggregate whose state is k longs —
    * vs an exact count-distinct whose shuffle is O(distinct keys).
    * Output (one row): `n_kept` (≤ k), `kth_hash`, `est_distinct`.
    * When fewer than k distinct hashes exist the sketch IS the distinct
    * set and the estimate is exact. Deterministic: same data ⇒ same
    * answer regardless of partitioning (set-union merge).
    */
  def kmvDistinct(df: DataFrame, keyCol: String, k: Int = 256): DataFrame =
    kmvDistinctBy(df, keyCol, Nil, k)

  /** Per-group KMV distinct estimate — one k-long sketch per group
    * (groupCols), the windowed/segmented form of [[kmvDistinct]]: e.g.
    * distinct users per hour, distinct URLs per crawl batch. The same
    * mergeable aggregator runs unchanged in a Structured Streaming
    * aggregation (monitoring gate: a distinct-rate collapse in an
    * arriving crawl flags a stuck upstream). */
  def kmvDistinctBy(df: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    val kmv = udaf(new KMinValuesAgg(k))
    val gcols = groupCols.map(col)
    // (k−1)·2^60 is exactly representable in a double (k ≤ 2^52), so the
    // oracle's `(k-1) * pow(2, 60) / kth` evaluates the identical IEEE
    // division — the estimate hash-matches bit-for-bit.
    df.select((gcols :+ Corpus.hashU60(col(keyCol)).as("__kmv_h__")).toIndexedSeq: _*)
      .groupBy(gcols.toIndexedSeq: _*)
      .agg(kmv(col("__kmv_h__")).as("mins"))
      .select((gcols ++ Seq(
        size(col("mins")).cast("long").as("n_kept"),
        // guard the empty sketch (empty input frame): ANSI element_at
        // throws on index 0
        when(size(col("mins")) > 0,
          element_at(col("mins"), size(col("mins"))))
          .otherwise(lit(null).cast("long")).as("kth_hash"))).toIndexedSeq: _*)
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
            col("kth_hash").cast("double")))
  }

  /** Sketch-level set algebra over two KMV sketches on the same key
    * hash space (Beyer et al., SIGMOD 2007 — distinct-value estimation
    * under set operations): union cardinality from the merged k-min
    * set, Jaccard similarity as the overlap fraction INSIDE the merged
    * k-min set (an unbiased estimator, since the k union-minima are a
    * uniform coordinated sample of the union), and intersection
    * cardinality as `jaccard · union`. This is the join-size planner:
    * how many keys do two 100 TB tables share, and how big is their
    * key union — answered from two O(k) sketches instead of a dry-run
    * join. When the union has fewer than k distinct hashes the merged
    * set IS the union and every output is exact.
    *
    * Deterministic and bit-mirrorable like [[kmvDistinct]]: same
    * md5-prefix u60 hash, same IEEE estimate arithmetic — an external
    * engine replaying the formulas hash-matches.
    *
    * Scale shape: each side collapses map-side to ONE k-long sketch
    * row; the set algebra is array expressions over the broadcast
    * 1-row pair. No shuffle scales with row count.
    *
    * Output (one row): `union_kept` (≤ k), `union_kth`, `overlap`
    * (hashes present in BOTH sides among the union k-minima),
    * `est_union`, `jaccard_est`, `est_intersect`. */
  def kmvSetOps(a: DataFrame, aKeyCol: String, b: DataFrame,
      bKeyCol: String, k: Int = 256): DataFrame = {
    val kmv = udaf(new KMinValuesAgg(k))
    val sa = a.select(Corpus.hashU60(col(aKeyCol)).as("__h__"))
      .agg(kmv(col("__h__")).as("ma"))
    val sb = b.select(Corpus.hashU60(col(bKeyCol)).as("__h__"))
      .agg(kmv(col("__h__")).as("mb"))
    sa.crossJoin(broadcast(sb))
      .withColumn("ku",
        slice(array_sort(array_union(col("ma"), col("mb"))), 1, k))
      .withColumn("union_kept", size(col("ku")).cast("long"))
      // guard the empty union (both inputs empty): ANSI element_at
      // throws on index 0
      .withColumn("union_kth", when(size(col("ku")) > 0,
        element_at(col("ku"), size(col("ku"))))
        .otherwise(lit(null).cast("long")))
      .withColumn("overlap", size(filter(col("ku"),
        x => array_contains(col("ma"), x) && array_contains(col("mb"), x)))
        .cast("long"))
      .withColumn("est_union",
        when(col("union_kept") < k, col("union_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
            col("union_kth").cast("double")))
      .withColumn("jaccard_est",
        when(col("union_kept") > 0,
          col("overlap").cast("double") / col("union_kept").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("est_intersect", col("jaccard_est") * col("est_union"))
      .select("union_kept", "union_kth", "overlap", "est_union",
        "jaccard_est", "est_intersect")
  }

  /** Grid-resolution quantiles from a fixed-width histogram — the
    * mergeable quantile sketch: the groupBy-on-bin partial aggregation
    * IS the sketch (per-partition state = touched bins, merge = count
    * addition — associative, commutative, partitioning-invariant), so
    * one corpus pass yields every requested quantile with state bounded
    * by `maxBins`, not by row count or value cardinality.
    *
    * Semantics (inverted CDF at grid resolution): for each q, the
    * returned `bin` is the smallest bin whose cumulative count reaches
    * `rank = ⌈q·N⌉`, and `value = bin·binWidth` — the lower edge of the
    * bin containing the exact q-quantile, i.e. the exact quantile
    * rounded down to the grid. Every step (floor of one IEEE divide,
    * integer counts, one IEEE multiply) evaluates identically in an
    * external engine, so the output is bit-mirrorable — unlike
    * rank-error sketches (KLL/GK/t-digest) whose compaction order is
    * engine-private. NULLs are excluded (SQL aggregate convention).
    *
    * Scale shape: the only per-row work is the bin expression; the
    * cumulative window runs over the ≤ `maxBins` histogram rows
    * (single-task by construction — that's the bounded frame, checked
    * loudly), and the q-probe join is a broadcast over |qs| rows. A
    * `binWidth` too fine for the data's range fails the `maxBins`
    * guard rather than building a runaway histogram. */
  def histogramQuantiles(df: DataFrame, valueCol: String, binWidth: Double,
      qs: Seq[Double], maxBins: Long = 1000000L): DataFrame =
    quantilesFromBins(histogramBins(df, valueCol, binWidth), binWidth, qs,
      maxBins)

  /** The histogram HALF of [[histogramQuantiles]]: (bin, cnt) under a
    * fixed grid. This IS the mergeable sketch (per-partition state =
    * touched bins; merge = count addition), and — being a plain
    * groupBy aggregation — it runs UNCHANGED as a Structured Streaming
    * complete-mode aggregation: maintain the histogram over an arriving
    * stream, then feed any sink snapshot to [[quantilesFromBins]] for
    * the monitoring read (e.g. a p99-latency collapse gate). Streaming
    * state is bounded by the touched-bin count, not row count. */
  def histogramBins(df: DataFrame, valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    df.filter(col(valueCol).isNotNull)
      .select(floor(col(valueCol).cast("double") / binWidth).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
  }

  /** The quantile-extraction HALF of [[histogramQuantiles]]: inverted
    * CDF over a materialized (bin, cnt) histogram — from [[histogramBins]]
    * directly, a persisted histogram table, or a streaming aggregation's
    * sink snapshot. Bit-mirrorable like the composed form. */
  def quantilesFromBins(bins: DataFrame, binWidth: Double,
      qs: Seq[Double], maxBins: Long = 1000000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got ${qs.mkString(", ")}")
    val spark = bins.sparkSession
    import spark.implicits._
    val hist = bins.localCheckpoint(true) // read 3× below (cum, total, probe)
    val nBins = hist.count()
    require(nBins <= maxBins,
      s"histogramQuantiles: $nBins bins of width $binWidth (> maxBins=" +
        s"$maxBins) — widen binWidth for this value range")
    val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("cum", sum("cnt").over(w))
    val tot = hist.agg(sum("cnt").as("n"))
    val out = qs.toDF("q").crossJoin(broadcast(tot))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
      .join(cum, col("cum") >= col("rank"))
      .groupBy("q", "rank").agg(min("bin").as("bin"))
      .withColumn("value", col("bin") * binWidth)
      .select("q", "rank", "bin", "value")
    // The result is ≤ |qs| rows — materialize it NOW so the histogram
    // checkpoint can be freed deterministically instead of pinning
    // executor storage until GC (it leaked per call on the round-12
    // serving path). Values pass through Row untouched: bit-exact.
    val rows = out.collect().toSeq
    Graph.release(hist)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, out.schema)
  }

  /** Auto-ranged grid quantiles: [[histogramQuantiles]] with the bin
    * width DERIVED from the data — a real user asks for p99 of a column
    * whose range they don't know, and a hand-picked `binWidth` either
    * blows the bin guard or collapses the grid. One extra bounded
    * min/max aggregate pass derives
    * `width = (max − min) / targetBins` (or 1.0 when the column is
    * constant, where any grid is exact); the derived width is a data
    * value both engines compute with the same IEEE divide, so the
    * result stays bit-mirrorable. Resolution: the reported quantile is
    * the exact quantile rounded down to a grid of `targetBins` cells
    * over the observed range — rank error zero, value error
    * < range/targetBins. */
  def histogramQuantilesAuto(df: DataFrame, valueCol: String,
      qs: Seq[Double], targetBins: Int = 500,
      maxBins: Long = 1000000L): DataFrame = {
    require(targetBins >= 1 && targetBins <= maxBins,
      s"targetBins must be in [1, $maxBins], got $targetBins")
    val r = df.filter(col(valueCol).isNotNull)
      .agg(min(col(valueCol).cast("double")).as("mn"),
        max(col(valueCol).cast("double")).as("mx")).head()
    require(!r.isNullAt(0),
      s"histogramQuantilesAuto: '$valueCol' has no non-NULL values")
    val mn = r.getDouble(0); val mx = r.getDouble(1)
    val width = if (mx > mn) (mx - mn) / targetBins.toDouble else 1.0
    histogramQuantiles(df, valueCol, width, qs, maxBins)
  }

  /** Multi-column [[histogramQuantilesAuto]]: widths for ALL columns
    * derived in ONE bounded min/max aggregate pass (2k aggregate
    * expressions, one scan), then [[profileQuantiles]]'s single-scan
    * histogram. Columns with no non-NULL values fail loudly (a silent
    * skip would make the output schema depend on the data). */
  def profileQuantilesAuto(df: DataFrame, cols: Seq[String],
      qs: Seq[Double], targetBins: Int = 500,
      maxBins: Long = 1000000L): DataFrame = {
    require(cols.nonEmpty, "profileQuantilesAuto needs at least one column")
    require(targetBins >= 1 && targetBins * cols.length <= maxBins,
      s"targetBins·columns must be in [1, $maxBins], got " +
        s"$targetBins x ${cols.length}")
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val widths = cols.zipWithIndex.map { case (c, i) =>
      require(!r.isNullAt(2 * i),
        s"profileQuantilesAuto: '$c' has no non-NULL values")
      val mn = r.getDouble(2 * i); val mx = r.getDouble(2 * i + 1)
      c -> (if (mx > mn) (mx - mn) / targetBins.toDouble else 1.0)
    }
    profileQuantiles(df, widths, qs, maxBins)
  }

  /** Multi-column grid quantiles in ONE table scan — the profiling
    * companion to [[histogramQuantiles]]: each row contributes one
    * (col_name, bin) entry per profiled column via a single generate,
    * the combined histogram partial-aggregates map-side, and each
    * column's cumulative window runs over its own ≤ bins partition
    * (partitionBy col_name — never a global single task). Profiling k
    * columns costs ONE scan + one histogram shuffle, not k scans.
    *
    * Same bit-mirrorable semantics as [[histogramQuantiles]] (floor of
    * an IEEE divide, integer counts, one IEEE multiply per output row);
    * NULLs excluded per column independently. `widths` maps each
    * numeric column to its bin width; `maxBins` bounds the TOTAL
    * histogram across columns. */
  def profileQuantiles(df: DataFrame, widths: Seq[(String, Double)],
      qs: Seq[Double], maxBins: Long = 1000000L): DataFrame = {
    require(widths.nonEmpty, "profileQuantiles needs at least one column")
    require(widths.forall(_._2 > 0),
      s"bin widths must be positive, got ${widths.mkString(", ")}")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got ${qs.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val entries = widths.map { case (c, w) =>
      when(col(c).isNotNull, struct(lit(c).as("col_name"),
        floor(col(c).cast("double") / w).cast("long").as("bin")))
        .otherwise(lit(null))
    }
    val hist = df.select(explode(array(entries: _*)).as("e"))
      .filter(col("e").isNotNull)
      .select(col("e.col_name").as("col_name"), col("e.bin").as("bin"))
      .groupBy("col_name", "bin").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // read 3× below (cum, totals, probe)
    val nBins = hist.count()
    require(nBins <= maxBins,
      s"profileQuantiles: $nBins total bins (> maxBins=$maxBins) — " +
        "widen the bin widths for these value ranges")
    val wWin = org.apache.spark.sql.expressions.Window
      .partitionBy("col_name").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("cum", sum("cnt").over(wWin))
    val tot = hist.groupBy("col_name").agg(sum("cnt").as("n"))
    val wdf = widths.toDF("col_name", "bin_width")
    val out = qs.toDF("q").crossJoin(broadcast(tot))
      .withColumn("rank", ceil(col("q") * col("n")).cast("long"))
      .join(cum, Seq("col_name"))
      .filter(col("cum") >= col("rank"))
      .groupBy("col_name", "q", "rank").agg(min("bin").as("bin"))
      .join(broadcast(wdf), Seq("col_name"))
      .withColumn("value", col("bin") * col("bin_width"))
      .select("col_name", "q", "rank", "bin", "value")
    // ≤ |qs|·k rows — same materialize-then-release as
    // [[histogramQuantiles]]: frees the combined histogram checkpoint
    // deterministically instead of leaking it per call.
    val rows = out.collect().toSeq
    Graph.release(hist)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, out.schema)
  }

  /** Exact heavy hitters at unbounded key cardinality, in two bounded
    * passes: (1) a Count-Min sketch over the hashed keys — O(w·d) state,
    * map-side combined, one 256 KB driver collect; (2) broadcast the
    * sketch and re-scan, keeping only rows whose CMS estimate reaches
    * `minCount` (CMS never underestimates, so no true heavy hitter is
    * lost), then an EXACT groupBy-count over that candidate slice —
    * ≤ N/minCount true keys + εN false positives — and a final HAVING
    * that removes the false positives. Output = exactly the keys with
    * true count ≥ minCount, with exact counts: oracle-checkable against
    * a plain GROUP BY … HAVING, but the full-cardinality groupBy state
    * never materializes.
    */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long,
      width: Int = 8192, depth: Int = 4): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new CountMinAgg(width, depth)
    // NULL keys: hashU60(null) is null, which would crash the non-null
    // Long sketch pass (and a null-dropping estimate would break the
    // "equals GROUP BY … HAVING" contract, where NULL is a group). Fold
    // them onto a fixed sentinel hash instead: CMS estimates only ever
    // INFLATE under collision, so the null group still clears the
    // candidate filter whenever its true count does, and the final exact
    // groupBy (which keeps NULL as a group, same as SQL) restores
    // exactness.
    val keyed = df.select(col(keyCol),
      coalesce(Corpus.hashU60(col(keyCol)), lit(0L)).as("__hh_h__"))
    val sketch: Array[Long] =
      keyed.select(col("__hh_h__")).as[Long].select(agg.toColumn).head()
    // the probe is a codegen'd expression over the embedded sketch (no
    // per-row boxing on the full second scan; the sketch ships with the
    // plan references like CellAssign's centroids)
    val estimate = org.apache.spark.sql.GraftShims.column(
      graft.functions.CmsEstimate(
        org.apache.spark.sql.GraftShims.expression(col("__hh_h__")),
        sketch, width, depth))
    keyed.filter(estimate >= minCount)
      .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** Snapshot drift report: per-bin count comparison of `valueCol`
    * between two corpus versions under the [[histogramBins]] grid —
    * the distribution-shift gate a pipeline runs when a new crawl
    * snapshot replaces the old one (did the length/quality/score
    * distribution move?). Pure integer counts, so the report is
    * bit-exact across engines — no KL/PSI logarithms whose summation
    * order would diverge.
    *
    * Scale shape: each side is a map-side-combined groupBy down to its
    * touched-bin set (bounded by the grid, not row count); the
    * full-outer join runs over bins only. */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
      binWidth: Double): DataFrame =
    driftFromBins(histogramBins(a, valueCol, binWidth),
      histogramBins(b, valueCol, binWidth))

  /** The bins-level half of [[histogramDrift]]: per-bin comparison of
    * two already-materialized `(bin, cnt)` histograms — from
    * [[histogramBins]] directly, a persisted histogram artifact, or a
    * streaming aggregation's complete-mode snapshot (the shape
    * [[graft.streaming.Streams.driftMonitorForEachBatch]] feeds it).
    * Splitting here is what makes drift monitorable WITHOUT rescanning
    * the reference corpus per trigger: the reference side is binned
    * once and reused. */
  def driftFromBins(binsA: DataFrame, binsB: DataFrame): DataFrame = {
    val ha = binsA.select(col("bin"), col("cnt").as("cnt_a"))
    val hb = binsB.select(col("bin"), col("cnt").as("cnt_b"))
    // shuffle_hash: bins-sized sides, integer counts — full-outer hash
    // join beats sorting both histograms (guide §3.1)
    ha.join(hb.hint("shuffle_hash"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .withColumn("diff", col("cnt_a") - col("cnt_b"))
  }

  /** One-number drift gate over [[histogramDrift]]: total-variation
    * distance between the two binned distributions, in exact integer
    * per-mille — `TV = Σ|p_a − p_b| / 2` computed as
    * `⌊1000·Σ|cnt_a·n_b − cnt_b·n_a⌋ / (2·n_a·n_b)⌋` in arbitrary-
    * precision integers (cross-multiplied counts, never a float), so
    * an independent engine's HUGEINT arithmetic hash-matches it.
    * Returns one row `(n_a, n_b, bins, tv_permille)`; 0 = identical
    * binned distributions, 1000 = disjoint support. */
  def driftSummary(a: DataFrame, b: DataFrame, valueCol: String,
      binWidth: Double): DataFrame =
    driftSummaryFromBins(histogramBins(a, valueCol, binWidth),
      histogramBins(b, valueCol, binWidth))

  /** [[driftSummary]] over already-materialized `(bin, cnt)` histograms
    * — the form a streaming monitor calls per trigger against a static
    * reference histogram ([[driftFromBins]] note applies). */
  def driftSummaryFromBins(binsA: DataFrame, binsB: DataFrame): DataFrame = {
    val spark = binsA.sparkSession
    // the cross-multipliers need each side's total alongside every bin:
    // broadcast the 1-row totals over the bins frame, then one bounded
    // agg. decimal(38,0): cnt·n products overflow longs at trillion-row
    // corpora; 38 digits hold |cnt·n| ≤ 10^24 with room to sum.
    val base = driftFromBins(binsA, binsB)
      .localCheckpoint(true) // read twice (totals + agg); bins-sized
    val tot = base.agg(sum("cnt_a").cast("decimal(38,0)").as("na2"),
      sum("cnt_b").cast("decimal(38,0)").as("nb2"))
    val row = base.crossJoin(broadcast(tot))
      .agg(max(col("na2")).as("na"), max(col("nb2")).as("nb"),
        count(lit(1)).as("bins"),
        sum(abs(col("cnt_a").cast("decimal(38,0)") * col("nb2") -
          col("cnt_b").cast("decimal(38,0)") * col("na2"))).as("s"))
      .head()
    Graph.release(base)
    def dec(i: Int): BigInt =
      if (row.isNullAt(i)) BigInt(0) else BigInt(row.getDecimal(i).toBigInteger)
    val na = dec(0); val nb = dec(1)
    val bins = row.getLong(2)
    val s = dec(3)
    val denom = na * nb * 2
    val tv = if (denom == 0) 0L else ((s * 1000) / denom).toLong
    import spark.implicits._
    Seq((na.toLong, nb.toLong, bins, tv))
      .toDF("n_a", "n_b", "bins", "tv_permille")
  }
}
