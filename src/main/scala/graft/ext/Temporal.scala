package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively.
  *
  * As-of join (point-in-time correctness for feature lookups / event
  * enrichment): for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key. Spark has no ASOF JOIN, so
  * it is composed from built-ins with the standard union + windowed
  * last-value construction — one shuffle on (key), no range explosion,
  * skew-safe because state per key is a single carried row.
  *
  * Hot-key caveat (asofJoin and both resamples): the per-key ordered
  * window serializes each key into a single task — inherent to ASOF
  * semantics, which require a total time order within the key. A
  * pathological key holding a large fraction of all rows (one
  * instrument with 10^9 ticks) becomes one long-running task; the fix
  * at that point is a coarser key (e.g. key × day) with per-boundary
  * stitching, not a different join algorithm. For keys with the usual
  * heavy-tail skew this is a straggler, not an OOM: window carry state
  * is O(1) per row.
  */
object Temporal {

  /** As-of (backward) join.
    *
    * @param left     probe side (e.g. queries/labels at time `leftTs`)
    * @param right    reference side (e.g. state snapshots at `rightTs`)
    * @param key      equi-join key column (same name on both sides)
    * @param leftTs   left timestamp column name
    * @param rightTs  right timestamp column name
    * @param rightCols columns of `right` to carry (besides key/ts)
    *
    * Output: all left columns + carried right columns (null when no right
    * row precedes the left row).
    *
    * Plan shape: union the two sides tagged by origin, sort within
    * (key) by (ts, origin) via a window, propagate the last seen right
    * values with `last(_, ignoreNulls = true)`, keep left rows. One
    * shuffle on key; window state is O(1) per row.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val leftTagged = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__is_left__", lit(1))
      .select(Seq(col(key), col("__ts__"), col("__is_left__")) ++
        left.columns.filter(_ != key).map(c => col(c)) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rightTagged = right
      .withColumn("__ts__", col(rightTs))
      .withColumn("__is_left__", lit(0))
      .select(Seq(col(key), col("__ts__"), col("__is_left__")) ++
        left.columns.filter(_ != key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal ts => "<=" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts__").asc, col("__is_left__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(leftTagged.unionByName(rightTagged)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("__is_left__") === 1)
      .drop("__ts__", "__is_left__")
    rightCols.foldLeft(out)((df, c) => df.withColumnRenamed(s"__r_$c", c))
  }

  /** Bucketed as-of join: identical semantics to [[asofJoin]], but the
    * ordered carry runs per (key, TIME BUCKET) instead of per key — the
    * remedy for the documented hot-key caveat. One pathological key with
    * 10⁹ ticks parallelizes across `range/bucketSecs` tasks instead of
    * serializing into one.
    *
    * Construction (three stages, all bounded):
    *  1. per (key, bucket): each carried column's LAST non-null right
    *     value in the bucket (window over the bucket's rows — the
    *     parallel unit);
    *  2. per key: a running last-non-null over the ≤ #buckets summary
    *     rows, shifted one bucket back — the value carried INTO each
    *     bucket (per-key serialized, but over bucket summaries, not
    *     events: range/bucketSecs rows per key, not event count);
    *  3. per (key, bucket): union [carry row at bucket start, sorting
    *     before any real row] ∪ [right rows] ∪ [left rows], one ordered
    *     window, keep left rows. Right-before-left at equal ts gives the
    *     same `<=` semantics; the carry row sorts before a real right
    *     row AT the bucket boundary, so a boundary observation
    *     supersedes it.
    *
    * Ordering stays on the ORIGINAL timestamp values (the seconds cast
    * is used only to pick a bucket — sub-second order inside a bucket
    * is preserved); the carry row orders via a NULL timestamp, which
    * sorts before every real instant. Preconditions: timestamps are
    * NONNEGATIVE (epochs — integer `div` bucketing truncates toward
    * zero) and non-NULL, and `right` has at most one row per (key, ts) —
    * the same tie precondition as [[resampleLinear]]; with ties the
    * winner inside a bucket would be partition-order dependent (true of
    * plain [[asofJoin]] too). */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      bucketSecs: Long): DataFrame = {
    require(bucketSecs > 0 && bucketSecs <= 9000000000L,
      s"bucketSecs must be in (0, 9e9], got $bucketSecs")
    // type-aware bucketing: integral epochs divide directly; timestamps
    // (incl. NTZ — the session tz is UTC by repo convention, matching
    // the oracle's naive epoch()) go through unix_micros
    def bktExpr(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case org.apache.spark.sql.types.TimestampType
         | org.apache.spark.sql.types.TimestampNTZType =>
        s"unix_micros(CAST(__ts__ AS TIMESTAMP)) div ${1000000L * bucketSecs}"
      case org.apache.spark.sql.types.ByteType
         | org.apache.spark.sql.types.ShortType
         | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.LongType =>
        s"__ts__ div $bucketSecs"
      case other => throw new IllegalArgumentException(
        "asofJoinBucketed: timestamp column must be integral epoch " +
          s"seconds or a timestamp type, got ${other.catalogString}")
    }
    val rb = right.select(Seq(col(key), col(rightTs).as("__ts__")) ++
        rightCols.map(c => col(c).as(s"__r_$c")): _*)
      .withColumn("__bkt__", expr(bktExpr(right.schema(rightTs).dataType)))
    val lb = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__bkt__", expr(bktExpr(left.schema(leftTs).dataType)))
    // stage 1: last non-null per carried column within (key, bucket)
    val wFin = Window.partitionBy(col(key), col("__bkt__"))
      .orderBy(col("__ts__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val fins = rightCols.foldLeft(rb) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__r_$c"), ignoreNulls = true).over(wFin))
    }.select(Seq(col(key), col("__bkt__")) ++
      rightCols.map(c => col(s"__f_$c")): _*)
      .dropDuplicates(key, "__bkt__")
    // stage 2: carry into each bucket = last non-null over PRIOR buckets'
    // summaries; buckets holding only left rows still need a carry row
    val allBuckets = rb.select(col(key), col("__bkt__"))
      .union(lb.select(col(key), col("__bkt__"))).distinct()
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__bkt__").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = rightCols.foldLeft(
      allBuckets.join(fins, Seq(key, "__bkt__"), "left")) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__f_$c"), ignoreNulls = true).over(wCarry))
    }
    // stage 3: tagged union within (key, bucket); origin -1 = carry row
    // (NULL ts — sorts before every real instant under asc_nulls_first,
    // regardless of the timestamp column's type), 0 = right, 1 = left
    val leftDataCols = left.columns.filter(_ != key).toSeq
    val tsType = left.schema(leftTs).dataType
    val carryTagged = carries.select(Seq(col(key), col("__bkt__"),
      lit(null).cast(tsType).as("__ts__"), lit(-1).as("__org__")) ++
      leftDataCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightCols.map(c => col(s"__c_$c").as(s"__r_$c")): _*)
    val rightTagged = rb.select(Seq(col(key), col("__bkt__"), col("__ts__"),
      lit(0).as("__org__")) ++
      leftDataCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightCols.map(c => col(s"__r_$c")): _*)
    val leftTagged = lb.select(Seq(col(key), col("__bkt__"), col("__ts__"),
      lit(1).as("__org__")) ++
      leftDataCols.map(c => col(c)) ++
      rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val wAsof = Window.partitionBy(col(key), col("__bkt__"))
      .orderBy(col("__ts__").asc_nulls_first, col("__org__").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightCols.foldLeft(
      carryTagged.unionByName(rightTagged).unionByName(leftTagged)) { (df, c) =>
      df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(wAsof))
    }
    val out = carried.filter(col("__org__") === 1)
      .drop("__ts__", "__bkt__", "__org__")
    rightCols.foldLeft(out)((df, c) => df.withColumnRenamed(s"__r_$c", c))
  }

  /** Bucketized range (interval) join: left rows whose `valueCol` falls
    * inside a right-side interval `[loCol, hiCol]` (inclusive). Spark
    * plans a naive `v BETWEEN lo AND hi` join as a broadcast
    * nested-loop — O(n·m) compares with no partition parallelism on the
    * predicate. Here each interval EXPLODES to the fixed-width bins it
    * covers and each value hashes to exactly ONE bin, so the join is a
    * plain equi-shuffle on the bin id plus an exact residual filter —
    * the standard interval-binning construction (e.g. Databricks' range
    * join optimization). A value's bin is unique, so no dedup step is
    * needed.
    *
    * `binWidth` trades replication (intervals copy to ~span/width bins)
    * against bin selectivity; an interval exceeding `maxBinsPerInterval`
    * bins fails loudly PER ROW inside the job (a lazy `raise_error`, no
    * extra scan of `right`) — pick a wider bin, or split giant
    * intervals. Inverted intervals (lo > hi) match nothing under
    * BETWEEN, so they are dropped before binning rather than fed to
    * `sequence` (whose default negative step would silently explode
    * them into huge descending arrays). Output: all left columns + all
    * right columns — the names must be disjoint (checked), mirroring a
    * plain join's usability contract.
    */
  /** Resample an irregular per-key series onto a fixed `stepSecs` grid
    * with last-observation-carried-forward: one row per key per grid
    * point g ∈ [⌈min/step⌉·step, ⌊max/step⌋·step], carrying the value of
    * the latest observation at-or-before g (a value always exists —
    * the grid starts at-or-after the first observation).
    *
    * Scale shape: grid points come from a per-key (min, max) aggregate
    * exploded with `sequence` (bounded by range/step per key, never by
    * event count), and the carry is the [[asofJoin]] union + running
    * last-value — one shuffle on the key, O(1) carry state per row, no
    * per-grid-point probe join. */
  def resampleLocf(df: DataFrame, keyCol: String, tsSecCol: String,
      valueCol: String, stepSecs: Long): DataFrame = {
    val grid = gridFor(df, keyCol, tsSecCol, stepSecs)
    asofJoin(grid, df.select(col(keyCol), col(tsSecCol), col(valueCol)),
        keyCol, "grid_ts", tsSecCol, Seq(valueCol))
      .select(col(keyCol), col("grid_ts"), col(valueCol))
  }

  /** Integer ceil/floor grid per key (timestamps are nonnegative epoch
    * seconds); a key whose whole range falls inside one step has no
    * grid point — filtered before sequence(), which rejects start>stop. */
  private def gridFor(df: DataFrame, keyCol: String, tsSecCol: String,
      stepSecs: Long): DataFrame = {
    require(stepSecs > 0, s"stepSecs must be > 0, got $stepSecs")
    df.groupBy(col(keyCol))
      .agg(min(col(tsSecCol)).as("__mn__"), max(col(tsSecCol)).as("__mx__"))
      .withColumn("__g0__",
        expr(s"((__mn__ + ${stepSecs - 1}) div $stepSecs) * $stepSecs"))
      .withColumn("__g1__", expr(s"(__mx__ div $stepSecs) * $stepSecs"))
      .filter(col("__g0__") <= col("__g1__"))
      .select(col(keyCol),
        explode(sequence(col("__g0__"), col("__g1__"),
          lit(stepSecs))).as("grid_ts"))
  }

  /** Linear-interpolation resample: each grid point g between bracketing
    * observations (t0, v0) ≤ g < (t1, v1) gets
    * `v0 + (v1 − v0)·(g − t0)/(t1 − t0)`; a grid point that lands ON an
    * observation takes its value exactly (no 0/0). The bracketing pair
    * comes from the same union trick as [[asofJoin]] run in BOTH
    * directions — one shuffle, two running carries, no per-point probe.
    * The interpolation itself is one IEEE expression over data values
    * and exact integer gaps, so an independent engine evaluating the
    * same formula reproduces it bit-for-bit. Input must have at most
    * one observation per (key, ts) — pre-collapse ties first. */
  def resampleLinear(df: DataFrame, keyCol: String, tsSecCol: String,
      valueCol: String, stepSecs: Long): DataFrame = {
    val grid = gridFor(df, keyCol, tsSecCol, stepSecs)
    val obs = df.select(col(keyCol), col(tsSecCol).as("__ts__"),
        col(valueCol).as("__v__"))
      .withColumn("__is_grid__", lit(0))
      .withColumn("grid_ts", lit(null).cast("long"))
    val g = grid.select(col(keyCol), col("grid_ts").as("__ts__"),
        lit(null).cast(df.schema(valueCol).dataType).as("__v__"))
      .withColumn("__is_grid__", lit(1))
      .withColumn("grid_ts", col("__ts__"))
    // obs sorts before grid at equal ts, so the forward carry at a
    // coinciding point yields t0 == g (the exact-hit branch)
    val ord = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts__").asc, col("__is_grid__").asc)
    val fwd = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pair = struct(col("__ts__"), col("__v__"))
    val carried = g.unionByName(obs)
      .withColumn("__p0__", last(when(col("__is_grid__") === 0, pair),
        ignoreNulls = true).over(fwd))
      .withColumn("__p1__", first(when(col("__is_grid__") === 0, pair),
        ignoreNulls = true).over(bwd))
      .filter(col("__is_grid__") === 1)
    val t0 = col("__p0__.__ts__"); val v0 = col("__p0__.__v__")
    val t1 = col("__p1__.__ts__"); val v1 = col("__p1__.__v__")
    carried.select(col(keyCol), col("grid_ts"),
      when(col("grid_ts") === t0, v0)
        .otherwise(v0 + (v1 - v0) *
          ((col("grid_ts") - t0).cast("double") / (t1 - t0).cast("double")))
        .as(valueCol))
  }

  def rangeJoin(
      left: DataFrame, valueCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double,
      maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin: left and right share column names ${shared.mkString(", ")} " +
        "— rename one side (the output carries both sides' columns)")
    require(!left.columns.contains("__BIN__") && !right.columns.contains("__BIN__"),
      "rangeJoin: __BIN__ is reserved")
    // guard on the ARITHMETIC bin count before sequence() ever builds an
    // array (a runaway interval would blow up inside sequence itself);
    // CASE branches evaluate lazily per row, so oversized rows hit the
    // raise_error without materializing their bins
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    val nBins = hiBin - loBin + lit(1L)
    val binned = right
      .where(col(loCol) <= col(hiCol))
      .withColumn("__BIN__", explode(
        when(nBins <= maxBinsPerInterval, sequence(loBin, hiBin))
          .otherwise(raise_error(concat(
            lit("rangeJoin: an interval covers "), nBins.cast("string"),
            lit(s" bins of width $binWidth (> maxBinsPerInterval=" +
              s"$maxBinsPerInterval) — widen binWidth or split the interval."))))))
    left.withColumn("__BIN__", floor(col(valueCol) / binWidth).cast("long"))
      .join(binned, Seq("__BIN__"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__BIN__")
  }

  /** Rolling z-score anomaly detection over a per-key event stream:
    * flag each event whose value deviates from the trailing window's
    * mean by more than `t` standard deviations — the metric-spike /
    * sensor-glitch / corrupt-crawl-batch monitor.
    *
    * The three-sigma test is evaluated in EXACT integer arithmetic so
    * an external engine hash-matches row-for-row: values are scaled to
    * integers (`floor(value · scale)` — floor, not round, because
    * round's half-case tie-breaking is engine-dependent), and
    * `|x − μ| > t·σ` over the trailing window (S = Σv, Q = Σv²,
    * n = count) is cross-multiplied by n² into
    * `(n·x − S)² > t²·(n·Q − S²)` — no float mean, no float sqrt.
    * Sums and products run in decimal(38,0) (HUGEINT-mirrorable);
    * exactness holds while |scaled value| ≤ ~1e8 and window ≤ ~100
    * (products ≤ 1e34 < 10^38).
    *
    * The window is the `window` PRECEDING rows (the current row is
    * excluded — an outlier must not mask itself), ordered by
    * `(tsCol, idCol)` for a deterministic frame under ts ties; rows
    * with fewer than `minN` predecessors are unflaggable (cold start).
    *
    * Scale shape: one per-key window pass — shuffle on `keyCol` only,
    * state is the O(window) frame. A pathologically hot key serializes
    * into one task (same caveat as [[asofJoin]]; the time-bucketing
    * remedy of [[asofJoinBucketed]] applies if one key dominates).
    *
    * Returns the FLAGGED rows only: the input columns plus `n` (the
    * trailing-window count backing the flag). */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 20, minN: Long = 10L,
      t: Int = 3, scale: Double = 1000.0): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minN >= 2, s"minN must be >= 2 (variance needs it), got $minN")
    require(t >= 1, s"t must be >= 1, got $t")
    require(scale > 0, s"scale must be positive, got $scale")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window, -1)
    val dec = "decimal(38,0)"
    val vd = col("__v__").cast(dec)
    // one select for all three window aggregates — separate withColumn
    // steps leave three Window operators (the interleaved Projects
    // block CollapseWindow); one select ⇒ one Window pass
    // Enforce the documented exactness bound instead of trusting it: a
    // decimal(38,0) overflow in lhs·lhs or n·Q−S² yields NULL under
    // ANSI-off, the flag filter silently drops the row, and a TRUE
    // anomaly vanishes with no error. Every product below is bounded by
    // (t·n·|v|)² with n ≤ window, so |v| ≤ 5e18/(window·t) keeps all of
    // them under 10^38 — rows past it fail LOUDLY (raise_error), the
    // same convention as the window/minN/t/scale validation above.
    // (At the defaults the bound is ~8.3e16 — far looser than the
    // conservative ~1e8 the doc quotes.)
    val vBound = (5e18 / (window.toDouble * t)).toLong
    // The bound compares the DOUBLE, before any long cast: a value like
    // -1e19 would saturate the non-ANSI cast to Long.MinValue, whose
    // non-ANSI abs() wraps NEGATIVE and would sail through a
    // post-cast |long| check — the exact silent-miss this guard exists
    // to prevent (its positive twin errors correctly; only the negative
    // edge escapes).
    val vDouble = col(valueCol).cast("double") * scale
    val out = df
      .withColumn("__v__",
        when(vDouble.isNull || abs(vDouble) <= lit(vBound.toDouble),
            floor(vDouble).cast("long"))
          .otherwise(raise_error(concat(
            lit(s"rollingAnomalies: |value*scale| exceeds the " +
              s"decimal(38,0) exactness bound $vBound (window=$window, " +
              s"t=$t) — got "), vDouble.cast("string")))
            .cast("long")))
      .select(col("*"),
        count(col("__v__")).over(w).as("__n__"),
        sum(vd).over(w).as("__s__"),
        sum(vd * vd).over(w).as("__q__"))
    val nd = col("__n__").cast(dec)
    val lhs = nd * vd - col("__s__")
    val rhs = lit(t.toLong * t).cast(dec) *
      (nd * col("__q__") - col("__s__") * col("__s__"))
    out.filter(col("__v__").isNotNull && col("__n__") >= minN &&
        lhs * lhs > rhs)
      .select(df.columns.map(col).toIndexedSeq :+
        col("__n__").as("n"): _*)
  }
}
