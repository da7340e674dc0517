package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{CountMinAgg, KMinValuesAgg, Sketches}

/** CMS heavy hitters and KMV distinct estimation. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  // Zipf-ish fixture: key i appears ~ 3000/i times → a few heavy keys,
  // a long tail of singletons. 10k extra distinct singleton keys push
  // the cardinality well past the CMS width/4 so collisions are real.
  private lazy val zipf = {
    val heavy = (1 to 50).flatMap(i => Seq.fill(3000 / i)(s"k$i"))
    val tail = (0 until 10000).map(i => s"tail$i")
    (heavy ++ tail).toDF("k").repartition(7)
  }

  test("CMS estimate never underestimates the true count") {
    val agg = new CountMinAgg(width = 512, depth = 4)
    val sketch = zipf.select(graft.ext.Corpus.hashU60(col("k")).as("h"))
      .as[Long].select(agg.toColumn).head()
    val truth = zipf.groupBy("k").count()
      .withColumn("h", graft.ext.Corpus.hashU60(col("k")))
      .as[(String, Long, Long)].collect()
    truth.foreach { case (k, n, h) =>
      assert(agg.estimate(sketch, h) >= n, s"CMS underestimated $k: $n")
    }
  }

  test("heavyHitters == exact GROUP BY HAVING, including the boundary") {
    val minCount = 3000L / 17 // exactly the count of k17
    val got = Sketches.heavyHitters(zipf, "k", minCount, width = 512)
      .as[(String, Long)].collect().toMap
    val want = zipf.groupBy("k").count().filter(col("count") >= minCount)
      .as[(String, Long)].collect().toMap
    assert(got == want, s"got=${got.size} want=${want.size}")
    assert(want.contains("k17"), "boundary key must be present")
    assert(got.nonEmpty)
  }

  test("heavyHitters at minCount=1 degrades to the exact group count") {
    val small = Seq("a", "a", "b").toDF("k")
    val got = Sketches.heavyHitters(small, "k", 1L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("CmsEstimate kernel: codegen == interpreted == aggregator probe") {
    val agg = new CountMinAgg(width = 256, depth = 4)
    val keys = zipf.select(graft.ext.Corpus.hashU60(col("k")).as("h"))
    val sketch = keys.as[Long].select(agg.toColumn).head()

    def run(): Seq[(Long, Long)] = keys
      .withColumn("est", org.apache.spark.sql.GraftShims.column(
        graft.functions.CmsEstimate(
          org.apache.spark.sql.GraftShims.expression(col("h")),
          sketch, 256, 4)))
      .distinct().orderBy("h")
      .as[(Long, Long)].collect().toSeq

    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(codegen == interpreted)
    codegen.foreach { case (h, est) =>
      assert(est == agg.estimate(sketch, h), s"driver-probe mismatch at $h")
    }
  }

  test("heavyHitters keeps NULL as a group, matching GROUP BY semantics") {
    // nulls heavy (4×), "a" heavy (3×), "b" below threshold
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"),
      None, Some("a"), None).toDF("k").repartition(3)
    val got = Sketches.heavyHitters(withNulls, "k", 3L)
      .as[(Option[String], Long)].collect().toMap
    assert(got == Map(Option("a") -> 3L, Option.empty[String] -> 4L),
      s"null group must survive the sketch pass: $got")
  }

  test("histogramQuantiles: exact inverted-CDF at grid resolution, " +
      "hand-checked") {
    // values 1..100, binWidth 10 → bin i covers [10i, 10i+10);
    // q=0.5 → rank 50 → value 50 lands in bin 5 (cum through bin 4 = 49)
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val got = Sketches.histogramQuantiles(df, "x", 10.0,
        Seq(0.01, 0.5, 0.99, 1.0))
      .select("q", "rank", "bin", "value")
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0.01, 1L, 0L, 0.0),   // rank 1 = value 1 → bin 0
      (0.5, 50L, 5L, 50.0),  // value 50 → bin 5
      (0.99, 99L, 9L, 90.0), // value 99 → bin 9
      (1.0, 100L, 10L, 100.0)), got) // value 100 → bin 10
  }

  test("histogramQuantiles is partition-invariant and excludes NULLs") {
    val vals = (0 until 5000).map(i => Some(((i * 37) % 997).toDouble)) ++
      Seq.fill(100)(Option.empty[Double])
    val a = Sketches.histogramQuantiles(
      vals.toDF("x").repartition(1), "x", 7.0, Seq(0.25, 0.75))
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = Sketches.histogramQuantiles(
      vals.toDF("x").repartition(17), "x", 7.0, Seq(0.25, 0.75))
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, s"$a vs $b")
    // N excludes the nulls: rank of q=0.25 is ceil(0.25·5000), not ·5100
    assert(a.head._2 == 1250L, a)
  }

  test("histogramQuantiles guards the bin count and the q domain") {
    val df = (0 until 2000).map(_.toDouble).toDF("x")
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(df, "x", 1.0, Seq(0.5), maxBins = 1000L)
    }
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(df, "x", 1.0, Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Sketches.histogramQuantiles(df, "x", -1.0, Seq(0.5))
    }
  }

  test("profileQuantiles: one-pass multi-column grid quantiles agree " +
      "with per-column histogramQuantiles, per-column NULL exclusion") {
    val rows = (1 to 200).map(i =>
      (i.toDouble, if (i % 4 == 0) None else Some(i * 3.0)))
    val df = rows.toDF("a", "b")
    val got = Sketches.profileQuantiles(df,
        Seq("a" -> 10.0, "b" -> 25.0), Seq(0.5, 0.9))
      .select("col_name", "q", "rank", "bin", "value")
      .as[(String, Double, Long, Long, Double)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    val single = Seq("a" -> 10.0, "b" -> 25.0).flatMap { case (c, w) =>
      Sketches.histogramQuantiles(df, c, w, Seq(0.5, 0.9))
        .select("q", "rank", "bin", "value")
        .as[(Double, Long, Long, Double)].collect()
        .map(t => (c, t._1, t._2, t._3, t._4))
    }.sortBy(t => (t._1, t._2))
    assert(got == single, s"$got vs $single")
    // b's N excludes its 50 nulls independently of a's full 200
    assert(got.find(t => t._1 == "b" && t._2 == 0.5).get._3 == 75L, got)
    assert(got.find(t => t._1 == "a" && t._2 == 0.5).get._3 == 100L, got)
  }

  test("histogramQuantilesAuto derives width = range/targetBins and " +
      "matches the explicit-width call; constant column degrades to " +
      "width 1.0; all-NULL input fails loudly") {
    val vals = (0 until 5000).map(i => ((i * 37) % 997).toDouble)
    val df = vals.toDF("x")
    val width = (vals.max - vals.min) / 250.0
    val auto = Sketches.histogramQuantilesAuto(df, "x",
        Seq(0.25, 0.5, 0.99), targetBins = 250)
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val manual = Sketches.histogramQuantiles(df, "x", width,
        Seq(0.25, 0.5, 0.99))
      .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(auto == manual, s"$auto vs $manual")
    // bin count stays within targetBins + 1 (max can land on a bin edge)
    assert(auto.forall(_._3 <= 251), auto)

    val const = Seq.fill(10)(42.0).toDF("x")
    val c = Sketches.histogramQuantilesAuto(const, "x", Seq(0.5))
      .as[(Double, Long, Long, Double)].collect().toSeq
    assert(c == Seq((0.5, 5L, 42L, 42.0)), c) // width 1.0, bin = value

    intercept[IllegalArgumentException] {
      Sketches.histogramQuantilesAuto(
        Seq(Option.empty[Double]).toDF("x"), "x", Seq(0.5))
    }
  }

  test("profileQuantilesAuto derives per-column widths in one pass and " +
      "matches explicit-width profileQuantiles; all-NULL column fails") {
    val rows = (1 to 300).map(i =>
      (i.toDouble, if (i % 5 == 0) None else Some(i * 7.0)))
    val df = rows.toDF("a", "b")
    val wa = (300.0 - 1.0) / 100.0
    val bs = rows.flatMap(_._2)
    val wb = (bs.max - bs.min) / 100.0
    val auto = Sketches.profileQuantilesAuto(df, Seq("a", "b"),
        Seq(0.5, 0.9), targetBins = 100)
      .as[(String, Double, Long, Long, Double)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    val manual = Sketches.profileQuantiles(df, Seq("a" -> wa, "b" -> wb),
        Seq(0.5, 0.9))
      .as[(String, Double, Long, Long, Double)].collect()
      .sortBy(t => (t._1, t._2)).toSeq
    assert(auto == manual, s"$auto vs $manual")
    intercept[IllegalArgumentException] {
      Sketches.profileQuantilesAuto(
        Seq((1.0, Option.empty[Double])).toDF("a", "b"), Seq("a", "b"), Seq(0.5))
    }
  }

  test("histogram sketch streams: complete-mode bin aggregation == batch, " +
      "and quantilesFromBins over the stream snapshot == histogramQuantiles") {
    val vals = (0 until 4000).map(i => ((i * 53) % 701).toDouble)
    val df = vals.toDF("x")
    val batchBins = Sketches.histogramBins(df, "x", 25.0)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Double]
    val q = Sketches.histogramBins(mem.toDF().toDF("x"), "x", 25.0)
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      vals.grouped(1500).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
      val streamedBins = spark.table("hist_stream")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(streamedBins == batchBins, "streamed histogram != batch")
      val viaStream = Sketches.quantilesFromBins(
          spark.table("hist_stream"), 25.0, Seq(0.5, 0.99))
        .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
      val direct = Sketches.histogramQuantiles(df, "x", 25.0, Seq(0.5, 0.99))
        .as[(Double, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(viaStream == direct, s"$viaStream vs $direct")
    } finally q.stop()
  }

  test("quantile helpers release their histogram checkpoints") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val df = (0 until 2000).map(_.toDouble).toDF("x")
    Sketches.histogramQuantiles(df, "x", 10.0, Seq(0.5, 0.9)).count()
    Sketches.profileQuantiles(df, Seq("x" -> 10.0), Seq(0.5)).count()
    val leaked = sc.getPersistentRDDs.keySet -- before
    // loose bound: suites share the context (a leak would be ≥ 2 here
    // plus one per additional call, growing without bound in a server)
    assert(leaked.size <= 1,
      s"quantile helpers left ${leaked.size} persistent RDDs pinned")
  }

  test("KMV is exact below k and partition-invariant") {
    val df = (0 until 100).map(i => s"v${i % 40}").toDF("k")
    val r = Sketches.kmvDistinct(df, "k", k = 256)
      .select("n_kept", "est_distinct").as[(Long, Double)].head()
    assert(r == ((40L, 40.0)), s"below-k must be exact: $r")

    val big = (0 until 20000).map(i => s"u$i").toDF("k")
    val a = Sketches.kmvDistinct(big.repartition(1), "k").head()
    val b = Sketches.kmvDistinct(big.repartition(13), "k").head()
    assert(a == b, "merge must be order/partition independent")
  }

  test("KMV estimate lands within the k=256 error envelope") {
    val n = 20000
    val big = (0 until n).map(i => s"u$i").toDF("k")
    val est = Sketches.kmvDistinct(big, "k", k = 256)
      .select("est_distinct").as[Double].head()
    // relative sd ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sd
    assert(math.abs(est - n) / n < 0.25, s"estimate too far off: $est vs $n")
  }

  test("grouped KMV: per-group estimates, and streaming == batch") {
    val df = (0 until 3000).map(i => (s"g${i % 3}", s"u${i % (100 * (i % 3 + 1))}"))
      .toDF("g", "u")
    val batch = Sketches.kmvDistinctBy(df, "u", Seq("g"), k = 64)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // exact per-group distinct as reference: estimates within 4 sd (50%)
    val exact = df.groupBy("g").agg(countDistinct("u").as("d"))
      .as[(String, Long)].collect().toMap
    batch.foreach { case (g, nKept, _, est) =>
      assert(nKept <= 64)
      assert(math.abs(est - exact(g)) / exact(g) < 0.5, s"$g: $est vs ${exact(g)}")
    }

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Sketches.kmvDistinctBy(mem.toDF().toDF("g", "u"), "u", Seq("g"), k = 64)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      df.as[(String, String)].collect().grouped(1000)
        .foreach { chunk => mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable() }
      val streamed = spark.table("kmv_stream")
        .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("kmvSetOps: exact below k — union, Jaccard, intersection") {
    val a = (0 until 60).map(i => s"k$i").toDF("x")      // {0..59}
    val b = (40 until 100).map(i => s"k$i").toDF("x")    // {40..99}
    val r = graft.ext.Sketches.kmvSetOps(a, "x", b, "x", k = 256).head()
    assert(r.getLong(0) == 100L, r.toString)             // union_kept exact
    assert(r.getLong(2) == 20L, r.toString)              // overlap exact
    assert(r.getDouble(3) == 100.0, r.toString)          // est_union exact
    assert(r.getDouble(4) == 0.2, r.toString)            // jaccard exact
    assert(r.getDouble(5) == 20.0, r.toString)           // est_intersect
  }

  test("kmvSetOps estimator branch: identical sides → jaccard 1; " +
      "estimates within the k=256 envelope") {
    val a = (0 until 20000).map(i => s"u$i").toDF("x")
    val r1 = graft.ext.Sketches.kmvSetOps(a, "x", a, "x", k = 256).head()
    assert(r1.getLong(0) == 256L)
    assert(r1.getDouble(4) == 1.0, r1.toString)          // A ∩ A = A
    assert(math.abs(r1.getDouble(3) - 20000.0) / 20000.0 < 0.2, r1.toString)
    assert(r1.getDouble(5) == r1.getDouble(3), r1.toString)
    // half-overlapping sides: jaccard ≈ 1/3, intersection ≈ 10k
    val b = (10000 until 30000).map(i => s"u$i").toDF("x")
    val r2 = graft.ext.Sketches.kmvSetOps(a, "x", b, "x", k = 256).head()
    assert(math.abs(r2.getDouble(4) - 1.0 / 3.0) < 0.1, r2.toString)
    assert(math.abs(r2.getDouble(5) - 10000.0) / 10000.0 < 0.35, r2.toString)
    assert(math.abs(r2.getDouble(3) - 30000.0) / 30000.0 < 0.2, r2.toString)
  }

  test("kmvSetOps: empty and disjoint inputs degrade cleanly") {
    val empty = Seq.empty[String].toDF("x")
    val r0 = graft.ext.Sketches.kmvSetOps(empty, "x", empty, "x", 16).head()
    assert(r0.getLong(0) == 0L && r0.isNullAt(1) && r0.getDouble(4) == 0.0 &&
      r0.getDouble(5) == 0.0, r0.toString)
    val a = Seq("p", "q").toDF("x")
    val b = Seq("r", "s", "t").toDF("x")
    val r1 = graft.ext.Sketches.kmvSetOps(a, "x", b, "x", 16).head()
    assert(r1.getLong(0) == 5L && r1.getLong(2) == 0L &&
      r1.getDouble(5) == 0.0, r1.toString)
  }

  test("KMV on an empty frame returns the zero profile, not an error") {
    val empty = Seq.empty[String].toDF("k")
    val r = Sketches.kmvDistinct(empty, "k")
      .select("n_kept", "est_distinct").as[(Long, Double)].head()
    assert(r == ((0L, 0.0)), r)
  }

  test("KMinValuesAgg insert keeps k smallest distinct, sorted") {
    val agg = new KMinValuesAgg(4)
    var b = agg.zero
    Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 11L).foreach(h => b = agg.reduce(b, h))
    assert(b.toSeq == Seq(1L, 2L, 3L, 7L))
    val other = Seq(0L, 7L, 12L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(b, other).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("histogramDrift: per-bin exact counts, full-outer over the union " +
      "of touched bins, NULLs excluded") {
    import spark.implicits._
    val a = Seq(Some(1.0), Some(1.5), Some(5.0), None).toDF("v")
    val b = Seq(Some(1.0), Some(9.0)).toDF("v")
    val d = graft.ext.Sketches.histogramDrift(a, b, "v", 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(d.toSeq == Seq((0L, 2L, 1L, 1L), (2L, 1L, 0L, 1L),
      (4L, 0L, 1L, -1L)))
  }

  test("driftSummary: identical distributions → 0; disjoint → 1000; " +
      "size-invariant cross-multiplied TV") {
    import spark.implicits._
    val a = Seq(1.0, 1.0, 3.0).toDF("v")
    val same = Seq(1.0, 1.0, 1.0, 1.0, 3.0, 3.0).toDF("v") // 2× scaled
    val row0 = graft.ext.Sketches.driftSummary(a, same, "v", 1.0).head()
    assert(row0.getLong(3) == 0L, row0.toString) // proportions equal
    val disjoint = Seq(10.0, 11.0).toDF("v")
    val row1 = graft.ext.Sketches.driftSummary(a, disjoint, "v", 1.0).head()
    assert(row1.getLong(3) == 1000L, row1.toString)
    // half the mass moved: TV = 500
    val shifted = Seq(1.0, 1.0, 1.0, 1.0, 99.0, 99.0, 3.0, 3.0).toDF("v")
    val aa = Seq(1.0, 1.0, 3.0, 3.0).toDF("v")
    val row2 = graft.ext.Sketches.driftSummary(aa, shifted, "v", 1.0).head()
    assert(row2.getLong(3) == 250L, row2.toString)
    // empty sides return zeros, not an NPE
    val empty = Seq.empty[Double].toDF("v")
    val row3 = graft.ext.Sketches.driftSummary(empty, empty, "v", 1.0).head()
    assert(row3.getLong(0) == 0L && row3.getLong(3) == 0L, row3.toString)
  }

  test("driftMonitorForEachBatch: streamed TV reports converge to the " +
      "batch driftSummary, reference binned once") {
    import spark.implicits._
    val ref = (0 until 1000).map(i => ((i * 7) % 100).toDouble).toDF("v")
    val refBins = graft.ext.Sketches.histogramBins(ref, "v", 10.0)
      .localCheckpoint(true) // binned ONCE — the monitor's contract
    val live = (0 until 1000).map(i => ((i * 13) % 150).toDouble)

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reports = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long)]
    val mem = MemoryStream[Double]
    val q = graft.ext.Sketches.histogramBins(mem.toDF().toDF("v"), "v", 10.0)
      .writeStream.outputMode("complete")
      .foreachBatch(graft.streaming.Streams.driftMonitorForEachBatch(
        refBins,
        rep => reports ++= rep.as[(Long, Long, Long, Long)].collect()))
      .start()
    try {
      live.grouped(400).foreach { chunk =>
        mem.addData(chunk.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(reports.size == 3, reports.toString) // one TV row per trigger
    val expected = graft.ext.Sketches.driftSummaryFromBins(
        graft.ext.Sketches.histogramBins(live.toDF("v"), "v", 10.0), refBins)
      .as[(Long, Long, Long, Long)].head()
    assert(reports.last == expected, s"${reports.last} vs $expected")
    assert(reports.last._1 == 1000L && reports.last._2 == 1000L)
    graft.ext.Graph.release(refBins)
  }
}
