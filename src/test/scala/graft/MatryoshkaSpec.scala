package graft

import org.apache.spark.sql.functions._

import graft.api.Search

/** Matryoshka prefix-truncation search: full-budget exactness, the
  * column-pruned coarse scan under a materialized prefix column,
  * bounded-budget recall on front-loaded-energy data, error contracts. */
class MatryoshkaSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(67)

  /** MRL-shaped corpus: per-dimension energy decays geometrically, so the
    * prefix carries most of the signal — the structure matryoshka-trained
    * embeddings are optimized to have. */
  private def corpus(n: Int, d: Int): Seq[(Long, Seq[Double])] =
    Seq.tabulate(n) { i =>
      (i.toLong, Seq.tabulate(d)(j => rnd.nextGaussian() * math.pow(0.8, j)))
    }

  test("full candidate budget == brute force; lazy-slice and prefix-col paths agree") {
    val rows = corpus(500, 32)
    val df = rows.toDF("id", "vec")
      .withColumn("vec_pfx", slice(col("vec"), 1, 8))
    val target = rows(3)._2.toArray
    val brute = Search.knn(df, "vec", Seq(Tuple1(target.toSeq)).toDF("t"),
        "l2", k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    val sliced = Search.matryoshkaSearch(df, "vec", target, prefixDim = 8,
        candidates = 1 << 20, idCol = "id", k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(sliced == brute, s"slice path diverged: $sliced vs $brute")
    val materialized = Search.matryoshkaSearch(df, "vec", target,
        prefixDim = 8, candidates = 1 << 20, idCol = "id", k = 10,
        prefixCol = Some("vec_pfx"), tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(materialized == brute, s"prefix-col path diverged: $materialized")
    // cosine rerank path
    val bruteCos = Search.knn(df, "vec", Seq(Tuple1(target.toSeq)).toDF("t"),
        "cosine", k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    val cos = Search.matryoshkaSearch(df, "vec", target, prefixDim = 8,
        candidates = 1 << 20, idCol = "id", k = 10, metric = "cosine",
        tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    assert(cos == bruteCos, s"cosine diverged: $cos vs $bruteCos")
  }

  test("materialized prefix column keeps the full vector out of the coarse scan") {
    val root = java.nio.file.Files.createTempDirectory("graft-mrl").toString
    corpus(300, 32).toDF("id", "vec")
      .withColumn("vec_pfx", slice(col("vec"), 1, 8))
      .write.parquet(s"$root/t")
    val df = spark.read.parquet(s"$root/t")
    val target = Array.fill(32)(rnd.nextGaussian())
    val q = Search.matryoshkaSearch(df, "vec", target, prefixDim = 8,
      candidates = 50, idCol = "id", k = 10, prefixCol = Some("vec_pfx"),
      tieBreak = Seq("id"))
    q.collect()
    val scans = q.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("ReadSchema"))
    assert(scans.exists(l => l.contains("vec_pfx") && !l.contains("vec:")),
      s"no prefix-only scan:\n${scans.mkString("\n")}")
  }

  test("bounded budget recovers the true top-k on front-loaded data") {
    val rows = corpus(2000, 64)
    val df = rows.toDF("id", "vec")
    val target = rows(11)._2.toArray
    val brute = Search.knn(df, "vec", Seq(Tuple1(target.toSeq)).toDF("t"),
        "l2", k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    // 16 of 64 dims hold 1 − 0.8^32 ≈ 99.9% of the energy here, so a 5%
    // candidate budget should recover essentially the whole true top-10
    val got = Search.matryoshkaSearch(df, "vec", target, prefixDim = 16,
        candidates = 100, idCol = "id", k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    val recall = brute.count(got.contains) / 10.0
    assert(recall >= 0.9, s"recall $recall < 0.9 ($got vs $brute)")
  }

  test("rrfFuse: hand-computed fusion, missing-id handling, contracts") {
    // list A ranks ids 1,2,3; list B ranks 3,2,4 — id 3 appears rank 3+1,
    // id 2 rank 2+2, id 1 rank 1 only, id 4 rank 3 only (kRrf = 60)
    val a = Seq((1L, 0.1), (2L, 0.2), (3L, 0.3)).toDF("id", "s")
    val b = Seq((3L, 0.05), (2L, 0.15), (4L, 0.25)).toDF("id", "s")
    val got = Search.rrfFuse(Seq((a, "s"), (b, "s")), "id", k = 4,
        perListLimit = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def t(r: Int) = 1.0 / (60.0 + r)
    val want = Map(
      1L -> (t(1) + 0.0), 2L -> (t(2) + t(2)),
      3L -> (t(3) + t(1)), 4L -> (0.0 + t(3)))
    got.foreach { case (id, sc) =>
      assert(math.abs(sc - want(id)) < 1e-15, s"id $id: $sc vs ${want(id)}")
    }
    // ordering: 3 (t3+t1) > 2 (2·t2) > 1 (t1) > 4 (t3)
    assert(got.map(_._1) == Seq(3L, 2L, 1L, 4L), got.toString)
    // perListLimit truncates before fusion: with limit 2, id 3 drops from
    // list A and id 4 from list B
    val trunc = Search.rrfFuse(Seq((a, "s"), (b, "s")), "id", k = 4,
        perListLimit = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(trunc(3L) - t(1)) < 1e-15,
      s"id 3 must keep only its list-B rank-1 term: $trunc")
    assert(!trunc.contains(4L), s"id 4 was truncated from both lists: $trunc")
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Nil, "id", k = 1)
    }
    intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq((a, "s")), "id", k = 1, kRrf = 0)
    }
  }

  test("error contracts: prefixDim out of range, candidates < k") {
    val df = corpus(20, 8).toDF("id", "vec")
    val t = Array.fill(8)(1.0)
    intercept[IllegalArgumentException] {
      Search.matryoshkaSearch(df, "vec", t, prefixDim = 0,
        candidates = 10, idCol = "id")
    }
    intercept[IllegalArgumentException] {
      Search.matryoshkaSearch(df, "vec", t, prefixDim = 9,
        candidates = 10, idCol = "id")
    }
    intercept[IllegalArgumentException] {
      Search.matryoshkaSearch(df, "vec", t, prefixDim = 4,
        candidates = 3, idCol = "id", k = 10)
    }
  }
}
