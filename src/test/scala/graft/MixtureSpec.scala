package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Corpus

/** Deterministic domain-mixture resampling. */
class MixtureSpec extends SparkSuite {
  import spark.implicits._

  // 1800 web rows, 200 books rows (90/10)
  private lazy val skewed = ((0L until 1800L).map(i => (i, "web")) ++
    (2000L until 2200L).map(i => (i, "books"))).toDF("id", "domain")

  test("max-factor domain keeps every row; others downsample toward target") {
    // target 50/50 from actual 90/10: books factor 5.0 (keeps all),
    // web rate = (0.5/0.9)/5 = 1/9 → expect ≈ 200 kept of 1800
    val kept = Corpus.mixtureSample(skewed, "id", "domain",
      Map("web" -> 0.5, "books" -> 0.5))
    val byDomain = kept.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain("books") == 200L, s"books must keep all: $byDomain")
    assert(byDomain("web") > 140 && byDomain("web") < 260,
      s"web should keep ≈200 (rate 1/9): $byDomain")
  }

  test("unlisted domains are dropped") {
    val kept = Corpus.mixtureSample(skewed, "id", "domain",
      Map("books" -> 1.0))
    assert(kept.select("domain").distinct().as[String].collect().toSeq ==
      Seq("books"))
    assert(kept.count() == 200L)   // single domain → rate 1
  }

  test("FIM transform: lossless split, deterministic selection, edge lengths") {
    val docs = Seq((1L, "abcdefghij"), (2L, ""), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Corpus.fimTransform(docs, "doc_id", "text", rate = 1.0)
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out.foreach { case (id, (mode, t)) =>
      assert(mode == "fim", s"rate 1.0 selects all: $id")
      // the three pieces reassemble the original exactly
      val m = "<fim_prefix>(.*)<fim_suffix>(.*)<fim_middle>(.*)".r
      t match {
        case m(p, s, mid) =>
          val orig = docs.filter($"doc_id" === id).select("text").as[String].head()
          assert(p + mid + s == orig, s"$id: '$p'+'$mid'+'$s' != '$orig'")
        case _ => fail(s"bad fim_text: $t")
      }
    }
    // rate 0 → all plain, text untouched
    val plain = Corpus.fimTransform(docs, "doc_id", "text", rate = 0.0)
      .as[(Long, String, String)].collect()
    assert(plain.forall(_._2 == "plain"))
    assert(plain.map(r => r._1 -> r._3).toMap ==
      Map(1L -> "abcdefghij", 2L -> "", 3L -> "x"))
    // deterministic: same call twice, identical output
    val again = Corpus.fimTransform(docs, "doc_id", "text", rate = 1.0)
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == out)
  }

  test("negative sampling: k per anchor, never self, partition-invariant") {
    val docs = (0L until 50L).map(i => (i, s"d$i")).toDF("doc_id", "txt")
    val neg = Corpus.negativeSample(docs, "doc_id", k = 3)
      .as[(Long, Int, Long)].collect()
    assert(neg.length == 150)
    assert(neg.forall { case (a, _, n) => a != n }, "never the anchor itself")
    assert(neg.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(0, 1, 2)))
    val again = Corpus.negativeSample(docs.repartition(7), "doc_id", k = 3)
      .as[(Long, Int, Long)].collect()
    assert(neg.toSet == again.toSet, "must not depend on partitioning")
  }

  test("deterministic across runs; salt changes the sample") {
    val w = Map("web" -> 0.5, "books" -> 0.5)
    val a = Corpus.mixtureSample(skewed, "id", "domain", w)
      .select("id").as[Long].collect().toSet
    val b = Corpus.mixtureSample(skewed, "id", "domain", w)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    val c = Corpus.mixtureSample(skewed, "id", "domain", w, salt = "s2")
      .select("id").as[Long].collect().toSet
    assert(a != c)
  }

  test("weights are ratios — scaling all weights changes nothing") {
    val a = Corpus.mixtureSample(skewed, "id", "domain",
      Map("web" -> 0.5, "books" -> 0.5)).select("id").as[Long].collect().toSet
    val b = Corpus.mixtureSample(skewed, "id", "domain",
      Map("web" -> 7.0, "books" -> 7.0)).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("error contracts") {
    intercept[IllegalArgumentException] {
      Corpus.mixtureSample(skewed, "id", "domain", Map.empty[String, Double])
    }
    intercept[IllegalArgumentException] {
      Corpus.mixtureSample(skewed, "id", "domain", Map("web" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Corpus.mixtureSample(skewed, "id", "domain", Map("absent" -> 1.0))
    }
  }

  // 1800 web docs + 200 books docs, 10 tokens each → token shares 0.9/0.1
  private lazy val texted = ((0L until 1800L).map(i => (i, "web")) ++
    (2000L until 2200L).map(i => (i, "books")))
    .map { case (i, d) => (i, d, Seq.fill(10)("tok").mkString(" ")) }
    .toDF("id", "domain", "text")

  test("temperatureMixture flattens toward share^tau on token mass") {
    // tau 0.5: factor_d = share^-0.5 → books (share 0.1) keeps all,
    // web rate = sqrt(0.1/0.9) = 1/3 → ≈600 of 1800
    val kept = Corpus.temperatureMixture(texted, "id", "domain", "text",
      Seq("web", "books"), 0.5)
    val byDomain = kept.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain("books") == 200L, s"books must keep all: $byDomain")
    assert(byDomain("web") > 480 && byDomain("web") < 720,
      s"web should keep ≈600 (rate 1/3): $byDomain")
  }

  test("temperatureMixture dedupes repeated domain names") {
    val a = Corpus.temperatureMixture(texted, "id", "domain", "text",
      Seq("web", "web", "books"), 0.5).select("id").as[Long].collect().toSet
    val b = Corpus.temperatureMixture(texted, "id", "domain", "text",
      Seq("web", "books"), 0.5).select("id").as[Long].collect().toSet
    assert(a == b, "a duplicate domain must not double-count token mass")
  }

  test("temperatureMixture at tau 1 keeps everything") {
    val kept = Corpus.temperatureMixture(texted, "id", "domain", "text",
      Seq("web", "books"), 1.0)
    assert(kept.count() == 2000L)
  }

  test("temperatureMixture error contracts") {
    intercept[IllegalArgumentException] {
      Corpus.temperatureMixture(texted, "id", "domain", "text", Seq(), 0.5)
    }
    intercept[IllegalArgumentException] {
      Corpus.temperatureMixture(texted, "id", "domain", "text",
        Seq("web"), 0.0)
    }
    intercept[IllegalArgumentException] {
      Corpus.temperatureMixture(texted, "id", "domain", "text",
        Seq("absent"), 0.5)
    }
  }

  test("tokenBudgetSample: budget met by a minimal hash-order prefix") {
    val out = Corpus.tokenBudgetSample(texted, "id", "domain", "text",
      Map("web" -> 205L, "books" -> 95L))
    val mass = out.groupBy("domain").agg(sum("n_tokens").as("m"))
      .as[(String, Long)].collect().toMap
    // 10-token docs: first doc crossing the budget is included
    assert(mass("web") == 210L, s"web mass: $mass")
    assert(mass("books") == 100L, s"books mass: $mass")
    // minimality: dropping any one selected doc dips under budget
    assert(mass("web") - 10L < 205L && mass("books") - 10L < 95L)
  }

  test("tokenBudgetSample: slack never changes the output (exactness loop)") {
    for (salt <- Seq("", "s2", "s3")) {
      val tight = Corpus.tokenBudgetSample(texted, "id", "domain", "text",
          Map("web" -> 500L), salt = salt, slack = 1.000001)
        .select("id").as[Long].collect().toSet
      val pure = Corpus.tokenBudgetSample(texted, "id", "domain", "text",
          Map("web" -> 500L), salt = salt, slack = 1e9)
        .select("id").as[Long].collect().toSet
      assert(tight == pure, s"salt '$salt': prefilter changed the sample")
      assert(tight.nonEmpty)
    }
  }

  test("tokenBudgetSample: bucketed prefix equals the pure window") {
    // buckets = 1 degenerates to the full-survivor window (the crossing
    // bucket is bucket 0 = everything) — the reference semantics
    for (salt <- Seq("", "s2", "s3"); buckets <- Seq(8, 4096)) {
      val bucketed = Corpus.tokenBudgetSample(texted, "id", "domain",
          "text", Map("web" -> 500L, "books" -> 150L), salt = salt,
          buckets = buckets)
        .select("id").as[Long].collect().toSet
      val reference = Corpus.tokenBudgetSample(texted, "id", "domain",
          "text", Map("web" -> 500L, "books" -> 150L), salt = salt,
          buckets = 1)
        .select("id").as[Long].collect().toSet
      assert(bucketed == reference,
        s"salt '$salt' buckets $buckets: bucketed prefix diverged")
      assert(bucketed.nonEmpty)
    }
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSample(texted, "id", "domain", "text",
        Map("web" -> 10L), buckets = 0)
    }
  }

  test("tokenBudgetSample: budget above the domain total keeps every row") {
    val out = Corpus.tokenBudgetSample(texted, "id", "domain", "text",
      Map("books" -> 1000000L))
    assert(out.count() == 200L)
    assert(out.select("domain").distinct().as[String].collect().toSeq ==
      Seq("books"))
  }

  test("tokensCol: a precomputed count column replaces whitespace counting") {
    // wrong text, right counts: the counts column must win
    val counted = texted.withColumn("n_tok",
      when(col("domain") === "books", 90L).otherwise(10L))
    val viaCol = Corpus.temperatureMixture(counted, "id", "domain", "text",
        Seq("web", "books"), 0.5, tokensCol = Some("n_tok"))
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    // token mass now web 18000 vs books 18000 → equal shares → both keep all
    assert(viaCol("web") == 1800L && viaCol("books") == 200L, s"$viaCol")
    val budg = Corpus.tokenBudgetSample(counted, "id", "domain", "text",
        Map("books" -> 450L), tokensCol = Some("n_tok"))
      .agg(sum("n_tokens")).as[Long].collect()(0)
    assert(budg == 450L, s"budget over the counts column: $budg")
  }

  test("assignSplits: disjoint, exhaustive, ratio-true, salt re-deals") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Corpus.assignSplits(skewed, "id", splits)
    assert(out.count() == 2000L, "every row gets exactly one split")
    val byS = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > 1500 && byS("train") < 1700, s"80%: $byS")
    // deterministic; a salt re-deals
    val a = Corpus.assignSplits(skewed, "id", splits)
      .as[(Long, String, String)].collect().toSet
    val b = Corpus.assignSplits(skewed, "id", splits)
      .as[(Long, String, String)].collect().toSet
    assert(a == b)
    val c = Corpus.assignSplits(skewed, "id", splits, salt = "s2")
      .as[(Long, String, String)].collect().toSet
    assert(a != c)
    intercept[IllegalArgumentException] {
      Corpus.assignSplits(skewed, "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Corpus.assignSplits(skewed, "id", Seq("a" -> 0.0))
    }
  }

  test("assignSplitsByGroup: near-dup clusters never straddle a split") {
    // 100 docs, pairs chaining (0,1), (2,3), ..., plus a 5-doc cluster
    val docs = (0L until 100L).toDF("id")
    val pairs = ((0L until 40L by 2).map(i => (i, i + 1)) ++
      Seq((90L, 91L), (91L, 92L), (92L, 93L), (93L, 94L)))
      .toDF("id_a", "id_b")
    val out = Corpus.assignSplitsByGroup(docs, "id", pairs, "id_a", "id_b",
        Seq("train" -> 0.5, "test" -> 0.5))
      .as[(Long, String)].collect().toMap
    assert(out.size == 100)
    for (i <- 0L until 40L by 2)
      assert(out(i) == out(i + 1), s"pair ($i,${i + 1}) straddles splits")
    assert((90L to 94L).map(out).toSet.size == 1, "cluster must move as one")
    // unpaired docs match the plain per-doc assignment
    val plain = Corpus.assignSplits(docs, "id",
        Seq("train" -> 0.5, "test" -> 0.5))
      .as[(Long, String)].collect().toMap
    for (i <- 50L until 90L) assert(out(i) == plain(i))
  }

  test("tokenBudgetSample error contracts") {
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSample(texted, "id", "domain", "text",
        Map.empty[String, Long])
    }
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSample(texted, "id", "domain", "text",
        Map("web" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Corpus.tokenBudgetSample(texted, "id", "domain", "text",
        Map("web" -> 10L), slack = 1.0)
    }
  }

  // ——— DSIR importance resampling (Xie et al. 2023) ———

  // 100 target-vocabulary docs and 100 off-target docs, token sequences
  // varied per row so n-gram sets are not degenerate
  private lazy val dsirDocs = ((0L until 100L).map(i =>
      (i, s"alpha beta gamma delta tok${i % 7} alpha beta")) ++
    (100L until 200L).map(i =>
      (i, s"omega psi chi phi tok${i % 7} omega psi")))
    .toDF("id", "text")

  test("dsirTrain/dsirWeights: target-like docs outscore off-target " +
      "docs; a target == raw fit scores everything zero") {
    val target = dsirDocs.filter(col("id") < 100)
    val model = Corpus.dsirTrain(target, dsirDocs, "text", buckets = 256)
    val w = Corpus.dsirWeights(dsirDocs, "id", "text", model)
      .as[(Long, Double)].collect().toMap
    val tgtMin = (0L until 100L).map(w).min
    val offMax = (100L until 200L).map(w).max
    assert(tgtMin > offMax,
      s"every target doc must outscore every off-target doc: " +
        s"min(target)=$tgtMin, max(off)=$offMax")
    // identical distributions → per-bucket ratios all zero
    val model0 = Corpus.dsirTrain(dsirDocs, dsirDocs, "text", buckets = 256)
    assert(model0.logRatio.forall(_ == 0.0))
    val w0 = Corpus.dsirWeights(dsirDocs, "id", "text", model0)
      .as[(Long, Double)].collect()
    assert(w0.forall(_._2 == 0.0))
  }

  test("dsirSample: deterministic, above-pivot rows always kept, " +
      "raising the pivot only shrinks the sample, salt re-deals") {
    val model = Corpus.dsirTrain(dsirDocs.filter(col("id") < 100),
      dsirDocs, "text", buckets = 256)
    val w = dsirDocs.select(col("id"),
      Corpus.dsirWeightExpr(col("text"), model).as("w"))
    // pivots anchored to the fixture's actual weight range so both sit
    // INSIDE the lottery region (a fixed pivot between the two weight
    // modes would keep exactly the target mode at any value)
    val wmax = w.agg(max("w")).head().getDouble(0)
    def kept(pivot: Double, salt: String = ""): Set[Long] =
      Corpus.dsirSample(w, "id", col("w"), pivot, salt)
        .select("id").as[Long].collect().toSet
    val lo = kept(wmax - 1.0)
    assert(lo == kept(wmax - 1.0), "must be reproducible")
    // every row at or above the pivot weight survives unconditionally
    val above = w.filter(col("w") >= wmax - 1.0)
      .select("id").as[Long].collect().toSet
    assert(above.nonEmpty && above.subsetOf(lo))
    // pivot monotonicity: a stricter pivot keeps a subset (same hash,
    // pointwise smaller keep probability)
    val hi = kept(wmax + 2.0)
    assert(hi.subsetOf(lo) && hi.size < lo.size, s"${hi.size} vs ${lo.size}")
    // salt re-deals the lottery (every row below this pivot)
    assert(kept(wmax + 0.5) != kept(wmax + 0.5, salt = "other"))
  }

  test("dsirPivotForKeep: derived pivot realizes the requested kept " +
      "mass to histogram tolerance; deterministic; edge cases") {
    // 10k rows, weights spread over [−5, 5] deterministically
    val w = spark.range(10000L).select(col("id"),
      ((col("id") % 1000L).cast("double") / 100.0 - 5.0).as("w"))
      .localCheckpoint()
    for (f <- Seq(0.25, 0.5, 0.9)) {
      val pivot = Corpus.dsirPivotForKeep(w, "w", f)
      // re-derivation is bit-identical (the curate/curateDrops contract)
      assert(pivot == Corpus.dsirPivotForKeep(w, "w", f))
      val kept = Corpus.dsirSample(w, "id", col("w"), pivot).count()
      // expected mass is bin-width-accurate; the hash lottery adds
      // ~sqrt(n·f) binomial noise on top — 5% absolute covers both
      assert(math.abs(kept / 10000.0 - f) < 0.05,
        s"f=$f pivot=$pivot kept=$kept")
    }
    // keepFraction 1 → pivot at the minimum (all rows at/above: prob 1)
    assert(Corpus.dsirPivotForKeep(w, "w", 1.0) == -5.0)
    assert(Corpus.dsirSample(w, "id", col("w"),
      Corpus.dsirPivotForKeep(w, "w", 1.0)).count() == 10000L)
    // all-equal weights: closed form mn − ln(f)
    val eq = spark.range(1000L).select(col("id"), lit(2.0).as("w"))
    val p = Corpus.dsirPivotForKeep(eq, "w", 0.5)
    assert(math.abs(p - (2.0 - math.log(0.5))) < 1e-12)
    val keptEq = Corpus.dsirSample(eq, "id", col("w"), p).count()
    assert(math.abs(keptEq / 1000.0 - 0.5) < 0.06, s"kept $keptEq")
    // error contracts
    intercept[IllegalArgumentException] {
      Corpus.dsirPivotForKeep(w, "w", 0.0)
    }
    intercept[IllegalArgumentException] {
      Corpus.dsirPivotForKeep(w, "w", 1.5)
    }
    // sized wrapper returns the kept frame AND the pivot it derived
    val (sampled, piv) = Corpus.dsirSampleSized(w, "id", "w", 0.5)
    assert(piv == Corpus.dsirPivotForKeep(w, "w", 0.5))
    assert(sampled.count() ==
      Corpus.dsirSample(w, "id", col("w"), piv).count())
  }

  test("dsir weight kernel == legacy HOF fold, bit-exactly, on " +
      "adversarial token soup") {
    val model = Corpus.dsirTrain(dsirDocs.filter(col("id") < 100),
      dsirDocs, "text", buckets = 256)
    val hand = Seq(
      "", " ", "   ", "one", " one ", "a b", "a  b", "a\tb", "\ta b\t",
      "a\nb c", "a b a b", "UPPER Case MiXeD", "Ünïcôdé tøkens HERE",
      "trailing space ", " leading", "x " * 50, "solo nbsp",
      "tab\t\ttab", "a b c d e f g h i j k l m")
    val rnd = new scala.util.Random(17L)
    val words = Seq("the", "cat", "DOG", "sat", "ünï", "x1", "", " ", "\t")
    val fuzz = (1 to 300).map(_ =>
      (1 to rnd.nextInt(12)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    import spark.implicits._
    val df = (hand ++ fuzz).zipWithIndex.map(_.swap).toDF("id", "text")
      .select(col("id"),
        Corpus.dsirWeightExpr(col("text"), model).as("kernel"),
        Corpus.dsirWeightExprChain(col("text"), model).as("chain"))
    val diffs = df.filter(!(col("kernel") <=> col("chain")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(diffs.isEmpty, s"kernel != chain on: ${diffs.take(5).mkString("; ")}")
    // NULL text → NULL weight, both forms
    val nulls = Seq((0L, Option.empty[String])).toDF("id", "text")
      .select(Corpus.dsirWeightExpr(col("text"), model)).head()
    assert(nulls.isNullAt(0))
  }
}
