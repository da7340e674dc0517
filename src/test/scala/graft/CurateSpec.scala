package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Curate

/** End-to-end curation pipeline — a fixture where every stage drops
  * exactly one designated document. */
class CurateSpec extends SparkSuite {
  import spark.implicits._

  // doc 1: clean survivor; doc 2: exact dup of 1; doc 3: near-dup of 1;
  // doc 4: contains the benchmark verbatim; doc 5: symbol spam;
  // doc 6: no stopwords in any language → 'und'; doc 7: clean survivor
  private val benchText = "alpha beta gamma delta epsilon zeta"
  private val doc1 = "the cat sat on the mat and it was nice to see the dog again"
  private val docs = Seq(
    1L -> doc1,
    2L -> doc1,
    3L -> doc1.replace("cat", "bat"),
    4L -> (benchText + " the cats wandered around here and they found something nice to play with"),
    5L -> "# ## ### #### #####",
    6L -> "zzz qqq rrr sss ttt uuu vvv www xxx yyy",
    7L -> "of mice and men in the big house it was all fine to see"
  ).toDF("doc_id", "text")
  private val bench = Seq(100L -> benchText).toDF("doc_id", "text")
  private val cfg = Curate.Config(jaccardThreshold = 0.35,
    minWords = 5, maxWords = 100, minStopwords = 0)

  test("each stage drops its designated doc; survivors keep annotations") {
    val out = Curate.curate(docs, "doc_id", "text",
      bench, "doc_id", "text", cfg)
    val rows = out.orderBy("doc_id").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 7L))
    assert(rows.forall(_.getAs[String]("lang_pred") == "en"))
    assert(rows.map(_.getAs[Long]("n_words")).toSeq == Seq(15L, 14L))
    // original columns survive alongside the appended annotations
    assert(out.columns.toSet == Set("doc_id", "text", "n_words", "lang_pred"))
  }

  test("DSIR resampling stage: keep-all pivot is a no-op, drop-all " +
      "pivot attributes survivors to dsir_resampled, partition holds") {
    // target == raw → every weight is exactly 0; the pivot alone
    // decides (keep prob = min(1, e^(0 − pivot)))
    val model = graft.ext.Corpus.dsirTrain(docs, docs, "text")
    val base = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
      "text", cfg).select("doc_id").as[Long].collect().toSet
    // pivot far below every weight: every survivor is at/above it
    val keepAll = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
        "text", cfg.copy(dsir = Some((model, -50.0))))
      .select("doc_id").as[Long].collect().toSet
    assert(keepAll == base)
    // pivot far above: e^(−50)·1e9 rounds to 0 — every survivor drops,
    // and attribution names the new stage without disturbing earlier ones
    val none = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
      "text", cfg.copy(dsir = Some((model, 50.0))))
    assert(none.count() == 0L)
    val drops = Curate.curateDrops(docs, "doc_id", "text", bench,
        "doc_id", "text", cfg.copy(dsir = Some((model, 50.0))))
      .as[(Long, String)].collect().toMap
    assert(drops == Map(1L -> "dsir_resampled", 7L -> "dsir_resampled",
      2L -> "exact_dup", 3L -> "near_dup", 4L -> "contaminated",
      5L -> "quality", 6L -> "language"), s"got $drops")
    // stream == batch parity: the ingest gate applies the same per-doc
    // keep decision, so a drop-all pivot admits nothing
    val refSigs = graft.ext.Dedup.minhashSignatures(
      docs.select(col("doc_id").as("ref_id"), col("text").as("ref_text"))
        .filter(col("ref_id") === 7L),
      "ref_id", "ref_text", 32, 3)
    val refTexts = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id").as("ref_id"), col("text").as("ref_text"))
    val arrivals = Seq(100L -> doc1).toDF("doc_id", "text")
    val gateBench = bench.withColumnRenamed("doc_id", "bench_id")
    val admitted0 = Curate.curateArrivals(arrivals, "doc_id", "text",
      refSigs, refTexts, gateBench, "bench_id", "text", cfg)
    assert(admitted0.count() == 1L, "fixture arrival must pass the gate")
    val admitted = Curate.curateArrivals(arrivals, "doc_id", "text",
      refSigs, refTexts, gateBench, "bench_id", "text",
      cfg.copy(dsir = Some((model, 50.0))))
    assert(admitted.count() == 0L,
      "gate must apply the DSIR stage like the batch pipeline")
  }

  test("DSIR sized stage (dsirKeepFraction): curate and curateDrops " +
      "derive the pivot independently and still partition; earlier " +
      "attributions undisturbed; the streaming gate refuses the knob") {
    // target = doc 1 → weights vary across docs (the sized path needs a
    // real distribution to derive from); the tuple's pivot is NaN to
    // prove the fraction OVERRIDES it
    val model = graft.ext.Corpus.dsirTrain(
      docs.filter(col("doc_id") === 1L), docs, "text")
    val sized = cfg.copy(dsir = Some((model, Double.NaN)),
      dsirKeepFraction = Some(0.5))
    val kept = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
      "text", sized).select("doc_id").as[Long].collect().toSet
    val drops = Curate.curateDrops(docs, "doc_id", "text", bench,
      "doc_id", "text", sized).as[(Long, String)].collect().toMap
    // partition: the two sides derive the pivot with no shared state —
    // determinism of dsirPivotForKeep is what makes them agree
    assert(kept ++ drops.keySet == (1L to 7L).toSet &&
      kept.intersect(drops.keySet).isEmpty,
      s"kept=$kept drops=$drops must partition the corpus")
    // dsir sits LAST: every earlier stage's attribution is unchanged
    assert(drops.filter(_._2 != "dsir_resampled") ==
      Map(2L -> "exact_dup", 3L -> "near_dup", 4L -> "contaminated",
        5L -> "quality", 6L -> "language"), s"got $drops")
    // the gate has no corpus to derive from — loud refusal, with the
    // resolve-offline instruction in the message
    val refSigs = graft.ext.Dedup.minhashSignatures(
      docs.select(col("doc_id").as("ref_id"), col("text").as("ref_text"))
        .filter(col("ref_id") === 7L),
      "ref_id", "ref_text", 32, 3)
    val refTexts = docs.filter(col("doc_id") === 7L)
      .select(col("doc_id").as("ref_id"), col("text").as("ref_text"))
    val arrivals = Seq(100L -> doc1).toDF("doc_id", "text")
    val gateBench = bench.withColumnRenamed("doc_id", "bench_id")
    val err = intercept[IllegalArgumentException] {
      Curate.curateArrivals(arrivals, "doc_id", "text", refSigs,
        refTexts, gateBench, "bench_id", "text", sized).count()
    }
    assert(err.getMessage.contains("dsirPivotForKeep"))
  }

  test("curateDrops: first-dropping-stage attribution partitions the corpus") {
    val drops = Curate.curateDrops(docs, "doc_id", "text",
        bench, "doc_id", "text", cfg)
      .as[(Long, String)].collect().toMap
    assert(drops == Map(2L -> "exact_dup", 3L -> "near_dup",
      4L -> "contaminated", 5L -> "quality", 6L -> "language"),
      s"got $drops")
    val kept = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
        "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(kept ++ drops.keySet == (1L to 7L).toSet &&
      kept.intersect(drops.keySet).isEmpty,
      "curate and curateDrops must partition the corpus")
    // model tier attribution: an impossible threshold claims the rest
    val model = graft.ext.QualityModel.Logistic(Array(0.0, 1.0, -1.0, 1.0))
    val withModel = Curate.curateDrops(docs, "doc_id", "text",
        bench, "doc_id", "text",
        cfg.copy(qualityModel = Some(model), minQualityProb = 1.1))
      .as[(Long, String)].collect().toMap
    assert(withModel(1L) == "model_quality" && withModel(7L) == "model_quality")
  }

  test("bloom-tier decontamination yields identical survivors at coarse fpp") {
    val base = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
        "text", cfg).orderBy("doc_id").collect().toSeq
    val bloom = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
        "text", cfg.copy(deconBloomFpp = Some(0.4)))
      .orderBy("doc_id").collect().toSeq
    assert(bloom == base, s"bloom $bloom vs broadcast $base")
  }

  test("optional quality-model tier filters by score, appends quality_prob") {
    val model = graft.ext.QualityModel.Logistic(Array(0.0, 2.0, -4.0, 1.0))
    // expected = the default pipeline's survivors, re-filtered by the
    // standalone scorer at the same threshold
    val base = Curate.curate(docs, "doc_id", "text", bench, "doc_id",
      "text", cfg)
    val thr = 0.5
    val expected = graft.ext.QualityModel.score(base, "doc_id", "text", model)
      .filter(col("quality_prob") >= thr)
      .as[(Long, Double)].collect().toMap
    val got = Curate.curate(docs, "doc_id", "text", bench, "doc_id", "text",
        cfg.copy(qualityModel = Some(model), minQualityProb = thr))
      .select("doc_id", "quality_prob").as[(Long, Double)].collect().toMap
    assert(got == expected, s"got $got want $expected")
    assert(got.nonEmpty, "fixture must keep at least one doc")
    // a hostile threshold drops everything — the tier really gates
    assert(Curate.curate(docs, "doc_id", "text", bench, "doc_id", "text",
      cfg.copy(qualityModel = Some(model), minQualityProb = 1.1)).isEmpty)
  }

  test("dropUnknownLang=false keeps the 'und' doc") {
    val out = Curate.curate(docs, "doc_id", "text",
      bench, "doc_id", "text", cfg.copy(dropUnknownLang = false))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 6L, 7L))
    assert(out.filter(col("doc_id") === 6L)
      .select("lang_pred").as[String].collect()(0) == "und")
  }

  test("a benchmark doc sitting in the corpus self-matches and is dropped") {
    val withBench = docs.union(Seq(8L -> benchText).toDF("doc_id", "text"))
    val out = Curate.curate(withBench, "doc_id", "text",
      bench, "doc_id", "text", cfg.copy(dropUnknownLang = false))
    assert(!out.select("doc_id").as[Long].collect().contains(8L))
  }

  test("curateArrivals: corpus near-dups are gated, clean arrivals pass") {
    val corpus = Seq(100L -> doc1).toDF("ref_id", "ref_text")
    val sigs = graft.ext.Dedup.minhashSignatures(corpus, "ref_id", "ref_text")
    val arrivals = Seq(
      10L -> doc1.replace("cat", "bat"),                 // near-dup of corpus
      11L -> (benchText + " the cat and it sat to play"), // contaminated
      12L -> "of mice and men in the big house it was all fine to see"
    ).toDF("doc_id", "text")
    val out = Curate.curateArrivals(arrivals, "doc_id", "text",
      sigs, corpus, bench.withColumnRenamed("doc_id", "bench_id"),
      "bench_id", "text", cfg)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(12L))
    // the ingest twin honors the bloom decontamination tier too —
    // identical survivors at a coarse fpp
    val bloomOut = Curate.curateArrivals(arrivals, "doc_id", "text",
      sigs, corpus, bench.withColumnRenamed("doc_id", "bench_id"),
      "bench_id", "text", cfg.copy(deconBloomFpp = Some(0.4)))
    assert(bloomOut.select("doc_id").as[Long].collect().toSeq == Seq(12L))
  }

  test("curateGateForEachBatch: streamed survivors == batch curateArrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(100L -> doc1).toDF("ref_id", "ref_text")
    val sigs = graft.ext.Dedup.minhashSignatures(corpus, "ref_id", "ref_text")
    val benchR = bench.withColumnRenamed("doc_id", "bench_id")
    val batch1 = Seq(
      10L -> doc1.replace("cat", "bat"),
      12L -> "of mice and men in the big house it was all fine to see")
    val batch2 = Seq(
      13L -> (benchText + " the cat and it sat to play"),
      14L -> ("the dogs were running toward the park and it was great " +
        "fun to be outside in the sunshine"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val mem = MemoryStream[(Long, String)]
    val gate = graft.streaming.Streams.curateGateForEachBatch(
      sigs, corpus, benchR, "bench_id", "text", "doc_id", "text", cfg,
      df => got ++= df.select("doc_id", "lang_pred", "n_words")
        .as[(Long, String, Long)].collect())
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(gate).outputMode("update").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val expected = Curate.curateArrivals(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
        sigs, corpus, benchR, "bench_id", "text", cfg)
      .select("doc_id", "lang_pred", "n_words")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got.sortBy(_._1).toSeq == expected)
    assert(expected.map(_._1) == Seq(12L, 14L))
  }

  test("redactOutputPii: survivors' ids unchanged, PII masked, " +
      "stream gate applies the identical rewrite") {
    // doc1 survivor gets an email + a Luhn-valid PAN appended; doc7
    // survivor stays clean. The scrub must not change WHICH docs
    // survive (it runs after every filter), only their text.
    val piiDocs = docs.withColumn("text",
      when(col("doc_id") === 1L, concat(col("text"),
        lit(" mail bob@corp.example.org card 4532015112830366")))
        .otherwise(col("text")))
    val off = Curate.curate(piiDocs, "doc_id", "text",
      bench, "doc_id", "text", cfg)
    val on = Curate.curate(piiDocs, "doc_id", "text",
      bench, "doc_id", "text", cfg.copy(redactOutputPii = true))
    assert(on.select("doc_id").as[Long].collect().sorted.toSeq ==
      off.select("doc_id").as[Long].collect().sorted.toSeq)
    val t1 = on.filter(col("doc_id") === 1L)
      .select("text").as[String].collect().head
    assert(t1.endsWith("mail <EMAIL> card <CARD>"), t1)
    val t7 = on.filter(col("doc_id") === 7L)
      .select("text").as[String].collect().head
    assert(t7 == "of mice and men in the big house it was all fine to see")
    // the ingest twin applies the same rewrite (stream == batch parity)
    val corpus = Seq(100L -> doc1).toDF("ref_id", "ref_text")
    val sigs = graft.ext.Dedup.minhashSignatures(corpus, "ref_id", "ref_text")
    val arr = Seq(12L -> ("of mice and men in the big house it was " +
      "all fine to see mail eve@x.example.net")).toDF("doc_id", "text")
    val gated = Curate.curateArrivals(arr, "doc_id", "text",
      sigs, corpus, bench.withColumnRenamed("doc_id", "bench_id"),
      "bench_id", "text", cfg.copy(redactOutputPii = true))
    assert(gated.select("text").as[String].collect().head
      .endsWith("mail <EMAIL>"))
  }

  test("contamStripSpans: the leaked span goes, the document survives") {
    val out = Curate.curate(docs, "doc_id", "text",
        bench, "doc_id", "text", cfg.copy(contamStripSpans = true))
      .orderBy("doc_id").collect()
    // doc 4 loses its verbatim benchmark prefix but keeps the rest
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 4L, 7L))
    val d4 = out(1)
    assert(d4.getAs[String]("text") ==
      "the cats wandered around here and they found something nice to play with",
      s"$d4")
    assert(d4.getAs[Long]("n_words") == 13L)
    // residual containment on the stripped corpus is zero: the drop
    // stage (still running as the safety net) drops nothing else
    val drops = Curate.curateDrops(docs, "doc_id", "text",
        bench, "doc_id", "text", cfg.copy(contamStripSpans = true))
      .as[(Long, String)].collect().toMap
    assert(!drops.values.exists(_ == "contaminated"), s"got $drops")
    // partition property holds in strip mode too
    assert(drops.keySet ++ Set(1L, 4L, 7L) == (1L to 7L).toSet)
    // and a VERBATIM bench copy in the corpus empties out and falls to
    // the quality stage rather than surviving as an empty husk
    val verbatim = docs.union(Seq(8L -> benchText).toDF("doc_id", "text"))
    val drops8 = Curate.curateDrops(verbatim, "doc_id", "text",
        bench, "doc_id", "text", cfg.copy(contamStripSpans = true))
      .as[(Long, String)].collect().toMap
    assert(drops8(8L) == "quality", s"got $drops8")
  }

  test("normalizeUnicode: a decomposed twin becomes an exact duplicate") {
    val twins = Seq(
      30L -> "the café sat on the mat and it was nice to see the dog again",
      31L -> "the cafe\u0301 sat on the mat and it was nice to see the dog again",
    ).toDF("doc_id", "text")
    val tight = cfg.copy(jaccardThreshold = 0.95)
    // without normalization the byte-distinct twin survives
    val off = Curate.curate(twins, "doc_id", "text",
        bench, "doc_id", "text", tight)
      .select("doc_id").as[Long].collect().toSet
    assert(off == Set(30L, 31L), s"got $off")
    // with it, NFC makes the texts byte-identical -> exact dedup
    val drops = Curate.curateDrops(twins, "doc_id", "text",
        bench, "doc_id", "text", tight.copy(normalizeUnicode = true))
      .as[(Long, String)].collect().toMap
    assert(drops == Map(31L -> "exact_dup"), s"got $drops")
  }

  // ——— optional line-level strip tier (stage 0) ———

  private val navLine = "home products about contact"
  private val stripBody =
    "the cat sat on the mat and it was nice to see the dog again"
  // nav chrome in 3 distinct docs; 11 and 12 share a body and differ
  // ONLY in the chrome; 15 is null (row preservation through the tier)
  private lazy val stripDocs = Seq(
    11L -> s"$navLine\n$stripBody",
    12L -> stripBody,
    13L -> s"$navLine\nof mice and men in the big house it was all fine to see",
    14L -> s"$navLine\nanother page about cats with its own words it is all fine now",
    15L -> null.asInstanceOf[String],
  ).toDF("doc_id", "text")
  // tight threshold: chrome-only deltas do NOT near-dup at 0.9
  private lazy val stripCfg = cfg.copy(jaccardThreshold = 0.9)

  test("strip tier: boilerplate chrome no longer hides duplicates") {
    // without the tier the chrome makes 11 and 12 look distinct
    val out0 = Curate.curate(stripDocs, "doc_id", "text",
        bench, "doc_id", "text", stripCfg)
      .select("doc_id").as[Long].collect().toSet
    assert(out0.contains(11L) && out0.contains(12L), s"got $out0")
    // with it they become exact duplicates — min id survives
    val out = Curate.curate(stripDocs, "doc_id", "text",
        bench, "doc_id", "text",
        stripCfg.copy(stripSegmentsMinDocs = Some(3)))
      .select("doc_id").as[Long].collect().toSet
    assert(out.contains(11L) && !out.contains(12L), s"got $out")
  }

  test("strip tier equals pre-stripping the corpus by hand") {
    val rewrite = graft.ext.Dedup.stripCommonSegments(
        stripDocs, "doc_id", "text", minDocs = 3)
      .select($"doc_id", $"text_kept")
    val pre = stripDocs.join(rewrite, Seq("doc_id"), "left")
      .withColumn("text",
        when($"text_kept".isNotNull, $"text_kept").otherwise($"text"))
      .drop("text_kept")
    val byHand = Curate.curate(pre, "doc_id", "text",
        bench, "doc_id", "text", stripCfg)
      .collect().map(_.toSeq).toSet
    val byTier = Curate.curate(stripDocs, "doc_id", "text",
        bench, "doc_id", "text",
        stripCfg.copy(stripSegmentsMinDocs = Some(3)))
      .collect().map(_.toSeq).toSet
    assert(byTier == byHand)
  }

  test("strip tier: curate ∪ curateDrops still partitions the corpus") {
    val c = stripCfg.copy(stripSegmentsMinDocs = Some(3))
    val kept = Curate.curate(stripDocs, "doc_id", "text",
        bench, "doc_id", "text", c)
      .select("doc_id").as[Long].collect().toSet
    val drops = Curate.curateDrops(stripDocs, "doc_id", "text",
        bench, "doc_id", "text", c)
      .as[(Long, String)].collect().toMap
    assert(kept ++ drops.keySet == Set(11L, 12L, 13L, 14L, 15L) &&
      kept.intersect(drops.keySet).isEmpty,
      s"kept $kept drops $drops")
    assert(drops(12L) == "exact_dup", s"got $drops")
    assert(drops(15L) == "quality", "null doc must still be attributed")
  }

  test("curateArrivals strips against the corpus artifact before gating") {
    import graft.ext.Dedup
    // corpus artifacts are built from the STRIPPED corpus text — the
    // space the arrivals must be compared in
    val corpusStripped = Dedup.stripCommonSegments(
        stripDocs, "doc_id", "text", minDocs = 3)
      .select($"doc_id".as("ref_id"), $"text_kept".as("ref_text"))
    val sigs = Dedup.minhashSignatures(corpusStripped, "ref_id", "ref_text")
    val segHashes = Dedup.commonSegmentHashes(
      stripDocs, "doc_id", "text", minDocs = 3)
    // a re-crawl of doc 11 with the same chrome: un-stripped it is only
    // ~0.76 jaccard against the stripped corpus twin (passes at 0.9)...
    val arrival = Seq(20L -> s"$navLine\n$stripBody").toDF("doc_id", "text")
    val bench2 = bench.withColumnRenamed("doc_id", "bench_id")
    val without = Curate.curateArrivals(arrival, "doc_id", "text",
        sigs, corpusStripped, bench2, "bench_id", "text", stripCfg)
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(20L), s"got $without")
    // ...stripped first, it is jaccard 1.0 and the gate rejects it
    val withStrip = Curate.curateArrivals(arrival, "doc_id", "text",
        sigs, corpusStripped, bench2, "bench_id", "text", stripCfg,
        refSegHashes = Some(segHashes))
      .select("doc_id").as[Long].collect().toSet
    assert(withStrip.isEmpty, s"got $withStrip")
  }

  test("idempotence: curating the survivors again changes nothing") {
    // survivors are pair-free (every verified pair's id_b was dropped),
    // decontaminated and per-row-clean, so a second pass is the identity
    val once = Curate.curate(docs, "doc_id", "text",
      bench, "doc_id", "text", cfg)
    val onceIds = once.select("doc_id", "text")
    val twice = Curate.curate(onceIds, "doc_id", "text",
      bench, "doc_id", "text", cfg)
    assert(twice.select("doc_id").as[Long].collect().sorted.toSeq ==
      once.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("plan: one-pass assembly keeps corpus scans bounded (no cascade)") {
    // a literal staged cascade re-derives upstream stages wherever they
    // are referenced and rescans the corpus ~56× (measured); the id-set
    // assembly holds it to ~14 bounded, column-pruned scans
    val dir = java.nio.file.Files.createTempDirectory("curate-plan").toString
    docs.write.mode("overwrite").parquet(s"$dir/docs")
    val pd = spark.read.parquet(s"$dir/docs")
    val plan = Curate.curate(pd, "doc_id", "text", bench, "doc_id", "text", cfg)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = "Scan parquet".r.findAllMatchIn(plan).size
    assert(scans <= 16, s"curate plan cascade-rescans the corpus: $scans scans")
  }

  test("id/text column names must not collide with the appended columns") {
    val bad = docs.withColumnRenamed("doc_id", "n_words")
    intercept[IllegalArgumentException] {
      Curate.curate(bad, "n_words", "text", bench, "doc_id", "text", cfg)
    }
  }

  test("selfMaintainingCurateGate: an admission gates later near-dups of it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gate-loop").toString
    val store = new graft.store.Store(spark, root)
    val seed = Seq(100L ->
      "totally unrelated seed document with the and a to in words fine")
      .toDF("ref_id", "ref_text")
    store.createTable("gate_ref", seed)
    val sigsPath = s"$root/gate_sigs"
    graft.ext.Dedup.minhashSignatures(seed, "ref_id", "ref_text")
      .write.parquet(sigsPath)
    val docA = "the quick cat sat on the mat and it was nice to see the dog again"
    // a verbatim re-crawl: signature-identical to A, so every band
    // matches (a 1-word edit at 8x4 banding only hits ~79% of the time
    // and whether THIS content hits is luck-of-the-hash; the state-
    // maintenance claim under test needs a deterministic flag)
    val docA2 = docA
    // sanity: against the ORIGINAL state alone, A2 would be admitted
    val stale = Curate.curateArrivals(
      Seq(20L -> docA2).toDF("doc_id", "text"), "doc_id", "text",
      spark.read.parquet(sigsPath),
      seed, bench.withColumnRenamed("doc_id", "bench_id"),
      "bench_id", "text", cfg)
    assert(stale.count() == 1L, "A2 must pass a gate that never saw A")
    val sunk = scala.collection.mutable.Set.empty[Long]
    val gate = graft.streaming.Streams.selfMaintainingCurateGate(
      store, "gate_ref", "ref_id", "ref_text", sigsPath, fpsPath = None,
      bench.withColumnRenamed("doc_id", "bench_id"), "bench_id", "text",
      "doc_id", "text", cfg,
      sink = b => sunk ++= b.select("doc_id").as[Long].collect())
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(gate).start()
    try {
      mem.addData(10L -> docA)
      q.processAllAvailable()
      assert(sunk.toSet == Set(10L), s"batch 1: $sunk")
      mem.addData(20L -> docA2)
      q.processAllAvailable()
      // the batch-1 admission's signature now gates its near-dup
      assert(sunk.toSet == Set(10L), s"batch 2 must reject A2: $sunk")
    } finally q.stop()
    // state really grew: ref table has seed + A, sigs cover both
    assert(store.loadTable("gate_ref").count() == 2L)
    assert(spark.read.parquet(sigsPath).count() == 2L)
  }

  test("selfMaintainingCurateGate: a line crossing minDocs starts stripping") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("gate-seg").toString
    val store = new graft.store.Store(spark, root)
    val seed = Seq(100L ->
      "totally unrelated seed document with the and a to in words fine")
      .toDF("ref_id", "ref_text")
    store.createTable("gate_ref2", seed)
    val sigsPath = s"$root/sigs"
    val segPath = s"$root/segcounts"
    graft.ext.Dedup.minhashSignatures(seed, "ref_id", "ref_text")
      .write.parquet(sigsPath)
    graft.ext.Dedup.segmentDocCounts(seed, "ref_id", "ref_text")
      .write.parquet(segPath)
    val banner = "promo banner offer today"
    val bodies = Map(
      10L -> "the cat sat on the mat and it was nice to see the dog again",
      11L -> "of mice and men in the big house it was all fine to see",
      12L -> "a completely different story about the sea and the old man there",
      13L -> "the last body here is about winter snow and the quiet town at night")
    val sunkText = scala.collection.mutable.Map.empty[Long, String]
    val gate = graft.streaming.Streams.selfMaintainingCurateGate(
      store, "gate_ref2", "ref_id", "ref_text", sigsPath, fpsPath = None,
      bench.withColumnRenamed("doc_id", "bench_id"), "bench_id", "text",
      "doc_id", "text", cfg.copy(stripSegmentsMinDocs = Some(3)),
      sink = b => b.select("doc_id", "text").as[(Long, String)].collect()
        .foreach { case (i, t) => sunkText(i) = t },
      segCountsPath = Some(segPath))
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(gate).start()
    try {
      // batches 1–2 admit banner-bearing docs while the line is still
      // below minDocs = 3 — their stored text keeps the banner
      mem.addData(10L -> s"$banner\n${bodies(10L)}", 11L -> s"$banner\n${bodies(11L)}")
      q.processAllAvailable()
      mem.addData(12L -> s"$banner\n${bodies(12L)}")
      q.processAllAvailable()
      assert(sunkText.keySet == Set(10L, 11L, 12L), s"got $sunkText")
      assert(sunkText(12L).startsWith(banner),
        "below threshold the banner must survive")
      // the log now holds 3 banner docs: batch 3 strips it on arrival
      mem.addData(13L -> s"$banner\n${bodies(13L)}")
      q.processAllAvailable()
      assert(sunkText(13L) == bodies(13L),
        s"banner must be stripped once common: ${sunkText(13L)}")
    } finally q.stop()
    // the admitted (stripped) text is what the ref table holds
    val stored = store.loadTable("gate_ref2")
      .as[(Long, String)].collect().toMap
    assert(stored(13L) == bodies(13L))
    assert(stored(12L).startsWith(banner))
  }
}

/** Exact-duplicate ingest gate over the persisted fingerprint artifact. */
class ExactGateSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    100L -> "The Cat sat  on the mat",
    101L -> "something else entirely here",
    102L -> (null: String)
  ).toDF("ref_id", "ref_text")
  private val fps = graft.ext.Dedup.textFingerprints(corpus, "ref_id", "ref_text")

  test("normalization-exact re-crawls flag; novel and null texts pass") {
    val arrivals = Seq(
      1L -> "the cat SAT on   the mat",   // case/whitespace variant of 100
      2L -> "the cat sat on the hat",     // one word off → NOT exact
      3L -> (null: String),               // null never flags
      4L -> "something else entirely here" // identical to 101
    ).toDF("doc_id", "text")
    val got = graft.streaming.Streams.exactDupAgainstFingerprints(
        arrivals, "doc_id", "text", fps, corpus)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (4L, 101L)))
  }

  test("artifact round-trips through parquet (8 bytes/doc contract)") {
    val dir = java.nio.file.Files.createTempDirectory("fp-artifact").toString
    fps.write.mode("overwrite").parquet(s"$dir/fps")
    val reloaded = spark.read.parquet(s"$dir/fps")
    assert(reloaded.columns.toSeq == Seq("ref_id", "fingerprint"))
    val arrivals = Seq(1L -> "the cat sat on the mat").toDF("doc_id", "text")
    val direct = graft.streaming.Streams.exactDupAgainstFingerprints(
      arrivals, "doc_id", "text", fps, corpus).as[(Long, Long)].collect().toSet
    val viaDisk = graft.streaming.Streams.exactDupAgainstFingerprints(
      arrivals, "doc_id", "text", reloaded, corpus).as[(Long, Long)].collect().toSet
    assert(direct == viaDisk && direct == Set((1L, 100L)))
  }

  test("identical-text corpus cluster: one flag against the min-id rep") {
    val cluster = Seq(
      200L -> "boiler plate error page",
      201L -> "boiler plate error page",
      202L -> "Boiler  Plate ERROR page"  // same normalized text
    ).toDF("ref_id", "ref_text")
    val cfps = graft.ext.Dedup.textFingerprints(cluster, "ref_id", "ref_text")
    val arrivals = Seq(1L -> "boiler plate error page").toDF("doc_id", "text")
    val got = graft.streaming.Streams.exactDupAgainstFingerprints(
        arrivals, "doc_id", "text", cfps, cluster)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 200L)), s"one row, against the rep: $got")
  }

  test("exact tier in curateArrivals: identical survivors either way") {
    val sigs = graft.ext.Dedup.minhashSignatures(corpus, "ref_id", "ref_text")
    val benchR = Seq(500L -> "alpha beta gamma").toDF("bench_id", "text")
    val cfg = graft.ext.Curate.Config(jaccardThreshold = 0.35,
      minWords = 1, maxWords = 100, minStopwords = 0,
      dropUnknownLang = false)
    val arrivals = Seq(
      1L -> "The Cat sat  on the mat",           // re-crawl of 100
      2L -> "totally different words here today" // novel
    ).toDF("doc_id", "text")
    def run(fpsOpt: Option[org.apache.spark.sql.DataFrame]) =
      graft.ext.Curate.curateArrivals(arrivals, "doc_id", "text",
        sigs, corpus, benchR, "bench_id", "text", cfg, fpsOpt)
        .select("doc_id").as[Long].collect().toSet
    assert(run(Some(fps)) == run(None))
    assert(run(Some(fps)) == Set(2L))
  }

  test("idCol colliding with ref_id is refused") {
    val arrivals = Seq(1L -> "x").toDF("ref_id", "text")
    intercept[IllegalArgumentException] {
      graft.streaming.Streams.exactDupAgainstFingerprints(
        arrivals, "ref_id", "text", fps, corpus)
    }
  }
}
