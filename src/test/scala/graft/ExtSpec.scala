package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Corpus, CountMinAgg, Dedup, Multimodal, TextAnalysis}
import graft.streaming.Streams

class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  private lazy val docs = Seq(
    (1L, base),
    (2L, base),                                   // exact dup of 1
    (3L, base.replace("lazy", "sleepy")),         // near dup of 1
    (4L, "completely different text about spark query engines and shuffles at scale"),
    (5L, "unrelated words entirely banana apple cherry date elderberry fig grape kiwi"),
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per key") {
    val kept = Dedup.exactDedup(docs, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L, 5L)))
    val groups = Dedup.exactDupGroups(docs, "doc_id", Seq("text")).collect()
    assert(groups.length == 1 && groups(0).getAs[Long]("keep_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated") {
    val pairs = Dedup.nearDupPairsMinhash(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"exact dup must be found: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)), s"near dup must be found: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 5L || p._2 == 5L),
      s"unrelated docs must not pair: $pairs")
  }

  test("minhash: null-text docs are skipped, never paired (oracle contract)") {
    val withNulls = docs.unionByName(
      Seq((10L, null.asInstanceOf[String]), (11L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"))
    val pairs = Dedup.nearDupPairsMinhash(withNulls, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 >= 10L || p._2 >= 10L),
      s"null docs must never reach the candidate stage: $pairs")
    assert(pairs.contains((1L, 2L)), "non-null pairs unaffected")
  }

  test("minhash bucket cap: 20k-doc boilerplate cluster emits a bounded star") {
    // a web-scale failure shape in miniature: every doc identical, so ONE
    // bucket holds all 20k docs in every band — uncapped this is 2·10⁸
    // candidate pairs in one task; capped it is a 19,999-pair star
    val n = 20000
    val cluster = spark.range(n)
      .select($"id".as("doc_id"), lit(base).as("text"))
    val pairs = Dedup.nearDupPairsMinhash(cluster, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").collect()
    assert(pairs.length == n - 1, s"star must have n-1 pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 0L), "every pair anchors at the min-id rep")
    assert(pairs.forall(_.getDouble(2) == 1.0), "identical docs verify at jaccard 1.0")
  }

  test("minhash bucket cap: under-cap pairs unchanged, over-cap cluster stays connected") {
    val cluster = spark.range(100L, 130L)
      .select($"id".as("doc_id"),
        lit("boilerplate template error page repeated verbatim across the crawl corpus").as("text"))
    val all = docs.unionByName(cluster)
    val pairs = Dedup.nearDupPairsMinhash(all, "doc_id", "text",
      shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.3,
      maxBucket = 10L)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the small-bucket path is untouched by the cap
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) && got.contains((2L, 3L)),
      s"under-cap near-dup pairs must survive the cap: $got")
    assert(!got.exists(p => Set(4L, 5L)(p._1) || Set(4L, 5L)(p._2)),
      s"unrelated docs must not pair: $got")
    // the over-cap cluster collapses to a star around its min id …
    val clusterPairs = got.filter(p => p._1 >= 100L || p._2 >= 100L)
    assert(clusterPairs == (101L until 130L).map(i => (100L, i)).toSet,
      s"over-cap bucket must emit the min-id star: $clusterPairs")
    // … which is exactly enough for connected-component grouping
    val groups = Dedup.duplicateGroups(
        all.select("doc_id"), "doc_id", pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert((100L until 130L).forall(groups(_) == 100L),
      "cluster must consolidate to one duplicate group")
  }

  test("stream gate ref-bucket cap: cluster arrival flags against the representative") {
    val cluster = spark.range(100L, 130L)
      .select($"id".as("ref_id"),
        lit("boilerplate template error page repeated verbatim across the crawl corpus").as("ref_text"))
    val corpus = Seq((1L, base)).toDF("ref_id", "ref_text").unionByName(cluster)
    val arrivals = Seq(
      (201L, "boilerplate template error page repeated verbatim across the crawl corpus"),
      (202L, base.replace("lazy", "sleepy")),
      (203L, "entirely novel content nothing like anything held in the corpus today"),
    ).toDF("doc_id", "text")
    val got = Streams.nearDupAgainstCorpus(arrivals, "doc_id", "text",
        corpus, "ref_id", "ref_text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.3,
        maxRefBucket = 10L)
      .select("doc_id", "ref_id").as[(Long, Long)].collect().toSet
    assert(got.contains((201L, 100L)),
      s"cluster arrival must flag against the min-id representative: $got")
    assert(!got.exists(p => p._1 == 201L && p._2 > 100L),
      s"over-cap cluster must contribute exactly one ref row per arrival: $got")
    assert(got.contains((202L, 1L)), s"under-cap corpus refs unaffected: $got")
    assert(!got.exists(_._1 == 203L), s"novel arrival must pass: $got")
  }

  test("simhash bucket cap: over-cap cluster stars instead of vanishing") {
    // identical docs share every band chunk, so pre-round-10 the cap
    // DROPPED all their buckets and the cluster produced zero pairs;
    // the star emission must keep it connected while the under-cap
    // fixture pairs are untouched
    val cluster = spark.range(100L, 130L)
      .select($"id".as("doc_id"),
        lit("boilerplate template error page repeated verbatim across the crawl corpus").as("text"))
    val all = docs.unionByName(cluster)
    val pairs = Dedup.nearDupPairsSimhash(all, "doc_id", "text",
      maxHamming = 12, bands = 4, maxBucket = 10L)
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"under-cap exact dup must survive: $got")
    val clusterPairs = got.filter(p => p._1 >= 100L || p._2 >= 100L)
    assert(clusterPairs == (101L until 130L).map(i => (100L, i)).toSet,
      s"over-cap bucket must emit the min-id star: $clusterPairs")
    assert(pairs.filter($"id_a" === 100L).select("hamming").as[Int].collect()
      .forall(_ == 0), "identical docs verify at hamming 0")
  }

  test("stream gate: idCol colliding with fixed output columns is refused") {
    val corpus = Seq((1L, base)).toDF("ref_id", "ref_text")
    val err = intercept[IllegalArgumentException](
      Streams.nearDupAgainstCorpus(
        Seq((2L, base)).toDF("ref_id", "text"), "ref_id", "text",
        corpus, "ref_id", "ref_text"))
    assert(err.getMessage.contains("rename"), err.getMessage)
  }

  test("hash64 hashes code points (matches the unicode()-based oracles)") {
    // independent reimplementation: FNV-1a fold over the code-point array
    def want(s: String, seed: Long): Long =
      s.codePoints().toArray.foldLeft(0xcbf29ce484222325L ^ seed) {
        (h, cp) => (h ^ cp) * 0x100000001b3L
      }
    for (s <- Seq("the lazy dog", "ASCII only", "𝄞 clef 🎼 emoji", "混合 𠀀 text");
         seed <- Seq(0L, 42L, 0x9E3779B97F4A7C15L)) {
      assert(Dedup.hash64(s, seed) == want(s, seed), s"mismatch on '$s' seed $seed")
    }
    // a surrogate PAIR must hash as one code point, not two UTF-16 units
    val gClef = new String(Character.toChars(0x1D11E))
    assert(Dedup.hash64(gClef, 0L) == (0xcbf29ce484222325L ^ 0x1D11E) * 0x100000001b3L)
  }

  test("minhash signature kernel == minhashUdf twin, bit-exactly, on " +
      "adversarial token soup incl. astral chars") {
    val hand = Seq(
      "", " ", "one", "one two", "one two three", "one two three four",
      "UPPER lower MiXeD", "a  b\t c\nd", " lead", "trail ",
      "𝄞 clef 🎼 emoji tokens here now", "混合 𠀀 text with cjk chars",
      "dup dup dup dup", "a b a b a b", "x " * 40)
    val rnd = new scala.util.Random(99L)
    val words = Seq("the", "cat", "DOG", "sat", "ünï", "𝄞", "x1", "yy")
    val fuzz = (1 to 300).map(_ =>
      (0 to rnd.nextInt(10)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" "))
    for ((nh, ss) <- Seq((32, 3), (8, 2), (4, 1), (16, 5))) {
      val df = (hand ++ fuzz).zipWithIndex.map(_.swap).toDF("id", "text")
        .select(col("id"),
          graft.functions.functions.minhash_sig(col("text"), nh, ss)
            .as("kernel"),
          Dedup.minhashUdf(nh, ss)(col("text")).as("twin"))
      val diffs = df.filter(!(col("kernel") <=> col("twin"))).count()
      assert(diffs == 0, s"kernel != udf for numHashes=$nh shingle=$ss")
    }
  }

  test("minhash jaccard estimates track exact jaccard") {
    val j = Dedup.jaccardUdf(3)
    val got = docs.filter($"doc_id" === 1).crossJoin(docs.filter($"doc_id" === 3).select($"text".as("t2")))
      .select(j($"text", $"t2")).as[Double].collect()(0)
    val sa = Dedup.shingles(base, 3)
    val sb = Dedup.shingles(base.replace("lazy", "sleepy"), 3)
    val want = sa.intersect(sb).size.toDouble / sa.union(sb).size
    assert(math.abs(got - want) < 1e-12)
  }

  test("simhash: identical texts get hamming 0, near dups small, unrelated large") {
    val pairs = Dedup.nearDupPairsSimhash(docs, "doc_id", "text", maxHamming = 12, bands = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs(( 1L, 2L)) == 0)
    assert(pairs.get((1L, 3L)).forall(_ <= 12))
    assert(!pairs.contains((4L, 5L)))
  }

  test("all-pairs baselines refuse oversized inputs, pointing at the LSH path") {
    val err = intercept[IllegalArgumentException](
      Dedup.nearDupPairsCosineExact(sf("sf0.001", "embeddings"), "vec_id",
        "embedding", 0.30, maxRows = 10).collect())
    assert(err.getMessage.contains("nearDupPairsCosineLsh"), err.getMessage)
    val err2 = intercept[IllegalArgumentException](
      Dedup.ngramJaccardPairsExact(docs, "doc_id", "text", maxRows = 2).collect())
    assert(err2.getMessage.contains("nearDupPairsMinhash"), err2.getMessage)
  }

  test("cosine LSH near-dup is a subset of exact with recall >= 0.9") {
    for (scale <- Seq("sf0.001", "sf0.01")) {
      val emb = sf(scale, "embeddings")
      val exact = Dedup.nearDupPairsCosineExact(emb, "vec_id", "embedding", 0.30)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val lsh = Dedup.nearDupPairsCosineLsh(emb, "vec_id", "embedding", 0.30)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lsh.subsetOf(exact), s"$scale: LSH must only return true (verified) near-dups")
      if (exact.nonEmpty) {
        val recall = lsh.size.toDouble / exact.size
        info(s"$scale cosine LSH recall: $recall (${lsh.size}/${exact.size})")
        assert(recall >= 0.9, s"$scale recall too low: $recall")
      }
    }
  }

  test("semantic dedup drops later near-dups within a bucket only") {
    val vecs = Seq(
      (1L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),    // bucket 15, keeper
      (2L, Seq(1.1f, 1.05f, 0.95f, 1.0f)),  // bucket 15, ~dup of 1 → dropped
      (3L, Seq(-1.0f, 1.0f, 1.0f, 1.0f)),   // bucket 14: dist to 1 is 0.25
                                            // (≤ 0.30) but bucket differs → kept
      (4L, Seq(1.0f, 2.0f, -3.0f, 4.0f)),   // bucket 11, unrelated → kept
    ).toDF("vec_id", "vec")
    val kept = graft.ext.Dedup.semanticDedup(vecs, "vec_id", "vec",
        maxDist = 0.30, bucket = graft.ext.Dedup.signBuckets("vec", 4))
      .select("vec_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 3L, 4L)), kept.mkString(","))
    // schema passes through untouched
    val full = graft.ext.Dedup.semanticDedup(vecs, "vec_id", "vec",
      maxDist = 0.30, bucket = graft.ext.Dedup.signBuckets("vec", 4))
    assert(full.columns.toSeq == Seq("vec_id", "vec"))
    // oversized buckets refuse loudly (correctness needs every bucket)
    val err = intercept[IllegalArgumentException](
      graft.ext.Dedup.semanticDedup(vecs, "vec_id", "vec", maxDist = 0.30,
        bucket = graft.ext.Dedup.signBuckets("vec", 4), maxBucketRows = 1L))
    assert(err.getMessage.contains("re-bucket"), err.getMessage)
  }

  test("semantic dedup self-join reuses ONE exchange of the bucketed frame") {
    // the explicit __SB__ repartition makes both self-join branches share
    // an identical Exchange subtree — ReuseExchange must wire the second
    // branch to the first instead of shuffling the corpus twice
    val vecs = (1L to 64L).map(i =>
      (i, Seq(i.toFloat, (i % 7).toFloat, (i % 3).toFloat, 1.0f)))
      .toDF("vec_id", "vec")
    // at corpus scale the self-join is shuffled, not broadcast — force
    // that shape here, and execute so AQE finalizes its stage reuse
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val out = graft.ext.Dedup.semanticDedup(vecs, "vec_id", "vec",
        maxDist = 0.05, bucket = graft.ext.Dedup.signBuckets("vec", 4))
      out.collect()
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("ReusedExchange") ||
          "ShuffleQueryStage".r.findAllIn(plan).toSeq.nonEmpty &&
          "REPARTITION_BY_COL".r.findAllIn(plan).length <= 1,
        s"expected the pair-join branches to share one Exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("engine semantic dedup over IVF cells honors the within-cell contract") {
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-semdedup").toString
    val engine = new graft.api.Engine(spark, root)
    engine.makeTable("emb", sf("sf0.001", "embeddings"))
    engine.makeCoder("c", "emb", "embedding",
      graft.coder.CoderConfig(metric = "cosine", codebookSize = 4,
        numCodebooks = 2, batchSize = 256, numEpochs = 2))
    // build the index so the MATERIALIZED-cells branch (the production
    // path) is what this test exercises
    graft.index.Index.build(engine.store, "c", "emb", "embedding")
    val survivors = engine.semanticDedup("emb", "embedding", "c",
      maxDist = 0.30, idCol = "vec_id")
    // deterministic: a second run returns the identical survivor set
    val ids = survivors.select("vec_id").as[Long].collect().toSet
    val ids2 = engine.semanticDedup("emb", "embedding", "c",
      maxDist = 0.30, idCol = "vec_id").select("vec_id").as[Long].collect().toSet
    assert(ids == ids2)
    // contract: no surviving pair within one cell is closer than maxDist
    val coding = engine.store.loadCoding("c")
    val cells = survivors.withColumn("__cell__",
      graft.index.Index.assignExpr(col("embedding"), coding))
    val close = cells.as("a").join(cells.as("b"),
        col("a.__cell__") === col("b.__cell__") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("d", graft.functions.functions.vector_distance(
        col("a.embedding"), col("b.embedding"), "cosine"))
      .filter(col("d") <= 0.30).count()
    assert(close == 0L, "two same-cell survivors within maxDist remain")
    // bucketed drops are a subset of global (constant-bucket) drops
    val globalIds = graft.ext.Dedup.semanticDedup(sf("sf0.001", "embeddings"),
        "vec_id", "embedding", maxDist = 0.30, bucket = lit(0L))
      .select("vec_id").as[Long].collect().toSet
    assert(globalIds.subsetOf(ids))
    // staleness: growing the source WITHOUT resyncing the index must not
    // dedup the old snapshot — the new row has to show up in the output
    val extraRow = sf("sf0.001", "embeddings").limit(1)
      .withColumn("vec_id", lit(-1L))
      .withColumn("embedding", transform(col("embedding"), x => -x))
    engine.makeTable("emb",
      sf("sf0.001", "embeddings").unionByName(extraRow))
    val afterGrow = engine.semanticDedup("emb", "embedding", "c",
      maxDist = 0.30, idCol = "vec_id").select("vec_id").as[Long].collect().toSet
    assert(afterGrow.contains(-1L),
      "stale index snapshot used after the source changed")
    // SAME-COUNT content change (the round-4 verdict gap): overwrite with
    // identical ids but every embedding replaced by row 0's vector. A
    // count-equality freshness check cannot see this; the file-listing
    // stamp must, and the inline fallback then dedups everything down to
    // the single minimum id
    graft.index.Index.build(engine.store, "c", "emb", "embedding")
    assert(graft.index.Index.indexFresh(engine.store, "c", "emb", "embedding"))
    val base = sf("sf0.001", "embeddings")
    val constVec = base.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    engine.makeTable("emb",
      base.withColumn("embedding", typedLit(constVec)))
    assert(!graft.index.Index.indexFresh(engine.store, "c", "emb", "embedding"),
      "same-count rewrite must invalidate the stamp")
    val collapsed = engine.semanticDedup("emb", "embedding", "c",
      maxDist = 0.30, idCol = "vec_id").select("vec_id").as[Long].collect().toSet
    assert(collapsed == Set(base.agg(min("vec_id")).collect()(0).getLong(0)),
      s"stale cells used after a same-count rewrite: ${collapsed.size} survivors")
    engine.remove()
  }

  test("semantic dedup with IVF cells matches sign-bucket semantics shape") {
    // the scale path: bucket = any deterministic Column; a constant bucket
    // degenerates to global exact cosine dedup — cross-check against the
    // all-pairs baseline on real embeddings
    val emb = sf("sf0.001", "embeddings")
    val pairs = Dedup.nearDupPairsCosineExact(emb, "vec_id", "embedding", 0.30)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    // expected survivors: drop b of every (a < b) pair
    val dropped = pairs.map(_._2).toSet
    val want = emb.select("vec_id").as[Long].collect().filterNot(dropped).sorted
    val got = graft.ext.Dedup.semanticDedup(emb, "vec_id", "embedding",
        maxDist = 0.30, bucket = org.apache.spark.sql.functions.lit(0L))
      .select("vec_id").as[Long].collect().sorted
    assert(got.sameElements(want))
  }

  test("editDistancePairsBlocked == exact on planted edits: " +
      "substitution, insertion (shifted tail), deletion, equal strings, " +
      "empties, strings shorter than k+1") {
    val rows = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumpd"),      // 1 substitution of 1
      (3L, "the quickk brown fox jumps"),     // 1 insertion -> tail shifts
      (4L, "the quick brwn fox jumps"),       // 1 deletion
      (5L, "the quxck brxwn fox jumps"),      // 2 substitutions
      (6L, "a completely different sentence"),
      (7L, "the quick brown fox jumps"),      // exact dup of 1 (ed=0)
      (8L, ""), (9L, ""),                     // empty pair (ed=0)
      (10L, "ab"), (11L, "ba"),               // short strings, l <= k
      (12L, null.asInstanceOf[String])        // null text: excluded
    ).toDF("id", "t")
    val exact = Dedup.editDistancePairsExact(rows, "id", "t", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val blocked = Dedup.editDistancePairsBlocked(rows, "id", "t", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == exact,
      s"missing=${exact.diff(blocked)} extra=${blocked.diff(exact)}")
    // the planted relationships are all found with their distances
    assert(exact.contains((1L, 2L, 1L)), exact.toString)
    assert(exact.contains((1L, 3L, 1L)))
    assert(exact.contains((1L, 4L, 1L)))
    assert(exact.contains((1L, 5L, 2L)))
    assert(exact.contains((1L, 7L, 0L)))
    assert(exact.contains((8L, 9L, 0L)))
    assert(exact.contains((10L, 11L, 2L)))
    assert(!exact.exists(p => p._1 == 6L || p._2 == 6L))
    assert(!exact.exists(p => p._1 == 12L || p._2 == 12L))
  }

  test("editDistancePairsBlocked == exact on randomized strings " +
      "(property check over a small alphabet)") {
    val rnd = new scala.util.Random(1234)
    // small alphabet + short strings -> dense ed<=2 neighborhoods,
    // exercising every segment/shift combination
    val rows = (0L until 120L).map { i =>
      val len = 3 + rnd.nextInt(10)
      (i, Seq.fill(len)("abc" (rnd.nextInt(3))).mkString)
    }.toDF("id", "t")
    val exact = Dedup.editDistancePairsExact(rows, "id", "t", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    val blocked = Dedup.editDistancePairsBlocked(rows, "id", "t", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(blocked == exact,
      s"missing=${exact.diff(blocked)} extra=${blocked.diff(exact)}")
    assert(exact.nonEmpty, "fixture produced no close pairs")
  }

  test("editDistanceJoin == cross-join levenshtein filter on planted " +
      "edits, both length directions, disjoint and overlapping ids") {
    val leftRows = Seq(
      (1L, "the quick brown fox"),
      (2L, "zzzz unrelated zzzz"),
      (3L, "short"),
      (4L, "the quick brown foxes")) // longer than its corpus match
      .toDF("lid", "lt")
    val rightRows = Seq(
      (1L, "the quick brown fot"),   // same id as a left row: legit pair
      (10L, "the quick brown fox"),
      (11L, "shirt"),
      (12L, "totally different text"))
      .toDF("rid", "rt")
    val got = Dedup.editDistanceJoin(leftRows, "lid", "lt",
        rightRows, "rid", "rt", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    // reference: cross join + plain levenshtein
    val want = leftRows.join(rightRows)
      .select(col("lid"), col("rid"),
        levenshtein(col("lt"), col("rt")).cast("long").as("d"))
      .filter(col("d") <= 2).as[(Long, Long, Long)].collect().toSet
    assert(got == want, s"missing=${want.diff(got)} extra=${got.diff(want)}")
    assert(want.contains((1L, 10L, 0L)) && want.contains((1L, 1L, 1L)) &&
      want.contains((3L, 11L, 1L)) && want.contains((4L, 10L, 2L)),
      want.toString)
  }

  test("editDistancePairsBlocked refuses pathological segment collisions " +
      "via the candidate-volume guard") {
    val rows = (0L until 60L).map(i => (i, "identical boilerplate"))
      .toDF("id", "t")
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistancePairsBlocked(rows, "id", "t", maxDist = 2,
        maxCandidates = 100L)
    }
    assert(e.getMessage.contains("candidate volume"), e.getMessage)
    // under a budget that admits it, all C(60,2) pairs come back at 0
    val ok = Dedup.editDistancePairsBlocked(rows, "id", "t", maxDist = 2,
      maxCandidates = 100000L)
    assert(ok.count() == 60L * 59L / 2L)
  }
}

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("bm25Scores match a hand-computed reference; null docs excluded") {
    // corpus: 3 docs; term "cat" appears in docs 1 (tf=2, dl=4) and
    // 2 (tf=1, dl=2); doc 3 lacks it (dl=3); null doc excluded
    val docs = Seq(
      (1L, "cat dog cat bird"),
      (2L, "cat fish"),
      (3L, "dog bird fish"),
      (4L, null.asInstanceOf[String])
    ).toDF("id", "text")
    val got = TextAnalysis.bm25Scores(docs, "id", "text", Seq("cat"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L), got.toString)
    val n = 3.0; val df = 2.0; val avgdl = 9.0 / 3.0
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == r6(term(2.0, 4.0)), s"doc 1: ${got(1L)}")
    assert(got(2L) == r6(term(1.0, 2.0)), s"doc 2: ${got(2L)}")
    assert(got(3L) == 0.0, s"doc 3: ${got(3L)}")
    // more matches rank higher; shorter doc beats longer at equal tf
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    // multi-term scores are the sum of per-term contributions
    val multi = TextAnalysis.bm25Scores(docs, "id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(multi(3L) > 0.0 && multi(1L) > got(1L), multi.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Scores(docs, "id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25Scores(docs, "id", "text", Seq("Cat"))
    }
  }

  test("chunkDocuments: coverage, overlap, and edge cases") {
    val docs = Seq(
      (1L, "a" * 100),   // len < size: one whole chunk
      (2L, "b" * 200),   // len == size: exactly one chunk
      (3L, "0123456789" * 50), // 500 chars: n = ceil(460/160) = 3
      (4L, ""),          // empty: one empty chunk
      (5L, null.asInstanceOf[String]) // null: no chunks
    ).toDF("id", "text")
    val got = graft.ext.TextAnalysis
      .chunkDocuments(docs, "id", "text", size = 200, overlap = 40)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(got(1L) == Seq("a" * 100))
    assert(got(2L) == Seq("b" * 200))
    val full = "0123456789" * 50
    assert(got(3L) == Seq(
      full.substring(0, 200), full.substring(160, 360), full.substring(320, 500)))
    // consecutive chunks overlap by exactly 40 chars
    assert(got(3L)(0).takeRight(40) == got(3L)(1).take(40))
    assert(got(4L) == Seq(""))
    assert(!got.contains(5L), "null text must emit no chunks")
    // every char of every doc is covered by at least one chunk
    val rebuilt = got(3L).zipWithIndex
      .flatMap { case (c, i) => c.zipWithIndex.map { case (ch, j) => (i * 160 + j, ch) } }
      .toMap
    assert((0 until 500).forall(p => rebuilt(p) == full(p)), "coverage gap")
    intercept[IllegalArgumentException](
      graft.ext.TextAnalysis.chunkDocuments(docs, "id", "text", 100, 100))
  }

  test("language id on hand-written samples") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy for hours", "en"),
      (2L, "el perro corre en la casa y los gatos del barrio", "es"),
      (3L, "der Hund und die Katze sind nicht mit dem Auto", "de"),
      (4L, "le chat est dans la maison et les oiseaux pour toujours", "fr"),
      (5L, "今天天气很好我们一起去公园散步吧这是一个测试", "zh"),
      (6L, "", "und"),
    ).toDF("id", "text", "want")
    val got = samples.withColumn("pred", TextAnalysis.langId($"text"))
      .select("id", "pred", "want").collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"doc ${r.getLong(0)}: ${r.getString(1)} != ${r.getString(2)}")
    }
  }

  test("compression ratio orders repetitive < prose < random; edges score 1.0") {
    val rnd = new scala.util.Random(7)
    val docs = Seq(
      (1L, "spam " * 400),                                   // repetitive
      (2L, "The quick brown fox jumps over the lazy dog. " * 40), // prose-ish
      (3L, Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString), // random
      (4L, ""), (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = graft.ext.TextAnalysis.compressionRatios(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L), r)
    assert(r(1L) < 0.1, s"400x-repeated token must compress hard: ${r(1L)}")
    assert(r(4L) == 1.0 && r(5L) == 1.0)
    // deterministic across runs
    val again = graft.ext.TextAnalysis.compressionRatios(docs, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(again == r)
  }

  test("winnowing fingerprints match an independent reimplementation") {
    // plain-Scala winnowing, written without looking at the Column code:
    // hash every k-gram (base-257 poly mod 1e9+7), min per w-window, dedup
    def winnow(text: String, k: Int, w: Int): Set[Long] = {
      val c = text.toLowerCase.toCharArray
      if (c.length < k) Set.empty
      else {
        val M = 1000000007L
        val h = (0 to c.length - k).map { i =>
          var acc = 0L
          (0 until k).foreach(j => acc = (acc * 257 + c(i + j)) % M)
          acc
        }
        val nw = math.max(h.length - w + 1, 1)
        (0 until nw).map(t => h.slice(t, t + w).min).toSet
      }
    }
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "a different text with the quick brown fox inside it"),
      (3L, "the QUICK brown fox jumps over the lazy dog"), // case-dup of 1
      (4L, "tiny"),                                        // < k chars: no fps
      (5L, "zzzz completely unrelated content here zzzz"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 5, window = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val want = winnow(text, 5, 4)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id")
    }
    assert(!got.contains(4L), "sub-k docs yield no fingerprints")
    assert(got(1L) == got(3L), "fingerprints are case-insensitive")
    // winnowing guarantee: a shared run of ≥ k+w−1 chars shares a fp
    assert(got(1L).intersect(got(2L)).nonEmpty,
      "docs sharing 'the quick brown fox' must share a fingerprint")
    assert(got(1L).intersect(got(5L)).isEmpty,
      "unrelated docs should not collide at this scale")
  }

  test("winnowing hashes code points: lead-byte-sharing scripts don't collide") {
    // α and β share the UTF-8 lead byte 0xCE — the old ascii()-based hash
    // collapsed them to identical fingerprint sets; code-point hashing
    // (mirroring the oracle's unicode()) must distinguish them, and a
    // shared CJK run must still share a fingerprint
    val docs = Seq(
      (1L, "ααααααααααααα"),
      (2L, "βββββββββββββ"),
      (3L, "前文 机器学习模型训练数据 后文"),
      (4L, "别的 机器学习模型训练数据 其他"),
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", k = 5, window = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L).intersect(got(2L)).isEmpty,
      "distinct Greek letters must hash to distinct fingerprints")
    assert(got(3L).intersect(got(4L)).nonEmpty,
      "docs sharing a CJK run of >= k+w-1 chars must share a fingerprint")
    // parity with an independent code-point reimplementation
    def winnowCp(text: String, k: Int, w: Int): Set[Long] = {
      val c = text.toLowerCase.codePoints().toArray
      if (c.length < k) Set.empty
      else {
        val M = 1000000007L
        val h = (0 to c.length - k).map { i =>
          var acc = 0L
          (0 until k).foreach(j => acc = (acc * 257 + c(i + j)) % M)
          acc
        }
        val nw = math.max(h.length - w + 1, 1)
        (0 until nw).map(t => h.slice(t, t + w).min).toSet
      }
    }
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty[Long]) == winnowCp(text, 5, 4), s"doc $id")
    }
  }

  test("overlap pairs find shared runs and ignore corpus-wide boilerplate") {
    val boiler = "terms of service apply to all documents in this corpus. "
    val shared = "the five boxing wizards jump quickly over the frozen river tonight"
    val docs = Seq(
      (1L, boiler + shared + " alpha ending one"),
      (2L, boiler + "totally different middle body here " + shared),
      (3L, boiler + "nothing in common with the others at all, kumquat xylophone"),
      (4L, boiler + "fourth doc, also unique: quartz vortex glyph jousting"),
    ).toDF("doc_id", "text")
    // maxDocFreq 2 drops the boilerplate fps (df = 4) up front
    val pairs = TextAnalysis.overlapPairs(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 5, maxDocFreq = 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"only the docs sharing the long run must pair: $pairs")

    // durable checkpoint: identical pairs, requires a checkpoint dir
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      intercept[IllegalArgumentException] {
        TextAnalysis.overlapPairs(docs, "doc_id", "text",
          k = 5, window = 4, minShared = 5, maxDocFreq = 2L,
          durableCheckpoint = true)
      }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val durable = TextAnalysis.overlapPairs(docs, "doc_id", "text",
        k = 5, window = 4, minShared = 5, maxDocFreq = 2L,
        durableCheckpoint = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(durable == pairs, s"durable-checkpoint pairs differ: $durable")
  }

  test("token count edge cases") {
    val df = Seq((1L, "a b  c"), (2L, ""), (3L, "   "), (4L, "single")).toDF("id", "text")
    val got = df.select($"id", TextAnalysis.tokenCount($"text").as("n")).as[(Long, Int)].collect().toMap
    assert(got(1L) == 3 && got(2L) == 0 && got(3L) == 0 && got(4L) == 1)
  }

  test("repetition ratio: hand-computed bigram duplication fractions") {
    val df = Seq(
      (1L, "a b a b a"),      // bigrams: ab ba ab ba -> 4 total, 2 distinct
      (2L, "w x y z"),        // all distinct -> 0.0
      (3L, "spam spam spam"), // bigrams: ss ss -> 2 total, 1 distinct
      (4L, "one"),            // < n tokens -> 0.0 over 0 ngrams
      (5L, "")).toDF("id", "text")
    val got = TextAnalysis.repetitionRatio(df, "id", "text", 2)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (0.5, 4L), s"got ${got(1L)}")
    assert(got(2L) == (0.0, 3L))
    assert(got(3L) == (0.5, 2L))
    assert(got(4L) == (0.0, 0L))
    assert(got(5L) == (0.0, 0L))
  }

  test("fingerprint is whitespace/case-normalized and deterministic") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, " hello   world "),
      (4L, "hello worlds")).toDF("id", "text")
    val fp = df.select($"id", TextAnalysis.fingerprint($"text").as("fp")).as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L) && fp(2L) == fp(3L))
    assert(fp(4L) != fp(1L))
    assert(fp.values.forall(_ >= 0L))
  }

  test("quality score in [0,1] and favors normal text over junk") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was a good day for everyone in the park " * 3),
      (2L, "!!!! ???? ;;;; @@@@ #### $$$$ %%%% ^^^^"),
    ).toDF("id", "text")
    val q = TextAnalysis.qualityScore(df, "text").select($"id", $"quality").as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L), s"normal text must outscore junk: $q")
  }
}

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("merge learning matches the hand-computed Sennrich example") {
    // word freqs: low×5, lower×2, newest×6, widest×3. Hand-derived pair
    // statistics give merges, in order:
    //   (e,s)=9 -> es; (es,t)=9 -> est; (l,o)=7 (tie with (o,w), lex);
    //   (lo,w)=7 -> low; (e,w)=6 (tie with (n,e),(w,est), lex)
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val model = graft.ext.Bpe.train(docs, "text", numMerges = 5)
    assert(model.merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w")), s"got ${model.merges}")

    // encode applies merges lowest-rank-first
    assert(model.encodeWord("lowest") == Seq("low", "est"))
    assert(model.encodeWord("newer") == Seq("n", "ew", "e", "r"))
    assert(model.encodeWord("low") == Seq("low"))
    assert(model.encodeWord("xyz") == Seq("x", "y", "z"))
    assert(model.countTokens("lowest newer") == 6)
    assert(model.countTokens(null) == 0)
    // pre-tokenizer: punctuation is its own word, digits split from letters
    assert(model.encode("low-cost 42x") ==
      Seq("low", "-", "c", "o", "s", "t", "4", "2", "x"))

    // astral symbols stay whole: one token per CODE POINT, not per
    // UTF-16 unit (the granularity the character-indexed DuckDB oracle
    // sees — same contract as Dedup.hash64)
    assert(model.encodeWord("a𝄞b") == Seq("a", "𝄞", "b"))

    // json round-trip
    val back = graft.ext.Bpe.fromJson(model.toJson)
    assert(back.merges == model.merges)

    // the distributed token-count column agrees with the driver encode
    val counted = docs.select(col("doc_id"),
        graft.ext.Bpe.tokenCountUdf(model)(col("text")).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(counted(1L) == 5)      // 5 × [low]
    assert(counted(3L) == 18)     // 6 × [n, ew, est]
  }

  test("training is deterministic and bounded; exhausting merges stops early") {
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val m1 = graft.ext.Bpe.train(docs, "text", numMerges = 100)
    val m2 = graft.ext.Bpe.train(docs, "text", numMerges = 100)
    assert(m1.merges == m2.merges)
    // only pairs (a,a)=2 and (a,b)=1 exist; after both merge nothing is left
    assert(m1.merges.size <= 3, s"runaway merges: ${m1.merges}")
    assert(m1.merges.head == ("a", "a"))
  }

  test("engine persists and serves BPE models from the store") {
    val root = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val engine = new graft.api.Engine(spark, root)
    val docs = Seq((1L, "low low lower lowest"), (2L, "newest newest widest"))
      .toDF("doc_id", "text")
    engine.makeTable("docs", docs)
    val trained = engine.trainBpe("tok", "docs", "text", numMerges = 8)
    assert(engine.listBpeModels() == Seq("tok"))
    val loaded = engine.store.loadBpeModel("tok")
    assert(loaded.merges == trained.merges)
    val counts = engine.bpeTokenCounts("docs", "doc_id", "text", "tok")
      .as[(Long, Long)].collect().toMap
    // distributed counts agree with the driver-side encode
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(counts(id) == trained.countTokens(text).toLong, s"doc $id")
    }
    engine.store.dropBpeModel("tok")
    assert(engine.listBpeModels().isEmpty)
    engine.remove()
  }
}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("aHash is exact on the known pattern and stable across lossless codecs") {
    val img = Multimodal.testPattern(16, 16)
    // hand/Python-derived constant for the (x,y) pattern (see the
    // media_phash oracle comment)
    assert(Multimodal.aHash64(img) == 0xfefcf8f0e0c08000L)
    val viaPng = Multimodal.aHash64(
      Multimodal.decodeImage(Multimodal.encodeImage(img, "png")))
    val viaBmp = Multimodal.aHash64(
      Multimodal.decodeImage(Multimodal.encodeImage(img, "bmp")))
    assert(viaPng == viaBmp && viaPng == 0xfefcf8f0e0c08000L,
      "lossless codecs must preserve the hash exactly")
    // lossy JPEG moves block means a little, the hash only a few bits
    val viaJpg = Multimodal.aHash64(
      Multimodal.decodeImage(Multimodal.encodeImage(img, "jpg")))
    val dJpg = java.lang.Long.bitCount(viaPng ^ viaJpg)
    assert(dJpg <= 8, s"jpeg re-encode moved $dJpg hash bits")
    // a genuinely different image is far away
    val inverted = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      inverted.setRGB(x, y, ~img.getRGB(x, y) & 0xFFFFFF)
    val dInv = java.lang.Long.bitCount(viaPng ^ Multimodal.aHash64(inverted))
    assert(dInv > 16, s"inverted image only $dInv bits away")
  }

  test("audio fingerprint is exact on the square wave and noise-tolerant") {
    val sig = Multimodal.testSignal()
    // constant derived independently in Python (see media_afp oracle)
    assert(Multimodal.audioFingerprint64(sig) == 5311674074794632411L)
    // pcm16 wav round-trip is lossless => identical fingerprint
    val rt = graft.ext.Wav.decode(graft.ext.Wav.encode(sig))
    assert(Multimodal.audioFingerprint64(rt) == 5311674074794632411L)
    // mild additive noise flips few bits (only adjacent-frame energy
    // ORDER matters); a different signal is far away
    val noisy = sig.samples(0).zipWithIndex.map { case (v, i) =>
      (v + (if (i % 3 == 0) 25 else -25)).toShort
    }
    val dNoise = java.lang.Long.bitCount(5311674074794632411L ^
      Multimodal.audioFingerprint64(graft.ext.Wav.Audio(8000, Array(noisy))))
    assert(dNoise <= 8, s"noise flipped $dNoise bits")
    val other = Array.tabulate(8000)(i =>
      ((if ((i / 173) % 2 == 0) 1 else -1) * (500 + (i % 53) * 150)).toShort)
    val dOther = java.lang.Long.bitCount(5311674074794632411L ^
      Multimodal.audioFingerprint64(graft.ext.Wav.Audio(8000, Array(other))))
    assert(dOther > 12, s"distinct signal only $dOther bits away")
  }

  test("image near-dup pairs find re-encodes, not distinct images") {
    val img = Multimodal.testPattern(16, 16)
    val other = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      other.setRGB(x, y, ~img.getRGB(x, y) & 0xFFFFFF)
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodeImage(img, "png"),
        Multimodal.MediaMeta("image", 16, 16, 0)),
      Multimodal.MediaRow(2L, Multimodal.encodeImage(img, "bmp"),
        Multimodal.MediaMeta("image", 16, 16, 0)),
      Multimodal.MediaRow(3L, Multimodal.encodeImage(other, "png"),
        Multimodal.MediaMeta("image", 16, 16, 0)),
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(rows, maxHamming = 3, bands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the re-encode pair: $pairs")
  }

  test("media plumbing: schema, deterministic stub features, frame sampling") {
    val docs = sf("sf0.001", "documents").limit(50)
    val media = Multimodal.mediaFromText(docs, "doc_id", "text")
    val mrows = media.collect()
    val lensOf = mrows.map(m => m.media_id -> m.payload.length).toMap
    val widthOf = mrows.map(m => m.media_id -> m.meta.width).toMap
    val feats = Multimodal.extractFeatures(media, dim = 16)
    val rows = feats.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 16))
    assert(rows.forall(_.modality == "image"))
    // deterministic: second run identical
    val rows2 = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(rows.sortBy(_.media_id).zip(rows2.sortBy(_.media_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })

    // resize: narrow map, width shrinks, payload shrinks proportionally
    val resized = Multimodal.resize(media, targetWidth = 8).collect()
    resized.foreach { m =>
      assert(m.meta.width <= 8)
      assert(m.payload.length <= 8 * math.max(1, lensOf(m.media_id) / math.max(1, widthOf(m.media_id))) + 8)
    }

    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    val byId = frames.collect().groupBy(_.media_id)
    val lens = media.collect().map(m => m.media_id -> m.payload.length).toMap
    byId.foreach { case (id, fs) =>
      val totalChunks = math.ceil(lens(id) / 64.0).toInt
      val want = (0 until totalChunks).count(_ % 2 == 0)
      assert(fs.length == want, s"media $id: ${fs.length} != $want")
      assert(fs.forall(_.frame.length <= 64))
    }
  }

  test("jdk imageio: png lossless round-trip, jpeg lossy decode, real resize") {
    // PNG is lossless: every pixel of the pattern must survive exactly
    val img = Multimodal.testPattern(16, 16)
    val png = Multimodal.encodeImage(img, "png")
    val backP = Multimodal.decodeImage(png)
    assert(backP.getWidth == 16 && backP.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert((backP.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
        s"png pixel ($x,$y) mismatch")
    // JPEG is lossy: dims exact, channel content close (smooth gradient)
    val jpg = Multimodal.encodeImage(img, "jpg")
    val backJ = Multimodal.decodeImage(jpg)
    assert(backJ.getWidth == 16 && backJ.getHeight == 16)
    val meanRed = (for (y <- 0 until 16; x <- 0 until 16)
      yield (backJ.getRGB(x, y) >> 16) & 0xFF).sum / 256.0
    assert(math.abs(meanRed - 120.0) < 10.0, s"jpeg mean red $meanRed far from 120")
    // undecodable bytes throw instead of silently passing
    intercept[IllegalArgumentException](
      Multimodal.decodeImage(Array[Byte](1, 2, 3, 4)))

    // distributed: the oracle-checked constants hold for every row
    val docs = sf("sf0.001", "documents").limit(20)
    val checked = Multimodal.compressedCodecCheck(docs, "doc_id").collect()
    assert(checked.length == 20)
    checked.foreach { r =>
      assert(r.getInt(1) == 16 && r.getInt(2) == 16 && r.getLong(3) == 30720L)
      assert(r.getInt(4) == 16 && r.getInt(5) == 16 && r.getBoolean(6))
    }

    // real compressed resize: decode -> nearest-neighbor -> re-encode
    val media = docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => Multimodal.MediaRow(id, png,
        Multimodal.MediaMeta("image", 16, 16, 0)))
    val resized = Multimodal.resizeCompressed(media, targetWidth = 8).collect()
    resized.foreach { m =>
      assert(m.meta.width == 8 && m.meta.height == 8)
      val d = Multimodal.decodeImage(m.payload)
      assert(d.getWidth == 8 && d.getHeight == 8)
    }

    // compressed featurize: dims exact, channel means equal the lossless
    // pixel grid's means
    var rs = 0L; var gs = 0L; var bs = 0L
    for (y <- 0 until 16; x <- 0 until 16) {
      val p = img.getRGB(x, y)
      rs += (p >> 16) & 0xFF; gs += (p >> 8) & 0xFF; bs += p & 0xFF
    }
    val cfeats = Multimodal.extractFeaturesCompressed(media).collect()
    assert(cfeats.length == 20)
    cfeats.foreach { f =>
      assert(f.n_bytes == png.length)
      assert(f.features.length == 5)
      assert(f.features(0) == 16f && f.features(1) == 16f)
      assert(math.abs(f.features(2) - rs / 256.0) < 1e-4, s"r ${f.features(2)}")
      assert(math.abs(f.features(3) - gs / 256.0) < 1e-4, s"g ${f.features(3)}")
      assert(math.abs(f.features(4) - bs / 256.0) < 1e-4, s"b ${f.features(4)}")
    }
  }
}

class StreamsSpec extends SparkSuite {
  import spark.implicits._

  test("editDistGateForEachBatch: streamed arrivals flag against the " +
      "corpus exactly as the batch join, across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val corpus = Seq((100L, "the quick brown fox jumps"),
      (101L, "an entirely different reference"))
      .toDF("ref_id", "ref_text")
    val batch1 = Seq((1L, "the quick brown fox jumpz"),
      (2L, "no relation to anything here"))
    val batch2 = Seq((3L, "the quick brown fox jump"),
      (4L, "an entirely different reference"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val gate = graft.streaming.Streams.editDistGateForEachBatch(
      corpus, "ref_id", "ref_text", "doc_id", "text", maxDist = 2,
      sink = df => got ++= df.as[(Long, Long, Long)].collect())
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(gate).outputMode("update").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val expected = graft.ext.Dedup.editDistanceJoin(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text",
        corpus, "ref_id", "ref_text", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.toSet == expected,
      s"missing=${expected.diff(got.toSet)} extra=${got.toSet.diff(expected)}")
    assert(expected == Set((1L, 100L, 1L), (3L, 100L, 1L), (4L, 101L, 0L)),
      expected.toString)
  }

  test("windowed event stats on batch match a manual groupBy") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 100L, "click", 1.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), 100L, "click", 2.0),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), 101L, "view", 3.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Streams.windowedEventStats(events, "1 hour").collect()
    assert(out.length == 2)
    val clickRow = out.find(_.getAs[String]("event_type") == "click").get
    assert(clickRow.getAs[Long]("cnt") == 2L)
    assert(clickRow.getAs[Double]("sum_value") == 3.0)
  }

  test("windowed stats run as a real stream (incremental, with watermark)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = Streams.windowedEventStatsStreaming(df, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_test").outputMode("complete").start()
    try {
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "click", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:35:00"), 2L, "click", 2.0))
      q.processAllAvailable()
      val got = spark.table("win_test").collect()
      assert(got.length == 1 && got(0).getAs[Long]("cnt") == 2L)
    } finally q.stop()
  }

  test("sessionize splits on gaps strictly longer than gapSecs") {
    val events = Seq(
      // user 100: two events 300s apart (one session), then a 1801s gap
      (100L, 1000L, 1.5), (100L, 1300L, 2.5), (100L, 3101L, 4.0),
      // user 101: one event
      (101L, 2000L, 1.0),
      // user 102: exactly-gap silence (1800s) must still merge
      (102L, 0L, 1.0), (102L, 1800L, 1.0),
    ).toDF("user_id", "ts_sec", "value")
    val out = Streams.sessionize(events, gapSecs = 1800L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start")) -> r).toMap
    assert(out.size == 4, s"expected 4 sessions, got ${out.keys}")
    val s1 = out((100L, 1000L))
    assert(s1.getAs[Long]("session_events") == 2
      && s1.getAs[Double]("session_value") == 4.0
      && s1.getAs[Double]("session_secs") == 300.0)
    val s2 = out((100L, 3101L))
    assert(s2.getAs[Long]("session_events") == 1 && s2.getAs[Double]("session_secs") == 0.0)
    assert(out((101L, 2000L)).getAs[Long]("session_events") == 1)
    assert(out((102L, 0L)).getAs[Long]("session_events") == 2,
      "events exactly gapSecs apart must merge (touching windows)")
  }

  test("sessionize matches the lag-gap cumulative-sum formulation on testdata") {
    import org.apache.spark.sql.expressions.Window
    val events = SparkEntry.tblEvents(spark, "/root/testdata/sf0.001")
    val got = Streams.sessionize(events, gapSecs = 1800L)
      .select("user_id", "session_start", "session_events")
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
    val want = events
      .withColumn("brk", when(col("ts_sec") - lag("ts_sec", 1).over(w) > 1800L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_sec").as("session_start"), count(lit(1)).as("session_events"))
      .select("user_id", "session_start", "session_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming sessionize: a >gap silence splits sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "value")
    val q = Streams.sessionizeStreaming(df, gapSecs = 1800L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_test").outputMode("append").start()
    try {
      val t = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
      // burst 1, then silence > gap, then burst 2
      mem.addData((t(1000L), 7L, 1.0), (t(1300L), 7L, 2.0))
      q.processAllAvailable()
      mem.addData((t(4000L), 7L, 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close session 2
      mem.addData((t(100000L), 8L, 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_test").filter($"user_id" === 7L)
        .select("session_start", "session_events", "session_value")
        .as[(java.sql.Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
      assert(got.length == 2, s"expected 2 sessions: ${got.mkString(",")}")
      assert(got(0)._2 == 2 && got(0)._3 == 3.0)
      assert(got(1)._2 == 1 && got(1)._3 == 3.0)
    } finally q.stop()
  }

  test("stream-stream attribution join: stream == batch, state bounded by range") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
    // views: (id, user, ts); clicks likewise. Click 20 at t=1500 matches
    // views 1 (t=1000) and 2 (t=1400) of user 7; click 21 at t=9000 is
    // outside every view's 3600 s window; click 22 is another user.
    val viewRows = Seq((1L, 7L, t(1000L)), (2L, 7L, t(1400L)), (3L, 8L, t(1200L)))
    val clickRows = Seq((20L, 7L, t(1500L)), (21L, 7L, t(9000L)), (22L, 8L, t(1300L)))

    val vMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = Streams.attributionJoin(
        vMem.toDF().toDF("event_id", "user_id", "ts"),
        cMem.toDF().toDF("event_id", "user_id", "ts"),
        idCol = "event_id", keyCol = "user_id", tsCol = "ts",
        maxDelaySecs = 3600L, watermark = "0 seconds")
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      vMem.addData(viewRows: _*); cMem.addData(clickRows: _*)
      q.processAllAvailable()
      val got = spark.table("attr_test")
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      val want = Streams.attributionJoin(
          viewRows.toDF("event_id", "user_id", "ts"),
          clickRows.toDF("event_id", "user_id", "ts"),
          idCol = "event_id", keyCol = "user_id", tsCol = "ts",
          maxDelaySecs = 3600L)
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(want == Set((7L, 1L, 20L), (7L, 2L, 20L), (8L, 3L, 22L)))
      assert(got == want, s"stream $got vs batch $want")
    } finally q.stop()
  }

  test("outer attribution join: never-clicked views emit with null clicks") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val t = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
    val vMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cMem = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val q = Streams.attributionJoin(
        vMem.toDF().toDF("event_id", "user_id", "ts"),
        cMem.toDF().toDF("event_id", "user_id", "ts"),
        idCol = "event_id", keyCol = "user_id", tsCol = "ts",
        maxDelaySecs = 3600L, watermark = "0 seconds",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_outer_test")
      .outputMode("append").start()
    try {
      // view 1 gets a click; view 2 never does
      vMem.addData((1L, 7L, t(1000L)), (2L, 8L, t(1000L)))
      cMem.addData((20L, 7L, t(1500L)))
      q.processAllAvailable()
      // advance BOTH watermarks far past view 2's window so the outer
      // side can conclude no click will ever arrive
      vMem.addData((3L, 9L, t(100000L)))
      cMem.addData((21L, 9L, t(100000L)))
      q.processAllAvailable()
      val got = spark.table("attr_outer_test")
        .select("user_id", "view_id", "click_id")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(got.contains((7L, 1L, Some(20L))), got)
      assert(got.contains((8L, 2L, None)),
        s"unmatched view must emit with null click: $got")
    } finally q.stop()
  }

  test("stateful sessionize: emits on in-stream gap and on event-time timeout") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long, Double)]
    val df = mem.toDF().toDF("ts", "user_id", "ts_sec", "value")
    val q = Streams.sessionizeStateful(df, gapSecs = 1800L, watermark = "0 seconds")
      .toDF().writeStream.format("memory").queryName("sess_state_test")
      .outputMode("append").start()
    try {
      val t = (sec: Long) => new java.sql.Timestamp(sec * 1000L)
      mem.addData((t(1000L), 7L, 1000L, 1.0), (t(1300L), 7L, 1300L, 2.0))
      q.processAllAvailable()
      // in-stream gap: this event both closes session 1 and opens session 2
      mem.addData((t(4000L), 7L, 4000L, 3.0))
      q.processAllAvailable()
      // watermark far past session 2's end -> timeout emits it
      mem.addData((t(100000L), 8L, 100000L, 0.0))
      q.processAllAvailable()
      mem.addData((t(200000L), 9L, 200000L, 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_state_test").filter($"user_id" === 7L)
        .select("session_start", "session_events", "session_value", "session_secs")
        .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
      assert(got.length == 2, s"expected 2 sessions: ${got.mkString(",")}")
      assert(got(0) == ((1000L, 2L, 3.0, 300.0)))
      assert(got(1) == ((4000L, 1L, 3.0, 0.0)))
    } finally q.stop()
  }
}

class ScaleSpec extends SparkSuite {
  import spark.implicits._

  test("salted join equals plain join") {
    val li = sf("sf0.001", "lineitem").withColumnRenamed("l_partkey", "p_partkey")
    val part = sf("sf0.001", "part")
    val plain = li.join(part, "p_partkey")
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    val salted = graft.ext.Scale.saltedJoin(li, part, "p_partkey", 8)
      .groupBy("p_brand").count().as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("two-phase count equals plain count") {
    val li = sf("sf0.001", "lineitem")
    val plain = li.groupBy("l_suppkey").count()
      .as[(Long, Long)].collect().toMap
    val two = graft.ext.Scale.twoPhaseCount(li, "l_suppkey", 8)
      .as[(Long, Long)].collect().toMap
    assert(two == plain)
  }

  test("shuffled batches partition the table deterministically by seed") {
    import graft.ext.Scale
    val df = spark.range(500L).toDF("id")
    val b1 = Scale.shuffledBatches(df, size = 50, seed = 7L)
      .as[(Long, Long)].collect().toMap
    // every row lands in exactly one batch within [0, ceil(500/50))
    assert(b1.size == 500 && b1.values.forall(b => b >= 0 && b < 10))
    // sizes concentrate around `size` (hash sharding: size ± O(sqrt size))
    val sizes = b1.values.groupBy(identity).values.map(_.size)
    assert(sizes.sum == 500 && sizes.forall(s => s > 20 && s < 100), sizes)
    // same seed reproduces the exact assignment; a different seed moves rows
    val b1again = Scale.shuffledBatches(df, size = 50, seed = 7L)
      .as[(Long, Long)].collect().toMap
    assert(b1again == b1)
    val b2 = Scale.shuffledBatches(df, size = 50, seed = 8L)
      .as[(Long, Long)].collect().toMap
    assert(b2 != b1)
  }

  test("imapBatches delivers every batch whole, exactly once") {
    import graft.ext.Scale
    val df = spark.range(500L).toDF("id")
    val perCall = Scale.imapBatches[(Long, Long, Boolean)](df, size = 50, seed = 7L) {
      (batchId, rows) =>
        val idx = rows.head.fieldIndex(Scale.BatchCol)
        Seq((batchId, rows.size.toLong, rows.forall(_.getLong(idx) == batchId)))
    }.collect()
    assert(perCall.map(_._1).distinct.length == perCall.length,
      "a batch must reach exactly one invocation")
    assert(perCall.map(_._2).sum == 500L)
    assert(perCall.forall(_._3), "an invocation must only see its own batch")
  }
}

class TemporalSpec extends SparkSuite {
  import spark.implicits._

  test("resampleLocf: grid alignment, carry-forward, sub-step keys dropped") {
    val obs = Seq(
      (1L, 95L, 1.0), (1L, 210L, 2.0), (1L, 455L, 3.0), // key 1: 95..455
      (2L, 120L, 9.0), (2L, 130L, 9.5)                  // key 2: inside one step
    ).toDF("k", "ts_sec", "v")
    val got = graft.ext.Temporal.resampleLocf(obs, "k", "ts_sec", "v", 100L)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    // key 1 grid: 100, 200, 300, 400 — LOCF 1.0, 1.0, 2.0, 2.0
    // key 2: range [120, 130] contains no multiple of 100 → no rows
    assert(got == Seq((1L, 100L, 1.0), (1L, 200L, 1.0),
      (1L, 300L, 2.0), (1L, 400L, 2.0)), got)
  }

  test("resampleLinear: exact hit takes the observation, between points interpolate") {
    val obs = Seq((1L, 100L, 10.0), (1L, 300L, 30.0), (1L, 450L, 0.0))
      .toDF("k", "ts_sec", "v")
    val got = graft.ext.Temporal.resampleLinear(obs, "k", "ts_sec", "v", 100L)
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    // 100 → exact 10.0; 200 → halfway 20.0; 300 → exact 30.0;
    // 400 → 30 + (0-30)*(100/150) = 10.0
    assert(got == Seq((1L, 100L, 10.0), (1L, 200L, 20.0),
      (1L, 300L, 30.0), (1L, 400L, 30.0 + (0.0 - 30.0) * (100.0 / 150.0))), got)
  }

  test("asof join picks latest right row at or before left ts, null when none") {
    val left = Seq((1L, 100L, 10L), (2L, 100L, 25L), (3L, 200L, 5L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((100L, 10L, 1.0), (100L, 20L, 2.0), (100L, 30L, 3.0))
      .toDF("user_id", "click_ts", "v")
    val got = graft.ext.Temporal.asofJoin(left, right, "user_id", "ts", "click_ts", Seq("v"))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got(1L) == Some(1.0))  // ts=10 matches click_ts=10 (inclusive)
    assert(got(2L) == Some(2.0))  // ts=25 -> latest click_ts<=25 is 20
    assert(got(3L) == None)       // user 200 has no clicks
  }

  test("bucketed asof join equals the global asof join — hot key, carries " +
      "across empty buckets, left rows before any right row") {
    val rnd = new scala.util.Random(42)
    // hot key 0 holds 3/4 of the rows; right ts globally unique (13 is
    // coprime to 4096), so the per-(key,ts) tie precondition holds
    val right = (0 until 400).map { i =>
      val k = if (i % 4 != 0) 0L else (i % 7).toLong
      (k, (i * 13 + 7) % 4096L, rnd.nextDouble())
    }.toDF("user_id", "click_ts", "v")
    val left = (0 until 300).map { i =>
      (i.toLong, if (i % 3 != 0) 0L else (i % 7).toLong,
        rnd.nextInt(4600).toLong)
    }.toDF("event_id", "user_id", "ts")
    val want = graft.ext.Temporal.asofJoin(left, right,
        "user_id", "ts", "click_ts", Seq("v"))
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // tiny buckets (many carries), mid, and one-bucket degenerate case
    for (b <- Seq(64L, 500L, 10000L)) {
      val got = graft.ext.Temporal.asofJoinBucketed(left, right,
          "user_id", "ts", "click_ts", Seq("v"), bucketSecs = b)
        .select("event_id", "v").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(got == want, s"bucketSecs=$b diverged from global asof")
    }
    // the event-scale windows partition on (key, bucket), not key alone
    val plan = graft.ext.Temporal.asofJoinBucketed(left, right,
        "user_id", "ts", "click_ts", Seq("v"), 64L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__bkt__"),
      "expected the asof carry window to be bucketed")
  }

  test("range join matches BETWEEN semantics as an equi-join on bins") {
    val values = Seq((1L, 5.0), (2L, 10.0), (3L, 10.5), (4L, -3.0), (5L, 99.0))
      .toDF("vid", "v")
    rangeJoinBody(values)
  }

  test("rollingAnomalies: hand-computed three-sigma flags, cold start, " +
      "current row excluded from its own window") {
    // key A: 12 steady values 100.0 then a spike 200.0 then steady.
    // At the spike (id 13): n=12, S=1_200_000, Q=1.2e11 (scaled ×1000)
    // → variance 0 → rhs 0, lhs≠0 → flagged. The value AFTER the spike
    // (id 14, back to 100.0): window now holds the spike, mean pulled
    // up, but |x−μ| = (S/n − x) small vs σ — hand-check below says NOT
    // flagged at t=3. Cold start: ids 1..10 have n<10 → unflaggable.
    val rows = ((1 to 12).map(i => ("A", i.toLong, 100.0)) :+
      (("A", 13L, 200.0)) :+ (("A", 14L, 100.0))) ++
      (1 to 15).map(i => ("B", i.toLong, 50.0)) // constant key: no flags
    val df = rows.toDF("k", "ts", "v")
    val got = graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v",
        window = 20, minN = 10L, t = 3, scale = 1000.0)
      .select("k", "ts", "n").as[(String, Long, Long)].collect().toSet
    // id 13: window = twelve 100000s → n=12, S=1.2e6, Q=1.2e11;
    // lhs = 12·2e5·... n·x−S = 2.4e6−1.2e6 = 1.2e6, lhs² = 1.44e12;
    // rhs = 9·(12·1.2e11 − 1.44e12) = 0 → flagged (spike off a
    // zero-variance window). id 14: window = ids 1..13, n=13,
    // x=1e5, S=1.4e6, Q=1.6e11; lhs² = (1.3e6−1.4e6)² = 1e10;
    // rhs = 9·(2.08e12 − 1.96e12) = 1.08e12 > 1e10 → not flagged.
    assert(got == Set(("A", 13L, 12L)), got.toString)
  }

  test("rollingAnomalies fails loudly past the decimal(38,0) exactness " +
      "bound instead of silently dropping true anomalies") {
    // |floor(v·scale)| beyond 5e18/(window·t) could overflow a
    // decimal(38,0) product into NULL and vanish from the flag filter —
    // the guard must turn that row into an error, not a silent miss
    val big = 1e17 // ×1000 scale → 1e20 ≫ 8.3e16 bound at defaults
    val rows = (1 to 12).map(i => ("A", i.toLong, big))
    val df = rows.toDF("k", "ts", "v")
    val e = intercept[Exception] {
      graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v",
        window = 20, minN = 10L, t = 3, scale = 1000.0).count()
    }
    assert(e.toString.contains("exactness bound") ||
      Option(e.getCause).exists(_.toString.contains("exactness bound")),
      e.toString)
    // large NEGATIVE values must fail the same way: floor(-1e19) would
    // saturate a long cast to Long.MinValue whose non-ANSI abs() wraps
    // negative — the guard compares the DOUBLE, so it still errors
    val eNeg = intercept[Exception] {
      graft.ext.Temporal.rollingAnomalies(
        (1 to 12).map(i => ("A", i.toLong, -big)).toDF("k", "ts", "v"),
        "k", "ts", "ts", "v",
        window = 20, minN = 10L, t = 3, scale = 1000.0).count()
    }
    assert(eNeg.toString.contains("exactness bound") ||
      Option(eNeg.getCause).exists(_.toString.contains("exactness bound")),
      eNeg.toString)
    // in-bound values are untouched (same fixture as the hand-check)
    val ok = (1 to 12).map(i => ("A", i.toLong, 100.0)).toDF("k", "ts", "v")
    assert(graft.ext.Temporal.rollingAnomalies(ok, "k", "ts", "ts", "v",
      window = 20, minN = 10L, t = 3, scale = 1000.0).count() == 0L)
  }

  test("rollingAnomalies rejects degenerate parameters loudly") {
    val df = Seq(("A", 1L, 1.0)).toDF("k", "ts", "v")
    for (bad <- Seq(
        () => graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v", window = 0),
        () => graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v", minN = 1L),
        () => graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v", t = 0),
        () => graft.ext.Temporal.rollingAnomalies(df, "k", "ts", "ts", "v", scale = 0.0)))
      intercept[IllegalArgumentException](bad())
  }

  private def rangeJoinBody(values: org.apache.spark.sql.DataFrame): Unit = {
    import spark.implicits._
    val intervals = Seq((100L, 4.0, 10.0), (200L, 10.5, 10.5), (300L, -5.0, -1.0))
      .toDF("iid", "lo", "hi")
    val got = graft.ext.Temporal.rangeJoin(values, "v", intervals, "lo", "hi",
        binWidth = 3.0)
      .select("vid", "iid").as[(Long, Long)].collect().toSet
    // inclusive both ends; point interval matches exactly; negatives bin right
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 200L), (4L, 300L)), got)
    // equi-join on the bin id, NOT a nested loop
    val plan = graft.ext.Temporal.rangeJoin(values, "v", intervals, "lo", "hi", 3.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join planned as nested loop:\n$plan")
    // an interval exploding past the cap refuses loudly (lazily, inside
    // the job — no eager extra scan of the right side)
    val err = intercept[Exception] {
      graft.ext.Temporal.rangeJoin(values, "v",
        Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi"), "lo", "hi",
        binWidth = 1.0).collect()
    }
    assert(err.getMessage.contains("widen binWidth") ||
      Option(err.getCause).exists(_.getMessage.contains("widen binWidth")),
      err.getMessage)
    // inverted intervals match nothing (BETWEEN semantics) instead of
    // exploding through sequence's negative default step
    val inv = graft.ext.Temporal.rangeJoin(values, "v",
      Seq((9L, 1e6, 0.0)).toDF("iid", "lo", "hi"), "lo", "hi", binWidth = 1.0)
      .count()
    assert(inv == 0L)
    // shared column names refuse loudly
    val dup = intercept[IllegalArgumentException] {
      graft.ext.Temporal.rangeJoin(values, "v",
        Seq((1L, 0.0, 1.0)).toDF("vid", "lo", "hi"), "lo", "hi", 1.0)
    }
    assert(dup.getMessage.contains("share column names"), dup.getMessage)
  }
}

class SketchSpec extends SparkSuite {
  import spark.implicits._

  test("count-min estimates bound exact counts from above within eps*N") {
    val li = sf("sf0.001", "lineitem").select($"l_suppkey".cast("long"))
    val exact = li.groupBy("l_suppkey").count()
      .as[(Long, Long)].collect().toMap
    val n = exact.values.sum
    val agg = new CountMinAgg(width = 1024, depth = 4)
    val cm = udaf(agg)
    val sketch = li.select(cm($"l_suppkey").as("s"))
      .as[Seq[Long]].collect()(0).toArray
    exact.foreach { case (k, c) =>
      val est = agg.estimate(sketch, k)
      assert(est >= c, s"key $k: estimate $est below exact $c")
      assert(est <= c + (0.01 * n).toLong + 1, s"key $k: estimate $est too high vs $c (n=$n)")
    }
  }
}

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  test("optimizeLayout produces disjoint per-file ranges; stats report files") {
    val root = java.nio.file.Files.createTempDirectory("layout").toString
    val store = new graft.store.Store(spark, root)
    store.createTable("li", sf("sf0.001", "lineitem").repartition(8))
    store.optimizeLayout("li", "l_orderkey", 4)
    val (rows, bytes, files) = store.tableStats("li")
    assert(rows == 6000 && files == 4 && bytes > 0)
    // per-file ranges must be disjoint after range clustering
    val fs = new java.io.File(s"$root/sources/li").listFiles()
      .filter(_.getName.endsWith(".parquet")).sorted
    val ranges = fs.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("l_orderkey"), max("l_orderkey")).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $hi > $lo2")
      case _ =>
    }
    store.remove()
  }

  test("zorder clusters BOTH dims where range clustering leaves one wide") {
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    val store = new graft.store.Store(spark, root)
    // two independent uniform dims on a 256x256 grid
    val grid = spark.range(65536L).toDF("id")
      .withColumn("x", col("id") % 256)
      .withColumn("y", floor(col("id") / 256))
    def avgSpan(name: String, c: String): Double = {
      val fs = new java.io.File(s"$root/sources/$name").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val spans = fs.map { f =>
        val d = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).collect()(0)
        (d.getLong(1) - d.getLong(0)).toDouble / 255.0
      }
      spans.sum / spans.length
    }
    store.createTable("g_range", grid.repartition(8))
    store.optimizeLayout("g_range", "x", 16)
    store.createTable("g_z", grid.repartition(8))
    store.zorderLayout("g_z", Seq("x", "y"), 16)
    // range layout on x: x-spans tight, y-spans the full domain
    assert(avgSpan("g_range", "x") < 0.15, s"range x ${avgSpan("g_range", "x")}")
    assert(avgSpan("g_range", "y") > 0.9, s"range y ${avgSpan("g_range", "y")}")
    // z-order: BOTH dims bounded (16 files ~ 4x4 hypercubes => ~25-35%)
    assert(avgSpan("g_z", "x") < 0.6, s"zorder x ${avgSpan("g_z", "x")}")
    assert(avgSpan("g_z", "y") < 0.6, s"zorder y ${avgSpan("g_z", "y")}")
    // file-skipping payoff: a point-ish predicate on y touches few files
    val touched = new java.io.File(s"$root/sources/g_z").listFiles()
      .filter(_.getName.endsWith(".parquet")).count { f =>
        val d = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col("y")), max(col("y"))).collect()(0)
        d.getLong(0) <= 10L && 10L <= d.getLong(1)
      }
    assert(touched <= 8, s"y=10 touches $touched of 16 files")
    store.remove()
  }

  test("equi-depth zorder keeps pruning on skewed columns where linear collapses") {
    val root = java.nio.file.Files.createTempDirectory("zorder-eq").toString
    val store = new graft.store.Store(spark, root)
    // x: 99% of rows dense in [0,1], 1% outliers spread to 1e6 — linear
    // normalization maps every dense row to rank 0
    val skewed = spark.range(20000L).toDF("id")
      .withColumn("x", when(col("id") % 100 === 0,
        (col("id") % 997).cast("double") * 1003.0)
        .otherwise((col("id") % 1000).cast("double") / 1000.0))
      .withColumn("y", (col("id") % 256).cast("double"))
    def filesOverlapping(name: String, lo: Double, hi: Double): Int =
      new java.io.File(s"$root/sources/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).count { f =>
          val d = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("x")), max(col("x"))).collect()(0)
          d.getDouble(0) <= hi && lo <= d.getDouble(1)
        }
    store.createTable("s_lin", skewed.repartition(8))
    store.zorderLayout("s_lin", Seq("x", "y"), 16)
    store.createTable("s_eq", skewed.repartition(8))
    store.zorderLayout("s_eq", Seq("x", "y"), 16, equiDepth = true)
    // a dense-region slice (~20% of rows): linear z gives every dense row
    // rank_x = 0, so the slice spreads across ~all files by y; equi-depth
    // spends rank resolution inside the dense region
    val lin = filesOverlapping("s_lin", 0.4, 0.6)
    val eq = filesOverlapping("s_eq", 0.4, 0.6)
    info(s"files overlapping dense slice: linear=$lin equiDepth=$eq (of 16)")
    // linear collapses completely (every file overlaps); equi-depth
    // prunes some — boundaries come from a sampled range partitioner,
    // so the exact count wobbles around the bit-boundary ideal of 8
    assert(lin == 16, s"expected full collapse under linear, got $lin")
    assert(eq <= 12, s"equi-depth must prune on skew: eq=$eq lin=$lin")
    // row counts stay equal (layout must not drop/duplicate)
    assert(spark.read.parquet(s"$root/sources/s_eq").count() == 20000L)
    store.remove()
  }
}

class StreamIngestSpec extends SparkSuite {
  import spark.implicits._

  test("streaming upsert: micro-batches merge latest-wins into the table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ups-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ups-ckpt").toString
    val engine = new graft.api.Engine(spark, root)
    val mem = MemoryStream[(Long, Long, String)]
    val q = Streams.upsertStream(engine, "registry",
      mem.toDF().toDF("id", "ver", "txt"),
      keyCols = Seq("id"), versionCol = "ver", tieBreakCol = "ver",
      checkpoint = ckpt)
    try {
      // in-batch duplicate: id 1 twice, the v20 row must win
      mem.addData((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"))
      q.processAllAvailable()
      val after1 = engine.readTable(Seq("registry"))
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(after1 == Seq((1L, 20L, "b"), (2L, 10L, "c")), after1)
      // cross-batch: stale update ignored, newer applied, new key added
      mem.addData((1L, 15L, "stale"), (2L, 30L, "d"), (3L, 1L, "e"))
      q.processAllAvailable()
      val after2 = engine.readTable(Seq("registry"))
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
      assert(after2 == Seq((1L, 20L, "b"), (2L, 30L, "d"), (3L, 1L, "e")), after2)
    } finally {
      if (q.isActive) q.stop()
      engine.remove()
    }
  }

  test("streaming ingest lands shape-enforced rows in a readable table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val engine = new graft.api.Engine(spark, root)
    val mem = MemoryStream[(Long, Seq[Float])]
    val df = graft.types.Tensors.asTensor(
      mem.toDF().toDF("id", "vec"), "vec", Seq(4))
    val q = Streams.ingestStream(engine.store, "live_vecs", df, ckpt)
    try {
      mem.addData((1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(5f, 6f, 7f, 8f)))
      q.processAllAvailable()
      assert(engine.readTable(Seq("live_vecs")).count() == 2)
      mem.addData((3L, Seq(9f, 9f, 9f, 9f)))
      q.processAllAvailable()
      val got = engine.readTable(Seq("live_vecs"))
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(Array(1L, 2L, 3L)))
      // streamed rows flow into the normal index lifecycle: train a
      // coder on what has arrived, sync, then a probed search finds a
      // row that was STREAMED in afterwards via incremental sync
      engine.makeIndex("lc", "live_vecs", "vec",
        graft.coder.CoderConfig(metric = "l2", codebookSize = 2,
          numCodebooks = 1, batchSize = 8, numEpochs = 2))
      mem.addData((42L, Seq(100f, 100f, 100f, 100f)))
      q.processAllAvailable()
      graft.index.Index.syncIncremental(engine.store, "lc", "live_vecs",
        "vec", "id")
      val hit = engine.search("live_vecs", "vec",
          Array(100.0, 100.0, 100.0, 100.0), coding = Some("lc"),
          probes = Some(2), k = 1, tieBreak = Seq("id"))
        .select("id").as[Long].collect()
      assert(hit.sameElements(Array(42L)),
        s"probed search must find the streamed row, got ${hit.mkString(",")}")
      // shape enforcement applies to the STREAM: a ragged vector fails
      // the micro-batch instead of landing silently
      mem.addData((4L, Seq(1f, 2f)))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("expected 4 elements"),
        s"expected a shape violation, got: ${err.getMessage}")
    } finally {
      if (q.isActive) q.stop()
      engine.remove()
    }
  }

  test("indexSyncStream keeps the index fresh as rows stream in") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sync-stream").toString
    val ckptIn = java.nio.file.Files.createTempDirectory("graft-ss-in").toString
    val ckptIx = java.nio.file.Files.createTempDirectory("graft-ss-ix").toString
    val engine = new graft.api.Engine(spark, root)
    val mem = MemoryStream[(Long, Seq[Float])]
    val ingest = Streams.ingestStream(engine.store, "ss_vecs",
      mem.toDF().toDF("id", "vec"), ckptIn)
    var sync: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val rnd = new scala.util.Random(17)
      def batch(from: Int, n: Int) = (from until from + n).map(i =>
        (i.toLong, Seq.fill(4)(rnd.nextFloat() * 10)))
      mem.addData(batch(0, 64): _*)
      ingest.processAllAvailable()
      engine.makeIndex("ssc", "ss_vecs", "vec",
        graft.coder.CoderConfig(metric = "l2", codebookSize = 2,
          numCodebooks = 2, batchSize = 32, numEpochs = 2))
      // the maintenance stream tails the committed table files and runs
      // the idempotent incremental sync per micro-batch
      sync = Streams.indexSyncStream(engine.store, "ssc", "ss_vecs", "vec",
        "id", ckptIx)
      sync.processAllAvailable()
      def probedIds(target: Array[Double]): Seq[Long] =
        engine.search("ss_vecs", "vec", target, coding = Some("ssc"),
            probes = Some(4), k = 3, tieBreak = Seq("id"))
          .select("id").as[Long].collect().toSeq
      def bruteIds(target: Array[Double]): Seq[Long] =
        graft.api.Search.knn(engine.readTable(Seq("ss_vecs")), "vec",
            Seq(Tuple1(target.toSeq)).toDF("t"), "l2", k = 3,
            tieBreak = Seq("id"))
          .select("id").as[Long].collect().toSeq
      // stream two more waves; after each, the index must already be
      // fresh — no manual sync call anywhere
      for (wave <- 1 to 2) {
        mem.addData(batch(wave * 100, 32): _*)
        ingest.processAllAvailable()
        sync.processAllAvailable()
        assert(graft.index.Index.indexFresh(engine.store, "ssc", "ss_vecs", "vec"),
          s"index stale after wave $wave with a running sync stream")
        val t = Array.fill(4)(rnd.nextDouble() * 10)
        assert(probedIds(t) == bruteIds(t), s"probed != brute after wave $wave")
      }
      // replay safety: restarting the sync stream from its checkpoint
      // must not duplicate index rows (sync is an id anti-join)
      sync.stop()
      sync = Streams.indexSyncStream(engine.store, "ssc", "ss_vecs", "vec",
        "id", ckptIx)
      sync.processAllAvailable()
      val tableN = engine.readTable(Seq("ss_vecs")).count()
      val indexN = spark.read.parquet(
        engine.store.indexPath("ss_vecs", "vec", "ssc")).count()
      assert(indexN == tableN, s"index rows $indexN != table rows $tableN")
    } finally {
      if (sync != null && sync.isActive) sync.stop()
      if (ingest.isActive) ingest.stop()
      engine.remove()
    }
  }

  test("indexSyncStream bq tier self-compacts under compactEveryBatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-sync-bq").toString
    val ckptIn = java.nio.file.Files.createTempDirectory("graft-sbq-in").toString
    val ckptIx = java.nio.file.Files.createTempDirectory("graft-sbq-ix").toString
    val engine = new graft.api.Engine(spark, root)
    val mem = MemoryStream[(Long, Seq[Float])]
    val ingest = Streams.ingestStream(engine.store, "sbq_vecs",
      mem.toDF().toDF("id", "vec"), ckptIn)
    var sync: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      val rnd = new scala.util.Random(19)
      def batch(from: Int, n: Int) = (from until from + n).map(i =>
        (i.toLong, Seq.fill(4)(rnd.nextFloat() * 10)))
      mem.addData(batch(0, 64): _*)
      ingest.processAllAvailable()
      engine.makeCoder("sbc", "sbq_vecs", "vec",
        graft.coder.CoderConfig(metric = "l2", codebookSize = 2,
          numCodebooks = 1, batchSize = 32, numEpochs = 2))
      engine.makeBqIndex("sbc", "sbq_vecs", "vec")
      // every 2 micro-batches the sync compacts cells past 2 files
      sync = Streams.indexSyncStream(engine.store, "sbc", "sbq_vecs", "vec",
        "id", ckptIx, tier = "bq", compactEveryBatches = 2,
        maxFilesPerCell = 2)
      for (wave <- 1 to 6) {
        mem.addData(batch(wave * 1000, 16): _*)
        ingest.processAllAvailable()
        sync.processAllAvailable()
      }
      // 6 appended waves would leave ≥ 6 file sets; the in-stream
      // compaction must have kept the layout bounded
      val stats = graft.index.Index.cellStats(engine.store, "sbc",
        "sbq_vecs", "vec", tier = "bq")
      assert(stats.nonEmpty && stats.forall(_._2 <= 4),
        s"cells not compacted: $stats")
      // and the compacted copy still searches exactly at full budget
      val t = Array.fill(4)(rnd.nextDouble() * 10)
      val got = engine.searchBq("sbq_vecs", "vec", t, coding = "sbc",
          probes = 2, candidates = 1 << 20, idCol = "id", k = 5,
          metric = Some("l2"), tieBreak = Seq("id"))
        .select("id").as[Long].collect().toSeq
      val brute = graft.api.Search.knn(engine.readTable(Seq("sbq_vecs")),
          "vec", Seq(Tuple1(t.toSeq)).toDF("t"), "l2", k = 5,
          tieBreak = Seq("id"))
        .select("id").as[Long].collect().toSeq
      assert(got == brute, s"post-compaction bq search mismatch: $got vs $brute")
    } finally {
      if (sync != null && sync.isActive) sync.stop()
      if (ingest.isActive) ingest.stop()
      engine.remove()
    }
  }

  test("streaming ingest refuses a batch-written table (commit-log hazard)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-stream-mix").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-mix-ckpt").toString
    val engine = new graft.api.Engine(spark, root)
    engine.makeTable("batchy", Seq((1L, Seq(1f, 2f))).toDF("id", "vec"))
    val mem = MemoryStream[(Long, Seq[Float])]
    val err = intercept[IllegalArgumentException] {
      Streams.ingestStream(engine.store, "batchy",
        mem.toDF().toDF("id", "vec"), ckpt)
    }
    assert(err.getMessage.contains("BATCH path"), err.getMessage)
    engine.remove()
  }
}

class StreamStreamJoinSpec extends SparkSuite {
  import spark.implicits._

  test("watermarked stream-stream join matches events within the time bound") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(java.sql.Timestamp, Long)]
    val clicks = MemoryStream[(java.sql.Timestamp, Long)]
    val v = views.toDF().toDF("v_ts", "user_id").withWatermark("v_ts", "1 hour")
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "1 hour")
    val joined = v.join(c,
      expr("user_id = c_user AND c_ts BETWEEN v_ts AND v_ts + INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    try {
      val t = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      views.addData((t(0), 1L), (t(0), 2L))
      clicks.addData((t(10), 1L), (t(50), 2L)) // 2L's click outside the 30-min bound
      q.processAllAvailable()
      val got = spark.table("ssj_test").select("user_id").as[Long].collect().toSeq
      assert(got == Seq(1L), s"only user 1's click is within bound: $got")
    } finally q.stop()
  }
}

class StreamStaticJoinSpec extends SparkSuite {
  import spark.implicits._

  test("stream-static broadcast enrichment join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((100L, "gold"), (101L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val stream = mem.toDF().toDF("ts", "user_id", "value")
    val q = stream.join(broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 100L, 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 10:01:00"), 999L, 2.0))
      q.processAllAvailable()
      val got = spark.table("enrich_test")
        .select("user_id", "tier").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got(100L) == Some("gold") && got(999L) == None)
    } finally q.stop()
  }

  // corpus fixture shared by the near-dup gate tests: refs 1-3, arrivals
  // 10-12; 10 near-dups ref 1, 11 is novel, 12 exactly duplicates ref 3
  private lazy val ndCorpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "completely different reference text about spark engines"),
    (3L, "training data pipelines deduplicate incoming crawl documents"),
  ).toDF("ref_doc", "body")
  private def ndArrivals = Seq(
    (10L, "the quick brown fox jumps over the lazy dog yesterday"),
    (11L, "unrelated arrival with entirely novel words inside"),
    (12L, "training data pipelines deduplicate incoming crawl documents"),
  )

  test("nearDupAgainstCorpus (batch path): flags dup arrivals, passes novel ones") {
    val arrivals = ndArrivals.toDF("doc_id", "text")
    val got = Streams.nearDupAgainstCorpus(arrivals, "doc_id", "text",
        ndCorpus, "ref_doc", "body", threshold = 0.5)
      .select("doc_id", "ref_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == Set(10L, 12L), s"got $got")
    // one row per pair even though an exact dup matches in ALL 8 bands
    assert(byDoc(12L).toSeq == Seq((12L, 3L, 1.0)), s"${byDoc(12L).toSeq}")
    assert(byDoc(10L).map(_._2).toSet == Set(1L))
    assert(byDoc(10L).forall(r => r._3 >= 0.5 && r._3 < 1.0))
  }

  test("nearDupAgainstCorpus runs as a real stream-static join (append mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val out = Streams.nearDupAgainstCorpus(stream, "doc_id", "text",
      ndCorpus, "ref_doc", "body", threshold = 0.5)
    assert(out.isStreaming, "must stay a streaming frame")
    val q = out.writeStream.format("memory").queryName("neardup_test")
      .outputMode("append").start()
    try {
      mem.addData(ndArrivals: _*)
      q.processAllAvailable()
      val got = spark.table("neardup_test")
        .select("doc_id", "ref_id").as[(Long, Long)].collect().toSet
      assert(got == Set((10L, 1L), (12L, 3L)), s"got $got")
      // a later batch is judged independently (no cross-batch state)
      mem.addData((20L, "the quick brown fox jumps over the lazy dog today"))
      q.processAllAvailable()
      val got2 = spark.table("neardup_test")
        .filter($"doc_id" === 20L).select("ref_id").as[Long].collect().toSet
      assert(got2 == Set(1L), s"got $got2")
    } finally q.stop()
  }

  test("nearDupAgainstCorpus batch path equals nearDupPairsMinhash on cross pairs") {
    val all = (ndArrivals.map { case (id, t) => (id, t) } ++
      Seq((1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "completely different reference text about spark engines"),
        (3L, "training data pipelines deduplicate incoming crawl documents")))
      .toDF("doc_id", "text")
    val expected = graft.ext.Dedup.nearDupPairsMinhash(all, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => (a < 10) != (b < 10) }  // cross-side only
      .map { case (a, b, j) => (math.max(a, b), math.min(a, b), j) }.toSet
    val got = Streams.nearDupAgainstCorpus(
        all.filter($"doc_id" >= 10L), "doc_id", "text",
        all.filter($"doc_id" < 10L), "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, s"got $got want $expected")
  }

  test("nearDupAgainstSignatures: persisted signature artifact equals direct path") {
    val arrivals = ndArrivals.toDF("doc_id", "text")
    val direct = Streams.nearDupAgainstCorpus(arrivals, "doc_id", "text",
        ndCorpus, "ref_doc", "body", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // persist the signature table to parquet (the 100 TB artifact) and
    // gate against the RELOADED copy
    val dir = java.nio.file.Files.createTempDirectory("nd-sigs").toString
    graft.ext.Dedup.minhashSignatures(
        ndCorpus.select($"ref_doc".as("ref_id"), $"body".as("ref_text")),
        "ref_id", "ref_text")
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val viaSigs = Streams.nearDupAgainstSignatures(arrivals, "doc_id", "text",
        spark.read.parquet(s"$dir/sigs"),
        ndCorpus.select($"ref_doc".as("ref_id"), $"body".as("ref_text")),
        threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaSigs == direct, s"sigs $viaSigs direct $direct")
    assert(viaSigs.nonEmpty)
  }

  test("decontaminateGate batch path equals ngramContainment row-for-row") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "alpha beta zeta eta theta"),
      (102L, "totally disjoint words here now"),
    ).toDF("corpus_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma"),        // bigrams: alpha-beta, beta-gamma
      (2L, "unseen bigrams only here"),
    ).toDF("bench_id", "text")
    val expected = graft.ext.TextAnalysis.ngramContainment(
        corpus, "corpus_id", "text", bench, "bench_id", "text",
        n = 2, threshold = 0.2)
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = Streams.decontaminateGate(corpus, "corpus_id", "text",
        bench, "bench_id", "text", n = 2, threshold = 0.2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected, s"got $got want $expected")
    assert(got.nonEmpty, "fixture must produce contaminated pairs")
    // doc 100 contains both of bench 1's bigrams
    assert(got.contains((100L, 1L, 2L, 1.0)))
  }

  test("decontaminateGate runs as a real stream (append mode, no aggregate)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((1L, "alpha beta gamma")).toDF("bench_id", "text")
    val mem = MemoryStream[(Long, String)]
    val out = Streams.decontaminateGate(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", bench, "bench_id", "text", n = 2, threshold = 0.5)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("decon_test")
      .outputMode("append").start()
    try {
      mem.addData((10L, "alpha beta gamma delta"), (11L, "no leakage at all"))
      q.processAllAvailable()
      val got = spark.table("decon_test")
        .select("doc_id", "bench_id", "containment")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((10L, 1L, 1.0)), s"got $got")
    } finally q.stop()
  }

  test("decontaminateGate refuses an oversized benchmark loudly") {
    val bench = Seq((1L, "a b c d e f g h i j")).toDF("bench_id", "text")
    intercept[IllegalArgumentException] {
      Streams.decontaminateGate(ndArrivals.toDF("doc_id", "text"),
        "doc_id", "text", bench, "bench_id", "text", n = 2, maxBenchGrams = 3L)
    }
  }

  test("ngramContainmentLarge equals ngramContainment even at coarse fpp") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "alpha beta zeta eta theta"),
      (102L, "totally disjoint words here now"),
      (103L, "more unrelated filler text rows"),
    ).toDF("corpus_id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma"),
      (2L, "unseen bigrams only here"),
    ).toDF("bench_id", "text")
    val expected = graft.ext.TextAnalysis.ngramContainment(
        corpus, "corpus_id", "text", bench, "bench_id", "text",
        n = 2, threshold = 0.2)
      .as[(Long, Long, Long, Double)].collect().toSet
    // fpp 0.4: the bloom passes many non-bench grams — the exact verify
    // join must scrub every one of them
    val got = graft.ext.TextAnalysis.ngramContainmentLarge(
        corpus, "corpus_id", "text", bench, "bench_id", "text",
        n = 2, threshold = 0.2, fpp = 0.4)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == expected, s"got $got want $expected")
    assert(got.contains((100L, 1L, 2L, 1.0)))
  }

  test("decontaminateGateForEachBatch over a persisted gram artifact equals batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq((1L, "alpha beta gamma"), (2L, "kappa lambda mu"))
      .toDF("bench_id", "text")
    // persist the gram artifact (the 100 TB discipline: hash the static
    // side once) and gate against the RELOADED copy
    val dir = java.nio.file.Files.createTempDirectory("bench-grams").toString
    graft.ext.TextAnalysis.benchGrams(bench, "bench_id", "text", n = 2)
      .write.mode("overwrite").parquet(s"$dir/grams")
    val grams = spark.read.parquet(s"$dir/grams")
    val arrivals = Seq((10L, "alpha beta gamma delta"),
      (11L, "kappa lambda nu"), (12L, "no leakage at all"))
    val expected = graft.ext.TextAnalysis.ngramContainment(
        arrivals.toDF("doc_id", "text"), "doc_id", "text",
        bench, "bench_id", "text", n = 2, threshold = 0.4)
      .as[(Long, Long, Long, Double)].collect().toSet
    val sunk = scala.collection.mutable.Set.empty[(Long, Long, Long, Double)]
    val onBatch = Streams.decontaminateGateForEachBatch(
      grams, "bench_id", "doc_id", "text", n = 2, threshold = 0.4,
      fpp = 0.3,
      sink = b => sunk ++= b.as[(Long, Long, Long, Double)].collect())
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch(onBatch).start()
    try {
      mem.addData(arrivals: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(sunk.toSet == expected, s"got ${sunk.toSet} want $expected")
    assert(sunk.nonEmpty, "fixture must flag leakage")
  }

  test("buildGramBloom rejects an out-of-range fpp") {
    val grams = Seq((1L, "a b")).toDF("bench_id", "ngram")
    intercept[IllegalArgumentException] {
      graft.ext.TextAnalysis.buildGramBloom(grams, fpp = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.ext.TextAnalysis.buildGramBloom(grams, fpp = 1.0)
    }
  }

  test("nearDupAgainstCorpus error contracts") {
    intercept[IllegalArgumentException] {
      Streams.nearDupAgainstCorpus(ndArrivals.toDF("doc_id", "text"),
        "doc_id", "text", ndCorpus, "ref_doc", "body", numHashes = 30, bands = 8)
    }
    intercept[IllegalArgumentException] {
      Streams.nearDupAgainstCorpus(ndArrivals.toDF("doc_id", "text"),
        "doc_id", "text", ndCorpus, "ref_doc", "body", threshold = 1.5)
    }
  }
}

class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a c"),
    (2L, "b a"),
    (3L, "   "),          // whitespace-only: contributes nothing
    (4L, "c"),            // single token: no bigrams
  ).toDF("doc_id", "text")

  test("token frequencies and top-k vocabulary are exact and deterministic") {
    val freqs = TextAnalysis.tokenFrequencies(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(freqs == Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
    // tie between b and c broken by token asc; top-2 = a, b
    val top = TextAnalysis.topVocab(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 3L), ("b", 2L)))
  }

  test("bigram counts are exact; short docs drop out") {
    val got = TextAnalysis.wordNgramCounts(docs, "text", 2)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a b" -> 1L, "b a" -> 2L, "a c" -> 1L))
    // trigrams: only doc 1 is long enough
    val tri = TextAnalysis.wordNgramCounts(docs, "text", 3)
      .as[(String, Long)].collect().toMap
    assert(tri == Map("a b a" -> 1L, "b a c" -> 1L))
  }

  test("corpusProfile: exact integer rollup per group") {
    val corpus = Seq(
      (1L, "web", "a b c a b c a b"),
      (2L, "web", "a b c a b c a b"),   // exact duplicate of doc 1
      (3L, "web", null),
      (4L, "books",
        "the quick brown fox jumps over a lazy dog and runs to it"),
    ).toDF("doc_id", "source", "text")
    val prof = TextAnalysis.corpusProfile(corpus, "text", Seq("source"),
        minWords = 3, maxWords = 100)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, webDocs, webToks, webFp, webQ, webKeep) = prof("web")
    assert(webDocs == 3L && webToks == 16L)
    // identical texts share a fingerprint; null text fingerprints to 0
    assert(webFp == 2L, s"distinct fp: $webFp")
    // null text contributes the formula's empty value 400000 exactly
    assert(webQ > 400000L)
    assert(webKeep == 0L, "1-char mean word length fails the Gopher rules")
    val (_, bDocs, bToks, _, _, bKeep) = prof("books")
    assert(bDocs == 1L && bToks == 13L)
    // cross-check the keep count against the standalone flags operator
    val flagsKeep = TextAnalysis.gopherQualityFlags(corpus, "doc_id", "text",
        minWords = 3, maxWords = 100)
      .filter(col("keep")).count()
    assert(bKeep + prof("web")._6 == flagsKeep)
    intercept[IllegalArgumentException] {
      TextAnalysis.corpusProfile(corpus, "text", Seq.empty)
    }
  }
}

class DuplicateGroupsSpec extends SparkSuite {
  import spark.implicits._

  test("connected components label every node with its component minimum") {
    // components: {1,2,3,4} (chain), {10,11}, singleton {20}
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val got = graft.ext.Dedup.duplicateGroups(nodes, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("a long chain converges within the diameter bound") {
    // path graph 0-1-2-...-9: diameter 9, needs several rounds
    val nodes = (0L to 9L).toDF("id")
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val got = graft.ext.Dedup.duplicateGroups(nodes, "id", pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L), s"all nodes must fold to 0: $got")
  }
}

class DecontaminationSpec extends SparkSuite {
  import spark.implicits._

  test("n-gram containment is exact on hand-computed docs") {
    val bench = Seq((100L, "a b c")).toDF("bench_id", "text")   // grams: {a b, b c}
    val corpus = Seq(
      (1L, "a b x y"),      // shares {a b}          -> 1/2
      (2L, "a b c d"),      // shares {a b, b c}     -> 2/2
      (3L, "z z z"),        // shares nothing        -> dropped
    ).toDF("corpus_id", "text")
    val got = graft.ext.TextAnalysis.ngramContainment(
      corpus, "corpus_id", "text", bench, "bench_id", "text",
      n = 2, threshold = 0.5)
      .select("corpus_id", "shared", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (i, s, c) => i -> ((s, c)) }.toMap
    assert(got == Map(1L -> ((1L, 0.5)), 2L -> ((2L, 1.0))))
  }

  test("balanced sample takes exactly n deterministic rows per stratum") {
    val df = (1L to 100L).map(i => (i, if (i % 3 == 0) "x" else "y")).toDF("id", "grp")
    val got = graft.ext.Scale.balancedSample(df, Seq("grp"), 5, "id")
      .as[(Long, String)].collect().toSeq.sorted
    assert(got == Seq((1L,"y"),(2L,"y"),(3L,"x"),(4L,"y"),(5L,"y"),(6L,"x"),
      (7L,"y"),(9L,"x"),(12L,"x"),(15L,"x")).sorted)
  }
}

class StreamingVocabSpec extends SparkSuite {
  import spark.implicits._

  test("running token counts accumulate across micro-batches (update state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val q = Streams.streamingTokenCounts(mem.toDF().toDF("text"), "text")
      .writeStream.format("memory").queryName("vocab_test")
      .outputMode("complete").start()
    try {
      mem.addData("a b a", "  ")
      q.processAllAvailable()
      mem.addData("b c")
      q.processAllAvailable()
      val got = spark.table("vocab_test").as[(String, Long)].collect().toMap
      assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 1L), s"got $got")
    } finally q.stop()
  }
}

class PpmSpec extends SparkSuite {
  import graft.ext.Ppm

  test("encode/decode round-trip is exact; whitespace and comments parse") {
    val img = Ppm.Image(2, 2, Array[Byte](
      10, 20, 30,   40, 50, 60,
      70, 80, 90,  100, 110, 120))
    val back = Ppm.decode(Ppm.encode(img))
    assert(back.width == 2 && back.height == 2)
    assert(back.pixels.sameElements(img.pixels))
    // a header with comments and extra whitespace is still valid netpbm
    val commented = "P6\n# a comment\n 2  2 \n# another\n255\n".getBytes("US-ASCII") ++
      img.pixels
    val fromCommented = Ppm.decode(commented)
    assert(fromCommented.pixels.sameElements(img.pixels))
  }

  test("malformed payloads are rejected with clear errors") {
    val img = Ppm.Image(1, 1, Array[Byte](1, 2, 3))
    val ok = Ppm.encode(img)
    intercept[IllegalArgumentException](Ppm.decode("PX\n1 1\n255\nabc".getBytes))
    intercept[IllegalArgumentException](Ppm.decode(ok.dropRight(1)))   // truncated raster
    intercept[IllegalArgumentException](Ppm.decode("P6\n1 1\n65535\nabc".getBytes))
    // crafted dims whose w*h*3 overflows Int back to a small value must
    // not slip past the raster-length check
    intercept[IllegalArgumentException](
      Ppm.decode("P6\n1431655766 1\n255\nab".getBytes))
    // empty images are rejected (feature math divides by the pixel count)
    intercept[IllegalArgumentException](Ppm.decode("P6\n0 0\n255\n".getBytes))
  }

  test("nearest-neighbor resize picks the expected source pixels") {
    // 4x1 gradient -> 2x1 keeps pixels 0 and 2
    val img = Ppm.Image(4, 1, Array[Byte](0, 0, 0, 10, 10, 10, 20, 20, 20, 30, 30, 30))
    val out = Ppm.resizeNearest(img, 2, 1)
    assert(out.at(0, 0) == ((0, 0, 0)) && out.at(1, 0) == ((20, 20, 20)))
  }

  test("pixel statistics are hand-exact") {
    // two pixels: (0,0,0) and (255,255,255)
    val img = Ppm.Image(2, 1, Array[Byte](0, 0, 0, -1, -1, -1))
    val f = Ppm.features(img)
    assert(f(0) == 127.5f && f(1) == 127.5f && f(2) == 127.5f)   // means
    assert(f(3) == 127.5f)                                        // stddev
    assert(f(6) == 0.5f && f(13) == 0.5f)                         // lum bins 0 and 7
    assert(f(14) == 2.0f && f(15) == 1.0f)
  }

  test("distributed decode + real resize over generated valid P6 media") {
    val docs = sf("sf0.001", "documents").limit(50)
    val media = graft.ext.Multimodal.mediaAsPpm(docs, "doc_id", "text")
    val feats = graft.ext.Multimodal.extractFeaturesPpm(media).collect()
    assert(feats.length == 50)
    assert(feats.forall(f => f.n_bytes == 781 && f.features.length == 16))
    assert(feats.forall(f => f.features(14) == 16.0f && f.features(15) == 16.0f))
    val resized = graft.ext.Multimodal.resizePpm(media, 8).collect()
    resized.foreach { m =>
      val img = Ppm.decode(m.payload)
      assert(img.width == 8 && img.height == 8 && m.meta.width == 8)
    }
  }
}

class WavSpec extends SparkSuite {
  import graft.ext.Wav

  test("encode/decode round-trip is exact, stereo included") {
    val a = Wav.Audio(8000, Array(
      Array[Short](0, 1000, -1000, 32767, -32768),
      Array[Short](5, -5, 0, 100, -100)))
    val back = Wav.decode(Wav.encode(a))
    assert(back.sampleRateHz == 8000 && back.numChannels == 2 && back.numFrames == 5)
    assert(back.samples(0).sameElements(a.samples(0)))
    assert(back.samples(1).sameElements(a.samples(1)))
  }

  test("chunk walker tolerates extra chunks; malformed payloads rejected") {
    val a = Wav.Audio(8000, Array(Array[Short](1, 2, 3)))
    val ok = Wav.encode(a)
    // splice a LIST chunk between WAVE and fmt
    val extra = java.nio.ByteBuffer.allocate(10)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(2).put(Array[Byte](7, 7)).array()
    val spliced = ok.take(12) ++ extra ++ ok.drop(12)
    assert(Wav.decode(spliced).samples(0).sameElements(a.samples(0)))
    intercept[IllegalArgumentException](Wav.decode("RIFX".getBytes ++ ok.drop(4)))
    intercept[IllegalArgumentException](Wav.decode(ok.dropRight(1)))
    // undersized fmt chunk must fail cleanly, not over-read into the next chunk
    val shortFmt = ok.clone()
    val fmtSizeOff = 16 // "RIFF"+size+"WAVE"+"fmt " → size field
    shortFmt(fmtSizeOff) = 14
    intercept[IllegalArgumentException](Wav.decode(shortFmt))
    // empty data chunk: NaN features are worse than an error
    val err = intercept[IllegalArgumentException] {
      // rebuild with a 0-frame data chunk: header of a 1-frame mono file
      // with data size patched to 0 and raster dropped
      val one = Wav.encode(Wav.Audio(8000, Array(Array[Short](7))))
      val patched = one.dropRight(2)
      patched(40) = 0 // data chunk size LE byte 0
      Wav.decode(patched)
    }
    assert(err.getMessage.contains("frame"), err.getMessage)
  }

  test("resample maps indices; features are hand-exact on a square wave") {
    val sq = Wav.Audio(4, Array(Array[Short](1000, 1000, -1000, -1000)))
    val down = Wav.resample(sq, 2)
    assert(down.samples(0).sameElements(Array[Short](1000, -1000)))
    val f = Wav.features(sq)
    assert(f(0) == 0.0f)              // mean
    assert(f(1) == 1000.0f)           // rms
    assert(f(2) == 1000.0f)           // peak
    assert(math.abs(f(3) - 1.0f / 3) < 1e-7)  // one crossing / 3 steps
    assert(f(12) == 4.0f && f(13) == 4.0f && f(14) == 1.0f && f(15) == 1.0f)
  }

  test("distributed wav decode over generated valid payloads") {
    val docs = sf("sf0.001", "documents").limit(30)
    val media = graft.ext.Multimodal.mediaAsWav(docs, "doc_id", rateHz = 4000, frames = 4000)
    val feats = graft.ext.Multimodal.extractFeaturesWav(media).collect()
    assert(feats.length == 30)
    assert(feats.forall(f => f.features(12) == 4000.0f && f.features(13) == 4000.0f))
    val resampled = graft.ext.Multimodal.resampleWav(media, 2000).collect()
    resampled.foreach { m =>
      val a = Wav.decode(m.payload)
      assert(a.sampleRateHz == 2000 && a.numFrames == 2000 && m.meta.sampleRateHz == 2000)
    }
  }
}

class CorpusSpec extends SparkSuite {
  import spark.implicits._

  test("c4 clean keeps punctuated prose lines, drops short/code/boilerplate") {
    val doc = Seq(
      "This is a perfectly reasonable sentence that survives cleaning.",
      "short one.",                                   // < 3 words? no: 2 words -> dropped
      "No terminal punctuation so this line goes away",
      "function f() { return 42; }",                  // code marker
      "Lorem Ipsum dolor sit amet, consectetur.",     // boilerplate
      "Enable JavaScript to view this page.",         // boilerplate
      "Another good sentence ends with a question mark?",
    ).mkString("\n")
    val out = Corpus.c4CleanLines(Seq((1L, doc)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(out.getAs[Long]("n_lines_total") == 7)
    assert(out.getAs[Long]("n_lines_kept") == 2)
    val kept = out.getAs[String]("clean_text").split("\n")
    assert(kept(0).startsWith("This is a perfectly") && kept(1).endsWith("?"))
  }

  test("token chunking covers every token with the declared overlap") {
    val text = (1 to 25).map(i => s"w$i").mkString(" ")
    val chunks = Corpus.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", window = 10, stride = 5)
      .orderBy("chunk_id").collect()
    // n=25, window=10, stride=5 -> extra = ceil(15/5) = 3 -> 4 chunks
    assert(chunks.length == 4)
    assert(chunks(0).getAs[String]("chunk_text").startsWith("w1 ")
      && chunks(0).getAs[Long]("n_tokens") == 10)
    assert(chunks(1).getAs[String]("chunk_text").startsWith("w6 "))
    // last chunk starts at token 16 and is full (16..25)
    assert(chunks(3).getAs[String]("chunk_text") ==
      (16 to 25).map(i => s"w$i").mkString(" "))
    // short doc: one (short) chunk
    val one = Corpus.chunkTokens(Seq((2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", window = 10, stride = 5).collect()
    assert(one.length == 1 && one.head.getAs[Long]("n_tokens") == 3)
  }

  test("token packing assigns sequential bins per shard") {
    val df = Seq(
      ("s1", 1L, "a b c d"),   // 4 tokens, cum 4  -> bin 0, offset 0
      ("s1", 2L, "e f g"),     // 3 tokens, cum 7  -> bin 0, offset 4
      ("s1", 3L, "h i j k l"), // 5 tokens, cum 12 -> bin 0 (starts at 7), offset 7
      ("s1", 4L, "m n"),       // cum 14 -> starts at 12 -> bin 1, offset 2
      ("s2", 1L, "x y z"),     // separate shard restarts at bin 0
    ).toDF("source", "doc_id", "text")
    val packed = Corpus.packByTokenBudget(df, "source", "doc_id", "text",
      capacity = 10L).orderBy("source", "doc_id").collect()
    assert(packed.map(r => (r.getAs[String]("source"), r.getAs[Long]("bin"),
      r.getAs[Long]("bin_offset"))).toSeq == Seq(
      ("s1", 0L, 0L), ("s1", 0L, 4L), ("s1", 0L, 7L), ("s1", 1L, 2L),
      ("s2", 0L, 0L)))
  }

  test("hash sampling is deterministic, rate-accurate, and salt-independent") {
    val df = spark.range(20000).toDF("id")
    val a = Corpus.hashSample(df, "id", 0.1).count()
    val b = Corpus.hashSample(df, "id", 0.1).count()
    assert(a == b, "same sample on re-run")
    assert(math.abs(a - 2000.0) < 200, s"rate off: $a")
    val c = Corpus.hashSample(df, "id", 0.1, salt = "other").as[Long]
      .collect().toSet
    val aSet = Corpus.hashSample(df, "id", 0.1).as[Long].collect().toSet
    assert(c != aSet, "different salt gives a different sample")
    // weighted: weight 1 keeps everything, weight 0 keeps nothing
    assert(Corpus.weightedSample(df, "id", lit(1.0)).count() == 20000)
    assert(Corpus.weightedSample(df, "id", lit(0.0)).count() == 0)
    val w = Corpus.weightedSample(df, "id", col("id").cast("double") / 20000)
      .count()
    assert(math.abs(w - 10000.0) < 500, s"mean-weight sample off: $w")
  }

  test("pii redaction replaces emails, ips, phones and nothing else") {
    val df = Seq((1L,
      "mail bob.smith+x@corp.example.org now, host 10.1.2.3 tel +44 123-4567-8901 done"
    )).toDF("id", "text")
    val out = Corpus.redactPii(df, "text").select("redacted")
      .as[String].collect().head
    assert(out == "mail <EMAIL> now, host <IP> tel <PHONE> done", out)
    val clean = Seq((1L, "no pii here just words and 42 numbers"))
      .toDF("id", "text")
    assert(Corpus.redactPii(clean, "text").select("redacted")
      .as[String].collect().head == "no pii here just words and 42 numbers")
  }

  test("card redaction masks Luhn-valid numbers only") {
    // 4532015112830366 and 4111111111111111 are the standard Luhn-valid
    // test PANs; flipping the last digit breaks the checksum
    val df = Seq(
      (1L, "pay 4532015112830366 now"),               // valid, bare
      (2L, "pay 4532 0151 1283 0366 now"),            // valid, spaced
      (3L, "pay 4532-0151-1283-0367 now"),            // check digit off
      (4L, "order 1234567890123456 and 4111111111111111"), // invalid+valid
      (5L, "ts 20260816120000123 and short 123456789012"), // 17 digits fails luhn? checked below; 12 digits not a candidate
      (6L, "amex 371449635398431 ok")                 // 15-digit valid
    ).toDF("id", "text")
    val out = Corpus.redactCards(df, "text")
      .select("id", "n_card_candidates", "n_cards_valid", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((1L, 1L, "pay <CARD> now")))
    assert(out(2L) == ((1L, 1L, "pay <CARD> now")))
    assert(out(3L) == ((1L, 0L, "pay 4532-0151-1283-0367 now")))
    assert(out(4L)._1 == 2L && out(4L)._2 == 1L &&
      out(4L)._3 == "order 1234567890123456 and <CARD>")
    // the 17-digit timestamp is a CANDIDATE but must fail Luhn unless it
    // accidentally passes — assert against the ground-truth check
    def luhnOk(s: String): Boolean = {
      val ds = s.filter(_.isDigit).reverse
      ds.zipWithIndex.map { case (c, i) =>
        val d = c - '0'; if (i % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t } else d
      }.sum % 10 == 0
    }
    val tsValid = if (luhnOk("20260816120000123")) 1L else 0L
    assert(out(5L) == ((1L, tsValid,
      if (tsValid == 1L) "ts <CARD> and short 123456789012"
      else "ts 20260816120000123 and short 123456789012")))
    assert(out(6L) == ((1L, 1L, "amex <CARD> ok")))
    // parity with the ground-truth Luhn on every candidate above
    assert(luhnOk("4532015112830366") && luhnOk("4111111111111111") &&
      luhnOk("371449635398431") && !luhnOk("4532015112830367") &&
      !luhnOk("1234567890123456"))
  }

  test("card-redact kernel == HOF chain bit-exactly on adversarial digit soup") {
    // the differential twin contract: graft.functions.CardRedact (one
    // codegen pass) must reproduce the regexp_extract_all + HOF-Luhn +
    // replace-fold chain byte for byte, including its replace-all and
    // regex-backtracking quirks
    val soup = Seq(
      "pay 4532015112830366 now",
      "pay 4532 0151 1283 0366 now",
      "pay 4532-0151-1283-0367 now",                // invalid check digit
      "two 4111111111111111 and 371449635398431",   // two valid cards
      // 20-digit run: \b...\b backtracking matches 19 digits FROM
      // INDEX 1 (position 0 can never reach a trailing \b)
      "run 45320151128303664111 end",
      // valid candidate ALSO embedded in a longer non-candidate run
      // glued to letters (replace-all splices <CARD> there too — the
      // documented over-redaction; both sides must agree)
      "a 4111111111111111 and x4111111111111111999y",
      "glued4532015112830366tail",                   // no \b → no match
      "sep soup 4-1-1-1 1-1-1-1 1-1-1-1 1-1-1-1 done",
      "émoji 😀 4111 1111 1111 1111 😀",
      "empty", "", "1234567890123", "123456789012",
      "4111111111111111",                            // entire string
      "4111111111111111 4111111111111111",           // duplicate card
      null.asInstanceOf[String]
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = soup.toDF("id", "text")
    val kernel = Corpus.redactCards(df, "text")
      .select("id", "n_card_candidates", "n_cards_valid", "redacted")
    val chain = Corpus.redactCardsChain(df, "text")
      .select("id", "n_card_candidates", "n_cards_valid", "redacted")
    val k = kernel.collect().sortBy(_.getLong(0)).map(_.toString)
    val c = chain.collect().sortBy(_.getLong(0)).map(_.toString)
    assert(k.toSeq == c.toSeq,
      s"kernel/chain diverge:\n${k.zip(c).filter(p => p._1 != p._2)
        .mkString("\n")}")
    // and the scrub-chain text form agrees with both
    import graft.functions.functions.card_redact_text
    val txtK = df.select(col("id"), card_redact_text(col("text")).as("r"))
      .collect().sortBy(_.getLong(0)).map(r => Option(r.getString(1)))
    val txtC = df.select(col("id"), Corpus.cardRedactedExpr(col("text")).as("r"))
      .collect().sortBy(_.getLong(0)).map(r => Option(r.getString(1)))
    assert(txtK.toSeq == txtC.toSeq)
  }
}
