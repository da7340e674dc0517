package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Corpus, TextAnalysis}

/** Gopher rule flags + within-doc segment dedup — hand-computed fixtures. */
class CorpusRulesSpec extends SparkSuite {
  import spark.implicits._

  test("gopher flags: clean doc passes every rule") {
    val df = Seq((1L,
      "the cat sat on the mat and it was nice to see it again today"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityFlags(df, "doc_id", "text",
      minWords = 5, maxWords = 100).collect()(0)
    assert(r.getAs[Long]("n_words") == 15L)
    // mean word len = 46/15 ≈ 3.07 ∈ [3,10]; 4 distinct stopwords
    Seq("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
      "rule_bullet_lines", "rule_ellipsis_lines", "rule_alpha_words",
      "rule_stopwords", "keep").foreach(c =>
      assert(r.getAs[Boolean](c), s"$c must pass"))
  }

  test("gopher flags: symbol spam fails symbol/alpha/stopword rules") {
    val df = Seq((2L, "###### ## #")).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityFlags(df, "doc_id", "text",
      minWords = 1, maxWords = 100).collect()(0)
    assert(!r.getAs[Boolean]("rule_symbol_ratio"))   // 9 symbols / 3 words
    assert(!r.getAs[Boolean]("rule_alpha_words"))
    assert(!r.getAs[Boolean]("rule_stopwords"))
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[Boolean]("rule_word_count"))
  }

  test("gopher flags: bullet and ellipsis line fractions") {
    val bullets = Seq((3L, "- one\n- two\n- three\nplain line here"))
      .toDF("doc_id", "text")
    val rDefault = TextAnalysis.gopherQualityFlags(bullets, "doc_id", "text",
      minWords = 1).collect()(0)
    assert(rDefault.getAs[Boolean]("rule_bullet_lines"))      // 0.75 <= 0.9
    val rStrict = TextAnalysis.gopherQualityFlags(bullets, "doc_id", "text",
      minWords = 1, maxBulletRatio = 0.5).collect()(0)
    assert(!rStrict.getAs[Boolean]("rule_bullet_lines"))      // 0.75 > 0.5
    val ell = Seq((4L, "this trails off...\nand this one too…"))
      .toDF("doc_id", "text")
    val rEll = TextAnalysis.gopherQualityFlags(ell, "doc_id", "text",
      minWords = 1).collect()(0)
    assert(!rEll.getAs[Boolean]("rule_ellipsis_lines"))       // 1.0 > 0.3
  }

  test("gopher flags: word-count bounds and null exclusion") {
    val df = Seq((5L, "too short"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.gopherQualityFlags(df, "doc_id", "text").collect()
    assert(rows.length == 1)                                  // null dropped
    assert(!rows(0).getAs[Boolean]("rule_word_count"))        // 2 < 50
    assert(!rows(0).getAs[Boolean]("keep"))
  }

  test("normalizeText: NFC composition, control strip, collapse, trim") {
    val rows = Seq(
      (1L, "cafe\u0301  au\tlait "),   // decomposed accent + runs
      (2L, "a\u0007b\u0000c"),          // BEL + NUL stripped
      (3L, "line1\nline2"),                 // newline preserved
      (4L, null.asInstanceOf[String]),
    ).toDF("id", "t")
    val out = rows.select(col("id"),
        TextAnalysis.normalizeText(col("t")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "café au lait", s"got '${out(1L)}'")
    assert(out(2L) == "abc", s"got '${out(2L)}'")
    assert(out(3L) == "line1\nline2", s"got '${out(3L)}'")
    assert(out(4L) == null)
  }

  test("dedupSegments keeps first occurrences in order") {
    val df = Seq((1L, "x\ny\nx\nz\ny")).toDF("doc_id", "text")
    val r = TextAnalysis.dedupSegments(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_segments") == 5L)
    assert(r.getAs[Long]("n_kept") == 3L)
    assert(r.getAs[Double]("dup_segment_ratio") == 0.4)
    assert(r.getAs[String]("clean_text") == "x\ny\nz")
  }

  test("dedupSegments: custom separator and no-dup doc") {
    val df = Seq((1L, "p q p p r"), (2L, "all distinct words here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupSegments(df, "doc_id", "text", sep = " ")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "p q r")
    assert(out(1L).getAs[Double]("dup_segment_ratio") == 0.4)
    assert(out(2L).getAs[Long]("n_kept") == 4L)
    assert(out(2L).getAs[Double]("dup_segment_ratio") == 0.0)
  }

  test("dedupSegments: trailing separator yields an empty segment once") {
    val df = Seq((1L, "x\nx\n")).toDF("doc_id", "text")
    val r = TextAnalysis.dedupSegments(df, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_segments") == 3L)   // [x, x, ""]
    assert(r.getAs[Long]("n_kept") == 2L)       // [x, ""]
    assert(r.getAs[String]("clean_text") == "x\n")
  }

  test("packedSequences: token-exact concat-then-chunk per shard") {
    import graft.ext.Corpus
    val df = Seq(
      ("A", 1L, "t1 t2 t3"), ("A", 2L, "t4 t5"), ("A", 3L, "t6 t7 t8 t9"),
      ("B", 4L, "u1 u2"),
    ).toDF("shard", "doc_id", "text")
    val out = Corpus.packedSequences(df, "shard", "doc_id", "text", capacity = 4)
      .collect().map(r => (r.getString(0), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("seq_text"))).toMap
    // docs straddle bins: doc 2 splits across bins 0/1, doc 3 across 1/2
    assert(out(("A", 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(out(("A", 1L)) == ((4L, "t5 t6 t7 t8")))
    assert(out(("A", 2L)) == ((1L, "t9")))
    assert(out(("B", 0L)) == ((2L, "u1 u2")))
    // every bin but a shard's last is exactly full, and shard concat is
    // the doc concat
    val aConcat = Seq("A" -> 0L, "A" -> 1L, "A" -> 2L)
      .map { case (s, b) => out((s, b))._2 }.mkString(" ")
    assert(aConcat == "t1 t2 t3 t4 t5 t6 t7 t8 t9")
  }

  test("packedSequences agrees with packByTokenBudget bin assignment") {
    import graft.ext.Corpus
    val df = Seq(
      ("A", 1L, "a b c"), ("A", 2L, "d e f g"), ("A", 3L, "h"),
    ).toDF("shard", "doc_id", "text")
    // packByTokenBudget: a doc's bin = the bin of its FIRST token
    val assign = Corpus.packByTokenBudget(df, "shard", "doc_id", "text", 4L)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    val packed = Corpus.packedSequences(df, "shard", "doc_id", "text", 4L)
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[String]("seq_text")).toMap
    assert(assign == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
    assert(packed(0L) == "a b c d" && packed(1L) == "e f g h")
  }

  test("packing with duplicate orderCol values: exact-capacity bins, no overlap") {
    import graft.ext.Corpus
    // Every doc shares orderCol = 1 — under the old default RANGE frame all
    // four got identical cumulative sums (overlapping bins, 12-token "bins"
    // at capacity 4); the ROWS frame + md5 tiebreak must pack them cleanly.
    val df = Seq(
      ("A", 1L, "a1 a2 a3"), ("A", 1L, "b1 b2 b3"),
      ("A", 1L, "c1 c2 c3"), ("A", 1L, "d1 d2 d3"),
    ).toDF("shard", "doc_id", "text")
    val assign = Corpus.packByTokenBudget(df, "shard", "doc_id", "text", 4L)
      .collect()
    // cumulative starts must be a permutation of 0,3,6,9 — distinct, no overlap
    val starts = assign.map(r =>
      r.getAs[Long]("bin") * 4L + r.getAs[Long]("bin_offset")).sorted
    assert(starts.toSeq == Seq(0L, 3L, 6L, 9L), starts.mkString(","))
    val packed = Corpus.packedSequences(df, "shard", "doc_id", "text", 4L)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("seq_text"))).toMap
    // 12 tokens / capacity 4 = bins 0,1,2 all exactly full
    assert(packed.keySet == Set(0L, 1L, 2L))
    assert(packed.values.map(_._1).toSeq.forall(_ == 4L), packed.toString)
    // concatenation reproduces SOME doc order (tiebreak-determined), with
    // each doc's tokens contiguous and in order
    val concat = (0L to 2L).map(packed(_)._2).mkString(" ")
    val docs = Seq("a1 a2 a3", "b1 b2 b3", "c1 c2 c3", "d1 d2 d3")
    assert(docs.forall(concat.contains), concat)
    // deterministic across runs
    val again = Corpus.packedSequences(df, "shard", "doc_id", "text", 4L)
      .collect().map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("seq_text"))).toMap
    assert(again == packed)
  }

  test("dedupSegments error contract") {
    intercept[IllegalArgumentException] {
      TextAnalysis.dedupSegments(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", sep = "")
    }
  }

  test("clusterProfile: nearest-seed assignment, distance ties break on " +
      "the smaller seed id, stats hand-checked") {
    val corpus = Seq(
      (1L, Seq(0.0, 0.0)), // 0.0 to seed 10, 5.0 to seed 20 -> 10
      (2L, Seq(0.5, 0.0)), // 0.5 vs sqrt(3.5^2+3^2)          -> 10
      (3L, Seq(4.0, 3.0)), // 5.0 vs 0.0                      -> 20
      (4L, Seq(2.0, 1.5))  // 2.5 vs 2.5: TIE -> smaller seed -> 10
    ).toDF("id", "v")
    val seeds = Seq((10L, Seq(0.0, 0.0)), (20L, Seq(4.0, 3.0)))
      .toDF("sid", "sv")
    val got = Corpus.clusterProfile(corpus, "id", "v", seeds, "sid", "sv",
        "l2")
      .as[(Long, Long, Double, Double)].collect().toSet
    // cluster 10: dists {0, 0.5, 2.5} -> mean 1.0, max 2.5
    assert(got == Set((10L, 3L, 1.0, 2.5), (20L, 1L, 0.0, 0.0)), got)
    // one scalar exchange per aggregate, never a corpus-vector shuffle:
    // the seed cross join is broadcast
    val plan = Corpus.clusterProfile(corpus, "id", "v", seeds, "sid", "sv",
      "l2").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
