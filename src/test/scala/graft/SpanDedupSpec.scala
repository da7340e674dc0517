package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Exact substring (duplicated k-token span) dedup — Lee et al., ACL 2022.
  * Every expectation below is hand-computed from the fixture. */
class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  // d1/d2 share the 5-token run "a b c d e" (d1 at 0, d2 at 2); d3 repeats
  // "m n o" within itself (0 and 5); d4 is shorter than k; d5 is null.
  private lazy val docs = Seq(
    (1L, "a b c d e x1 y1 z1"),
    (2L, "p q a b c d e r"),
    (3L, "m n o f g m n o"),
    (4L, "s t"),
    (5L, null.asInstanceOf[String]),
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds cross-doc and within-doc k-gram repeats") {
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "start", "n_occ").as[(Long, Long, Long)]
      .collect().toSet
    val expected = Set(
      (1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 2L),  // "a b c","b c d","c d e" in d1
      (2L, 2L, 2L), (2L, 3L, 2L), (2L, 4L, 2L),  // same three in d2
      (3L, 0L, 2L), (3L, 5L, 2L),                // "m n o" twice in d3
    )
    assert(spans == expected, s"got $spans")
  }

  test("minOccurrences filters pairs-only duplicates") {
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text",
      k = 3, minOccurrences = 3)
    assert(spans.count() == 0)
  }

  test("stripDuplicatedSpans keeps the canonical occurrence, removes the rest") {
    val out = Dedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 3)
      .select("doc_id", "n_tokens", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))          // null doc excluded
    assert(out(1L) == ((1L, 8L, 8L, "a b c d e x1 y1 z1")), s"${out(1L)}")
    // d2: overlapping non-canonical windows at 2,3,4 union to positions
    // 2..6 — the whole 5-token run goes, not just one window
    assert(out(2L) == ((2L, 8L, 3L, "p q r")), s"${out(2L)}")
    // d3: within-doc repeat — second "m n o" (positions 5..7) removed
    assert(out(3L) == ((3L, 8L, 5L, "m n o f g")), s"${out(3L)}")
    // d4: shorter than k, untouched
    assert(out(4L) == ((4L, 2L, 2L, "s t")), s"${out(4L)}")
  }

  test("identical docs: min-id doc is canonical, duplicate is emptied") {
    val dup = Seq((10L, "u v w x"), (11L, "u v w x")).toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedSpans(dup, "doc_id", "text", k = 2)
      .select("doc_id", "n_kept", "text_kept")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(10L) == ((10L, 4L, "u v w x")))
    assert(out(11L) == ((11L, 0L, "")))
  }

  test("strip never reshuffles the corpus tokens (narrow reassembly)") {
    // every ShuffleExchange must carry only ids/offsets/hashes — the
    // token arrays stay in the scan stage and the final narrow map
    val planned = Dedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 3)
    val fmt = planned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffleBlocks = fmt.split("\n\n")
      .filter(_.linesIterator.hasNext)
      .filter(_.linesIterator.next().matches("""\(\d+\) Exchange.*"""))
    shuffleBlocks.foreach { b =>
      assert(!b.contains("__t__#") && !b.contains("text#"),
        s"token array rides a shuffle:\n$b")
    }
  }

  test("canonical pick is an aggregation, not a per-span-key window sort") {
    // one span duplicated far more than the rest: with a row_number window
    // the canonical pick would sort ALL occurrences of that span in one
    // task; the min(struct) aggregation does it in a partial-combined
    // pass. Assert the plan has no Window node at all, and that the
    // mega-duplicated span still strips correctly.
    val mega = (0L until 200L).map(i => (i, "h h h h")) :+ (500L, "q r s t u")
    val df = mega.toDF("doc_id", "text")
    val planned = Dedup.stripDuplicatedSpans(df, "doc_id", "text", k = 2)
    val fmt = planned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!fmt.contains("Window"), s"canonical pick must not plan a window:\n$fmt")
    val out = planned.select("doc_id", "n_kept")
      .as[(Long, Long)].collect().toMap
    // doc 0 keeps only the canonical window's first token: its own later
    // overlapping occurrences (starts 1, 2) are non-canonical and remove
    // positions 1..3 — same within-doc semantics the d3 fixture pins
    assert(out(0L) == 1L, s"canonical doc keeps the canonical window, got ${out(0L)}")
    assert((1L until 200L).forall(out(_) == 0L), "every other copy is emptied")
    assert(out(500L) == 5L, "non-duplicated doc untouched")
  }

  test("dup-set join: broadcast at small input scale, shuffle-hash above") {
    // size-aware hint (r21): a corpus whose scan estimate is under
    // graft.dedup.spanDupBroadcastBytes broadcasts the dup set (the
    // annotate join never shuffles the span occurrences); a forced-zero
    // threshold models the 100 TB regime — the dup set must then ride
    // the sort-free shuffle_hash join, never a driver collect.
    def planOf(k: String): String = {
      val df = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    }
    val small = planOf("small")
    assert(small.contains("BroadcastHashJoin"),
      s"small corpus must broadcast the dup set:\n$small")
    spark.conf.set("graft.dedup.spanDupBroadcastBytes", "0")
    try {
      val big = planOf("big")
      assert(big.contains("ShuffledHashJoin") &&
        !big.contains("BroadcastHashJoin"),
        s"over-threshold corpus must hash-join the dup set:\n$big")
      // strategy changes the plan, never the rows
      val rows = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3)
        .select("doc_id", "start", "n_occ").as[(Long, Long, Long)]
        .collect().toSet
      assert(rows == Set(
        (1L, 0L, 2L), (1L, 1L, 2L), (1L, 2L, 2L),
        (2L, 2L, 2L), (2L, 3L, 2L), (2L, 4L, 2L),
        (3L, 0L, 2L), (3L, 5L, 2L)), s"got $rows")
    } finally spark.conf.unset("graft.dedup.spanDupBroadcastBytes")
  }

  test("seed-0 hash collision: pair key keeps distinct grams apart") {
    // Two DIFFERENT grams engineered to collide on h (the old single-hash
    // identity) but differ on h2: under the pre-round-8 code these four
    // occurrences would conflate into one n_occ=4 group; the (h, h2) pair
    // must keep them as two independent n_occ=2 groups.
    val spans = Seq(
      (1L, 0L, 42L, 1000L), (2L, 3L, 42L, 1000L),   // gram A, twice
      (3L, 0L, 42L, 2000L), (4L, 7L, 42L, 2000L),   // gram B: same h!
      (5L, 1L, 99L, 3000L),                         // unique gram, dropped
    ).toDF("id", "start", "h", "h2")
    val out = Dedup.duplicatedSpansFrom(spans, "doc_id", minOccurrences = 2)
      .select("doc_id", "gram_hash", "gram_hash2", "n_occ")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 42L, 1000L, 2L), (2L, 42L, 1000L, 2L),
      (3L, 42L, 2000L, 2L), (4L, 42L, 2000L, 2L)), s"got $out")
    // and the real hash streams are in fact independent: same input,
    // different seeds, different values
    val g = "a b c d e f g h"
    assert(Dedup.hash64(g, 0L) != Dedup.hash64(g, Dedup.SpanSeed2))
  }

  // ——— span-level benchmark decontamination ———

  private lazy val contamCorpus = Seq(
    (1L, "x y a b c d z"),                 // leaks "a b c" (at 2), "b c d" (at 3)
    (2L, "clean text entirely here"),
    (4L, "a b c d"),                       // a bench doc verbatim
    (5L, null.asInstanceOf[String]),
  ).toDF("doc_id", "text")
  // bench 3-grams: doc 50 {"a b c","b c d"}; doc 51 {"a b c","b c q"}
  private lazy val contamBench =
    Seq((50L, "a b c d"), (51L, "a b c q")).toDF("bench_doc", "text")

  test("contaminatedSpans marks leaked windows with min-bench attribution") {
    val out = Dedup.contaminatedSpans(contamCorpus, "doc_id", "text",
        contamBench, "bench_doc", "text", k = 3)
      .select("doc_id", "start", "bench_id")
      .as[(Long, Long, Long)].collect().toSet
    // "a b c" is in BOTH bench docs -> attributed to min (50)
    assert(out == Set((1L, 2L, 50L), (1L, 3L, 50L),
      (4L, 0L, 50L), (4L, 1L, 50L)), s"got $out")
  }

  test("stripContaminatedSpans removes unioned windows, empties verbatim leaks") {
    val out = Dedup.stripContaminatedSpans(contamCorpus, "doc_id", "text",
        contamBench, "bench_doc", "text", k = 3)
      .select("doc_id", "n_tokens", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L))            // null doc excluded
    // windows at 2 and 3 union to positions 2..5 — the whole leaked run
    assert(out(1L) == ((1L, 7L, 3L, "x y z")), s"${out(1L)}")
    assert(out(2L) == ((2L, 4L, 4L, "clean text entirely here")), s"${out(2L)}")
    // a benchmark doc sitting verbatim in the corpus strips to nothing
    assert(out(4L) == ((4L, 4L, 0L, "")), s"${out(4L)}")
  }

  test("error contracts") {
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.contaminatedSpans(contamCorpus, "doc_id", "text",
        contamBench, "bench_doc", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", k = 3, minOccurrences = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.stripDuplicatedSpans(docs, "doc_id", "text", k = 0)
    }
  }
}
