package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Cross-document common-segment (boilerplate line) dedup — the CCNet /
  * RefinedWeb line-level stage. Every expectation is hand-computed. */
class CrossDocSegmentSpec extends SparkSuite {
  import spark.implicits._

  // "nav" appears in docs 1, 2, 3 (3 DISTINCT docs; doc 3 repeats it
  // within itself — within-doc repeats must not inflate the doc count);
  // doc 2's copy has surrounding whitespace (identity is the trimmed
  // line); doc 4 leads with a blank segment; doc 5 is null.
  private lazy val docs = Seq(
    (1L, "nav\nbody one"),
    (2L, "  nav  \nbody two"),
    (3L, "nav\nbody three\nnav"),
    (4L, "\nbody four"),
    (5L, null.asInstanceOf[String]),
  ).toDF("doc_id", "text")

  test("commonSegments counts DISTINCT docs over the trimmed identity") {
    val out = Dedup.commonSegments(docs, "doc_id", "text", minDocs = 3)
      .select("doc_id", "seg_no", "n_docs")
      .as[(Long, Long, Long)].collect().toSet
    // every occurrence of "nav" is reported, n_docs = 3 (not 4 — doc 3's
    // repeat is one doc), and nothing else reaches 3 docs
    assert(out == Set((1L, 0L, 3L), (2L, 0L, 3L), (3L, 0L, 3L), (3L, 2L, 3L)),
      s"got $out")
  }

  test("minDocs above the corpus frequency finds nothing") {
    assert(Dedup.commonSegments(docs, "doc_id", "text", minDocs = 4).count() == 0)
  }

  test("stripCommonSegments removes EVERY occurrence, keeps blank segments") {
    val out = Dedup.stripCommonSegments(docs, "doc_id", "text", minDocs = 3)
      .select("doc_id", "n_segments", "n_kept", "text_kept")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // null doc excluded
    assert(out(1L) == ((1L, 2L, 1L, "body one")), s"${out(1L)}")
    // untrimmed original is what gets removed; survivor joined as-is
    assert(out(2L) == ((2L, 2L, 1L, "body two")), s"${out(2L)}")
    // BOTH copies in doc 3 go — no canonical survivor for boilerplate
    assert(out(3L) == ((3L, 3L, 1L, "body three")), s"${out(3L)}")
    // the blank lead segment trims to empty: never common, always kept
    assert(out(4L) == ((4L, 2L, 2L, "\nbody four")), s"${out(4L)}")
  }

  test("a segment shared by every doc of a large corpus strips linearly") {
    // 2000 docs all carrying one boilerplate line: the distinct-doc count
    // partial-combines (no per-key occurrence list is ever materialized)
    // and the strip keeps exactly each doc's unique line
    val big = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("cookie banner text\nunique "), col("id").cast("string")).as("text"))
    val out = Dedup.stripCommonSegments(big, "doc_id", "text", minDocs = 1000)
    assert(out.count() == 2000)
    assert(out.filter(col("n_kept") =!= 1).count() == 0)
    val row = out.filter(col("doc_id") === 7L)
      .select("text_kept").as[String].collect()
    assert(row.sameElements(Array("unique 7")))
  }

  test("stripSegmentsGate batch path equals stripCommonSegments row-for-row") {
    import graft.streaming.Streams
    val artifact = Dedup.commonSegmentHashes(docs, "doc_id", "text", minDocs = 3)
    val expected = Dedup.stripCommonSegments(docs, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long, String)].collect().toSet
    val got = Streams.stripSegmentsGate(docs, "doc_id", "text", artifact)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected, s"gate $got batch $expected")
    assert(got.nonEmpty)
  }

  test("stripSegmentsGate runs append-legal on a real stream") {
    import graft.streaming.Streams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val artifact = Dedup.commonSegmentHashes(docs, "doc_id", "text", minDocs = 3)
    val mem = MemoryStream[(Long, String)]
    val out = Streams.stripSegmentsGate(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", artifact)
    assert(out.isStreaming, "must stay a streaming frame")
    val q = out.writeStream.format("memory").queryName("segstrip_test")
      .outputMode("append").start()
    try {
      mem.addData((100L, "nav\nfresh arrival"), (101L, "no boilerplate at all"))
      q.processAllAvailable()
      val got = spark.table("segstrip_test")
        .select("doc_id", "n_segments", "n_kept", "text_kept")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == Set((100L, 2L, 1L, "fresh arrival"),
        (101L, 1L, 1L, "no boilerplate at all")), s"got $got")
    } finally q.stop()
  }

  test("stripSegmentsGate refuses an over-cap artifact loudly") {
    import graft.streaming.Streams
    val artifact = Dedup.commonSegmentHashes(docs, "doc_id", "text", minDocs = 3)
    val e = intercept[IllegalArgumentException] {
      Streams.stripSegmentsGate(docs, "doc_id", "text", artifact,
        maxSegments = 0L)
    }
    assert(e.getMessage.contains("maxSegments"))
  }

  test("segment-count append-log collapses to the full-corpus artifact") {
    // two disjoint batches sharing a segment that only crosses the
    // threshold when their counts ADD — the growing-corpus case the
    // log form exists for
    val batch1 = Seq(
      (1L, "shared line\nbody a"),
      (2L, "shared line\nbody b"),
    ).toDF("doc_id", "text")
    val batch2 = Seq(
      (3L, "shared line\nbody c"),
      (4L, "other stuff entirely"),
    ).toDF("doc_id", "text")
    val all = batch1.union(batch2)
    val dir = java.nio.file.Files.createTempDirectory("seg-log").toString
    Dedup.segmentDocCounts(batch1, "doc_id", "text")
      .write.mode("append").parquet(s"$dir/log")
    Dedup.segmentDocCounts(batch2, "doc_id", "text")
      .write.mode("append").parquet(s"$dir/log")
    val fromLog = Dedup.commonFromCounts(
        spark.read.parquet(s"$dir/log"), minDocs = 3)
      .as[(Long, Long, Long)].collect().toSet
    val direct = Dedup.commonSegmentHashes(all, "doc_id", "text", minDocs = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(fromLog == direct, s"log $fromLog direct $direct")
    assert(fromLog.size == 1, "only the shared line crosses minDocs = 3")
    // neither batch alone reaches the threshold — the sum is load-bearing
    assert(Dedup.commonSegmentHashes(batch1, "doc_id", "text", minDocs = 3)
      .count() == 0)
    // and the gate built from the log strips identically to the direct
    // artifact
    import graft.streaming.Streams
    val viaLog = Streams.stripSegmentsGate(all, "doc_id", "text",
        Dedup.commonFromCounts(spark.read.parquet(s"$dir/log"), 3))
      .as[(Long, Long, Long, String)].collect().toSet
    val viaDirect = Streams.stripSegmentsGate(all, "doc_id", "text",
        Dedup.commonSegmentHashes(all, "doc_id", "text", minDocs = 3))
      .as[(Long, Long, Long, String)].collect().toSet
    assert(viaLog == viaDirect && viaLog.nonEmpty)
  }

  test("strip is idempotent: nothing common remains, second strip is a no-op") {
    val pool = (0 until 12).map(i => s"template line $i shared chrome")
    val gen = udf { (id: Long) =>
      val r = new java.util.Random(id)
      (0 until 6).map(k =>
        if (r.nextInt(3) == 0) s"unique $id $k"
        else pool(r.nextInt(pool.length))).mkString("\n")
    }
    val corpus = spark.range(300)
      .select(col("id").as("doc_id"), gen(col("id")).as("text"))
    val stripped = Dedup.stripCommonSegments(corpus, "doc_id", "text",
        minDocs = 10)
      .select(col("doc_id"), col("text_kept").as("text")).cache()
    // non-degenerate: unique lines survive somewhere
    assert(stripped.filter(length(col("text")) > 0).count() > 0)
    // removing common segments cannot create new common segments —
    // doc frequencies of the survivors are unchanged
    assert(Dedup.commonSegments(stripped, "doc_id", "text",
      minDocs = 10).count() == 0)
    val again = Dedup.stripCommonSegments(stripped, "doc_id", "text",
      minDocs = 10)
    assert(again.filter(col("n_kept") =!= col("n_segments")).count() == 0,
      "second strip must remove nothing")
  }

  test("plan: detection has no window operator") {
    val plan = Dedup.commonSegments(docs, "doc_id", "text", minDocs = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }
}
