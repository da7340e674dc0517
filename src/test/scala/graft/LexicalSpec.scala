package graft

import java.nio.file.Files

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

    // the postings scan must carry the bucket IN-set as a PARTITION
    // filter (file-listing pruning), not a data filter
    val plan = engine.searchBm25("lexdocs", "text", terms)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no PartitionFilters in plan:\n$plan"))
    assert(pf.contains("__TERM_BUCKET__"), s"bucket not a partition filter:\n$plan")

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
}
