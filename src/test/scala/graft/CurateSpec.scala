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
    4L -> (benchText + " the cat and it sat to play"),
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

  test("id/text column names must not collide with the appended columns") {
    val bad = docs.withColumnRenamed("doc_id", "n_words")
    intercept[IllegalArgumentException] {
      Curate.curate(bad, "n_words", "text", bench, "doc_id", "text", cfg)
    }
  }
}
