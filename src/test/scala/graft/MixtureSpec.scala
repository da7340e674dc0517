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
}
