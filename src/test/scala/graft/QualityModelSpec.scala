package graft

import org.apache.spark.sql.functions._

import graft.ext.QualityModel

/** Trainable logistic quality classifier (IRLS over text features). */
class QualityModelSpec extends SparkSuite {
  import spark.implicits._

  // separable-by-construction: "good" docs are mid-length prose with
  // stopwords and no punctuation noise; "junk" docs are short
  // punctuation-heavy fragments
  private lazy val labeled = {
    val good = (0 until 60).map { i =>
      (s"the quick brown fox $i jumps over the lazy dog and runs to " +
        "the hill in a long calm stride " * 2, true)
    }
    val junk = (0 until 60).map { i => (s"!!! ### $$$$ @@@ %%% $i ???", false) }
    (good ++ junk).toDF("text", "label")
  }

  test("IRLS separates rule-labeled classes and orders scores") {
    val model = QualityModel.train(labeled, "text", "label")
    val scored = QualityModel.score(
      labeled.withColumn("id", monotonically_increasing_id()),
      "id", "text", model)
      .join(labeled.withColumn("id", monotonically_increasing_id()), "id")
    val byLabel = scored.groupBy("label").agg(avg("quality_prob"))
      .as[(Boolean, Double)].collect().toMap
    assert(byLabel(true) > 0.9, s"good docs should score high: $byLabel")
    assert(byLabel(false) < 0.1, s"junk docs should score low: $byLabel")
    // every good doc outranks every junk doc (full separation)
    val minGood = scored.filter(col("label")).agg(min("quality_prob"))
      .as[Double].collect()(0)
    val maxJunk = scored.filter(!col("label")).agg(max("quality_prob"))
      .as[Double].collect()(0)
    assert(minGood > maxJunk)
  }

  test("scoring with fixed weights is pure arithmetic incl. null text") {
    val model = QualityModel.Logistic(Array(-1.0, 2.0, -3.0, 0.5))
    val df = Seq((1L, "the cat sat on the mat"), (2L, null))
      .toDF("doc_id", "text")
    val got = QualityModel.score(df, "doc_id", "text", model)
      .as[(Long, Double)].collect().toMap
    // null text → all features 0 → sigmoid(bias) = sigmoid(-1)
    val expNull = BigDecimal(1.0 / (1.0 + math.exp(1.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(2L) == expNull, s"got ${got(2L)} want $expNull")
    assert(got(1L) > 0 && got(1L) < 1)
  }

  test("model JSON export carries exactly four weights") {
    val model = QualityModel.Logistic(Array(0.25, -0.5, 1.5, 2.0))
    assert(model.toJson == "{\"weights\": [0.25, -0.5, 1.5, 2.0]}")
    intercept[IllegalArgumentException] {
      QualityModel.Logistic(Array(1.0, 2.0))
    }
  }

  test("error contracts") {
    intercept[IllegalArgumentException] {
      QualityModel.train(labeled, "text", "label", iters = 0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.train(labeled, "text", "label", l2 = 0.0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.train(labeled.filter(lit(false)), "text", "label")
    }
  }
}
