package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Blocked Jaro-Winkler pairs must equal the exact all-pairs baseline —
  * the pigeonhole-style guarantee is a length band (min ≥ (3j0−2)·max)
  * plus prefix filtering over sorted (char, occurrence) multisets; this
  * pins the identity across thresholds and fixture shapes that stress
  * each piece of the bound (duplicates, 1-char strings, shared
  * prefixes, repeated characters, length extremes). */
class JaroBlockingSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = {
    val names = Seq(
      "jonathan archer", "jonathon archer", "jonathan archar", // near-dups
      "kathryn janeway", "kathryn janewai", "katherin janeway",
      "benjamin sisko", "benjamin siskoo", "ben sisko",
      "jean luc picard", "jean luc piccard", "jean-luc picard",
      "aaaaaaaaaa", "aaaaaaaaab", "aaaa", "a", "b", "ab", "ba",
      "completely different text", "zzz unrelated zzz",
      "jonathan archer", // exact duplicate of id 0
      "the quick brown fox", "the quick brown fax",
      "mississippi", "missisippi", "mississippee")
    names.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("blocked == exact at every threshold above the 0.8 floor") {
    val df = corpus.toDF("doc_id", "t")
    for (t <- Seq(0.81, 0.85, 0.9, 0.95, 0.99)) {
      val exact = Dedup.jaroWinklerPairsExact(df, "doc_id", "t", t)
        .as[(Long, Long, Double)].collect().toSet
      val blocked = Dedup.jaroWinklerPairsBlocked(df, "doc_id", "t", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(blocked == exact,
        s"t=$t missing=${exact.diff(blocked)} spurious=${blocked.diff(exact)}")
      assert(exact.nonEmpty || t == 0.99, s"t=$t produced no pairs")
    }
  }

  test("blocked == exact on a large Zipfian alphabet (the regime " +
      "blocking WINS — candidate volume well under the quadratic)") {
    // CJK-style short names over a 500-char Zipf alphabet: rarest-first
    // prefixes land in the alphabet tail, so element collisions are
    // rare — the record-linkage shape JwSoak measures at 1M
    val rnd = new scala.util.Random(4321)
    def zipfChar(): Char = {
      // mild skew (quadratic CDF): a hot head plus a broad tail — at
      // this tiny n a heavy Zipf head would swamp the 500-char tail
      // and the selectivity margin (the 1M-scale distribution is the
      // soak's job, JwSoak/jw_soak_1m.json)
      val u = rnd.nextDouble()
      (0x4E00 + (u * u * 500).toInt).toChar
    }
    val base = (0 until 600).map(i =>
      (i.toLong, (0 until 8).map(_ => zipfChar()).mkString))
    val mutated = base.take(150).map { case (i, t) =>
      (i + 1000L, t.substring(0, 5) + zipfChar() + t.substring(6))
    }
    val df = (base ++ mutated).toDF("doc_id", "t")
    val exact = Dedup.jaroWinklerPairsExact(df, "doc_id", "t", 0.93)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = Dedup.jaroWinklerPairsBlocked(df, "doc_id", "t", 0.93)
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == exact,
      s"missing=${exact.diff(blocked)} spurious=${blocked.diff(exact)}")
    assert(exact.size >= 50, s"fixture too sparse: ${exact.size} pairs")
    // the regime claim itself: measured candidate volume ≪ n(n−1)/2
    val vol = Dedup.jaroWinklerCandidateVolume(df, "doc_id", "t", 0.93)
    val quad = 750.0 * 749.0 / 2.0
    assert(vol < quad / 5.0,
      f"blocking not selective on a rich alphabet: vol=$vol%.0f vs n²/2=$quad%.0f")
  }

  test("blocked == exact on randomized mutations (deterministic seed)") {
    val rnd = new scala.util.Random(1234)
    val alpha = "abcdefgh" // small alphabet → heavy element collisions
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val rows = (0 until 120).map { i =>
      val base = word(6 + rnd.nextInt(10))
      val t =
        if (i % 3 == 0) base
        else { // mutate one position of the previous base shape
          val p = rnd.nextInt(base.length)
          base.updated(p, alpha(rnd.nextInt(alpha.length)))
        }
      (i.toLong, t)
    }
    val df = rows.toDF("doc_id", "t")
    for (t <- Seq(0.85, 0.9)) {
      val exact = Dedup.jaroWinklerPairsExact(df, "doc_id", "t", t)
        .as[(Long, Long, Double)].collect().toSet
      val blocked = Dedup
        .jaroWinklerPairsBlocked(df, "doc_id", "t", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(blocked == exact,
        s"t=$t missing=${exact.diff(blocked)} spurious=${blocked.diff(exact)}")
    }
  }

  test("cross-table join == exact nested loop (shared union-alphabet order)") {
    val corpusDf = corpus.toDF("doc_id", "t")
    // arrivals: mutations of corpus rows + one disjoint-alphabet row
    // (stresses the UNION-alphabet rank: a char absent from one side
    // must still rank identically in both prefix frames)
    val arrivals = Seq(
      (100L, "jonathan archerr"), (101L, "kathryn janewa"),
      (102L, "jean luc piqard"), (103L, "xxxxqqqqxxxx"),
      (104L, "mississippi")).toDF("qid", "qt")
    for (t <- Seq(0.85, 0.9)) {
      val got = Dedup.jaroWinklerJoin(arrivals, "qid", "qt",
          corpusDf, "doc_id", "t", t)
        .as[(Long, Long, Double)].collect().toSet
      val want = (for {
        (qid, qt) <- Seq((100L, "jonathan archerr"), (101L, "kathryn janewa"),
          (102L, "jean luc piqard"), (103L, "xxxxqqqqxxxx"),
          (104L, "mississippi"))
        (id, s) <- corpus
        jw = jwRef(qt, s) if jw >= t
      } yield (qid, id, jw)).toSet
      assert(got.map(x => (x._1, x._2)) == want.map(x => (x._1, x._2)),
        s"t=$t got=${got.map(x => (x._1, x._2))} want=${want.map(x => (x._1, x._2))}")
      assert(got.exists(_._1 == 104L), "exact duplicate must match")
    }
  }

  /** Scala-side JW reference via the shared algorithm object. */
  private def jwRef(a: String, b: String): Double =
    graft.functions.JaroWinklerAlgo.similarity(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("guard refuses pathological element collisions, naming the worst") {
    val df = (0L until 200L).map(i => (i, "aaaaaaaaaa")).toDF("doc_id", "t")
    val ex = intercept[IllegalArgumentException] {
      Dedup.jaroWinklerPairsBlocked(df, "doc_id", "t", 0.9,
        maxCandidates = 100L)
    }
    assert(ex.getMessage.contains("candidate volume"), ex.getMessage)
    assert(ex.getMessage.contains("'a'"), ex.getMessage)
  }

  test("thresholds at or below the 0.8 floor are refused with a remedy") {
    val df = corpus.toDF("doc_id", "t")
    val ex = intercept[IllegalArgumentException] {
      Dedup.jaroWinklerPairsBlocked(df, "doc_id", "t", 0.8)
    }
    assert(ex.getMessage.contains("guarded exact variant"), ex.getMessage)
  }
}
