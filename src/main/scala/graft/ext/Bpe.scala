package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich/Haddow/Birch 2016; the GPT-2
  * tokenizer family) — a REAL trained-merges tokenizer for training-data
  * token accounting, replacing the regex approximation
  * ([[TextAnalysis.bpeishTokenCount]]) when counts must come from an
  * actual vocabulary.
  *
  * Execution shape: training reduces the corpus to a word-frequency
  * table with one distributed `groupBy(word).count()` (map-side
  * combined), takes the top `maxWords` entries to the driver (bounded,
  * loud), and learns merges with the classic incremental pair-count
  * algorithm over that dict — corpus size only affects the one agg pass.
  * Encoding broadcasts the merge ranks and runs as a narrow per-row map
  * (a UDF with primitive inner loops, the signature-generator precedent):
  * no shuffle, no driver round-trips.
  *
  * Determinism: merges depend only on the word-frequency table; ties are
  * broken by (higher count, then lexicographically smaller pair), so the
  * same corpus always trains the same model — no seed.
  */
object Bpe {

  /** Pre-tokenizer: letter runs | digit runs | single non-space symbol —
    * the same word shape as [[TextAnalysis.bpeishTokenCount]], so BPE
    * token counts are comparable with the regex approximation they
    * replace. */
  val WordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Split a word into one string per Unicode CODE POINT (not UTF-16
    * unit): identical for BMP text, but keeps astral symbols whole, so
    * the merge alphabet matches character-indexed mirrors (DuckDB
    * `word[i]`) — the same granularity contract as
    * [[Dedup.hash64]]'s code-point fold. */
  private[graft] def codePointStrings(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      i += Character.charCount(cp); k += 1
    }
    out
  }

  case class BpeModel(merges: IndexedSeq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Encode one pre-tokenized word: start from characters (one per
      * code point), repeatedly merge the LOWEST-RANK adjacent pair (the
      * GPT-2 `bpe()` loop). */
    def encodeWord(word: String): Seq[String] = {
      if (word.isEmpty) return Nil
      var parts: Array[String] = codePointStrings(word)
      var done = parts.length <= 1
      while (!done) {
        var best = -1; var bestRank = Int.MaxValue
        var i = 0
        while (i < parts.length - 1) {
          val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
          if (r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          val (a, b) = (parts(best), parts(best + 1))
          val out = mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < parts.length) {
            if (j < parts.length - 1 && parts(j) == a && parts(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += parts(j); j += 1 }
          }
          parts = out.toArray
          done = parts.length <= 1
        }
      }
      parts.toIndexedSeq
    }

    def encode(text: String): Seq[String] =
      if (text == null) Nil
      else WordRegex.findAllIn(text).flatMap(encodeWord).toIndexedSeq

    def countTokens(text: String): Int =
      if (text == null) 0
      else WordRegex.findAllIn(text).map(encodeWord(_).size).sum

    def toJson: String =
      merges.map { case (a, b) => s"""[${q(a)},${q(b)}]""" }
        .mkString("""{"merges":[""", ",", "]}")
    private def q(s: String) =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
  }

  private val WordRegex = WordPattern.r

  def fromJson(json: String): BpeModel = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val arr = node.get("merges")
    require(arr != null && arr.isArray, s"malformed BPE model: $json")
    val merges = (0 until arr.size()).map { i =>
      val p = arr.get(i)
      (p.get(0).asText(), p.get(1).asText())
    }
    BpeModel(merges)
  }

  /** Learn `numMerges` merges from the corpus. `maxWords` bounds the
    * driver-side dict (top word types by frequency — dropping the long
    * tail of rare types barely moves pair statistics but keeps the
    * driver cost independent of corpus vocabulary). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 65536): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    // one distributed pass: corpus -> word-frequency table, driver takes
    // the bounded top slice (deterministic tie-break on the word itself)
    val wf = df
      .select(explode(regexp_extract_all(col(textCol), lit(WordPattern),
        lit(0))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    BpeModel(learnMerges(wf, numMerges))
  }

  /** The driver-side merge-learning loop over a word-frequency dict —
    * classic Sennrich with incremental pair statistics; factored out so
    * the incremental bookkeeping can be property-tested against a naive
    * recount-everything reimplementation. */
  private[graft] def learnMerges(wf: Array[(String, Long)],
      numMerges: Int): IndexedSeq[(String, String)] = {
    val words: Array[Array[String]] = wf.map(w => codePointStrings(w._1))
    val counts: Array[Long] = wf.map(_._2)
    // incremental pair statistics: global weighted pair counts + an index
    // from pair -> word ids that (at some point) contained it; stale index
    // entries are filtered by re-checking containment at merge time
    val pairCounts = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPairs(wi: Int, sign: Long): Unit = {
      val syms = words(wi); val c = counts(wi) * sign
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val n = pairCounts.getOrElse(p, 0L) + c
        if (n == 0L) pairCounts.remove(p) else pairCounts.update(p, n)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(addPairs(_, 1L))

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = pairCounts.isEmpty
    while (merges.size < numMerges && !exhausted) {
      // best = max count, ties to the lexicographically smallest pair
      var best: (String, String) = null; var bestC = 0L
      pairCounts.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && best != null &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      if (best == null) exhausted = true
      else {
        merges += best
        val hit = pairWords.getOrElse(best, mutable.BitSet.empty).toArray
        hit.foreach { wi =>
          val syms = words(wi)
          var contains = false
          var i = 0
          while (i < syms.length - 1 && !contains) {
            contains = syms(i) == best._1 && syms(i + 1) == best._2
            i += 1
          }
          if (contains) {
            addPairs(wi, -1L)
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += (best._1 + best._2); j += 2
              } else { out += syms(j); j += 1 }
            }
            words(wi) = out.toArray
            addPairs(wi, 1L)
          }
        }
        pairWords.remove(best)
        exhausted = pairCounts.isEmpty
      }
    }
    merges.toIndexedSeq
  }

  /** Train once, cache as JSON at `cacheDir/bpe_m<numMerges>_w<maxWords>
    * .json`, reuse on later calls — the PQ.trainOrLoad pattern for
    * repeated-run surfaces (Verify/Bench). Params are part of the file
    * name, so a different configuration never reads a stale cache. */
  def trainOrLoad(cacheDir: String, df: DataFrame, textCol: String,
      numMerges: Int, maxWords: Int = 65536): BpeModel = {
    val p = java.nio.file.Paths.get(cacheDir, s"bpe_m${numMerges}_w$maxWords.json")
    if (java.nio.file.Files.exists(p))
      return fromJson(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    val m = train(df, textCol, numMerges, maxWords)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, m.toJson.getBytes("UTF-8"))
    m
  }

  /** Token count under a trained model, as a narrow-map column (merge
    * ranks ride the closure — broadcast once per job). */
  def tokenCountUdf(model: BpeModel) = {
    model.ranks // force materialization before the closure ships
    udf { (s: String) => model.countTokens(s) }
  }

  /** Token pieces under a trained model. */
  def tokensUdf(model: BpeModel) = {
    model.ranks
    udf { (s: String) => model.encode(s) }
  }
}
