package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.core.Metrics

/** Property-based invariants (the reference's suite has none — SURVEY §5
  * calls this out as a gap our engine should exceed). These run on the
  * driver against the same scalar kernels the codegen'd expressions
  * mirror (parity between the two is asserted elsewhere, e.g.
  * PQSpec "interpreted-mode parity", SqSpec "bit-identical"), so an
  * invariant proven here holds for the distributed path too.
  */
class PropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(prop: Prop, minTests: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(minTests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      prop)
    assert(res.passed, res.status.toString)
  }

  private val dim = 16
  private val vecGen: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](dim, Gen.chooseNum(-100.0, 100.0))
  private val nonZeroVecGen: Gen[Array[Double]] =
    vecGen.suchThat(v => v.exists(x => math.abs(x) > 1e-9))

  test("metric identities: self-distance, symmetry, ranges") {
    check(Prop.forAll(nonZeroVecGen, nonZeroVecGen) { (u, v) =>
      val self = Metrics.dist(u, u, "l2") == 0.0 &&
        math.abs(Metrics.dist(u, u, "cosine")) < 1e-12
      val sym = Metrics.All.forall { m =>
        math.abs(Metrics.dist(u, v, m) - Metrics.dist(v, u, m)) < 1e-12
      }
      val c = Metrics.dist(u, v, "cosine")
      val ranges = c >= -1e-12 && c <= 1.0 + 1e-12 &&
        Metrics.dist(u, v, "l2") >= 0.0
      val ip = u.zip(v).map { case (a, b) => a * b }.sum
      val dotIsNegIp = math.abs(Metrics.dist(u, v, "dot") + ip) < 1e-6
      self && sym && ranges && dotIsNegIp
    })
  }

  test("l2 triangle inequality") {
    check(Prop.forAll(vecGen, vecGen, vecGen) { (a, b, c) =>
      Metrics.dist(a, c, "l2") <=
        Metrics.dist(a, b, "l2") + Metrics.dist(b, c, "l2") + 1e-9
    })
  }

  test("normalize is idempotent and unit-length on nonzero vectors") {
    check(Prop.forAll(nonZeroVecGen) { v =>
      val n1 = Metrics.normalize(v)
      val len = math.sqrt(n1.map(x => x * x).sum)
      val n2 = Metrics.normalize(n1)
      math.abs(len - 1.0) < 1e-9 &&
        n1.zip(n2).forall { case (a, b) => math.abs(a - b) < 1e-12 }
    })
  }

  test("cosine distance is invariant under positive scaling") {
    check(Prop.forAll(nonZeroVecGen, nonZeroVecGen,
        Gen.chooseNum(0.001, 1000.0)) { (u, v, s) =>
      math.abs(Metrics.dist(u, v, "cosine") -
        Metrics.dist(u.map(_ * s), v, "cosine")) < 1e-9
    })
  }

  test("quantize/dequantize round-trip error is bounded by scale/2 per element") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val scale = 0.5f
    val zp = 128f
    // the PRODUCTION kernels: the Quantize/Dequantize expressions'
    // interpreted path (asserted bit-identical to codegen in SqSpec and
    // to the ingest UDF), evaluated directly on literals
    def roundTrip(v: Array[Float]): Array[Float] = {
      val bytes = graft.functions.Quantize(
          Literal.create(v, ArrayType(FloatType, containsNull = false)),
          scale, zp)
        .eval(null).asInstanceOf[Array[Byte]]
      graft.functions.Dequantize(Literal.create(bytes, BinaryType), scale, zp)
        .eval(null).asInstanceOf[ArrayData].toFloatArray()
    }
    // representable range of the affine: [(0-zp)*scale, (255-zp)*scale]
    val inRange = Gen.containerOfN[Array, Float](dim,
      Gen.chooseNum((-zp * scale).toDouble, ((255 - zp) * scale).toDouble)
        .map(_.toFloat))
    check(Prop.forAll(inRange) { v =>
      v.zip(roundTrip(v)).forall { case (orig, rt) =>
        math.abs(orig - rt) <= scale / 2 + 1e-6
      }
    })
  }

  test("winnowing guarantee: a shared run of >= k+w-1 chars shares a fingerprint") {
    // plain-Scala winnow (the same independent reimplementation the
    // TextAnalysisSpec equivalence test pins to the Column code)
    def winnow(text: String, k: Int, w: Int): Set[Long] = {
      val c = text.toLowerCase.toCharArray
      if (c.length < k) Set.empty
      else {
        val M = 1000000007L
        val h = (0 to c.length - k).map { i =>
          var acc = 0L
          (0 until k).foreach(j => acc = (acc * 257 + c(i + j)) % M)
          acc
        }
        val nw = math.max(h.length - w + 1, 1)
        (0 until nw).map(t => h.slice(t, t + w).min).toSet
      }
    }
    val (k, w) = (5, 4)
    val word = Gen.nonEmptyContainerOf[Array, Char](Gen.alphaLowerChar)
      .map(new String(_))
    val textGen = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val sharedGen = Gen.listOfN(8, word).map(_.mkString(" "))
      .suchThat(_.length >= k + w - 1)
    check(Prop.forAll(textGen, textGen, sharedGen) { (pre, post, shared) =>
      winnow(s"$pre $shared", k, w)
        .intersect(winnow(s"$shared $post", k, w)).nonEmpty
    }, minTests = 50)
  }

  test("winnow kernel: unicode parity with a direct reimplementation; " +
      "shared runs share a fingerprint") {
    // the PRODUCTION kernel (Winnow.compute — the same code the codegen'd
    // expression calls) vs a direct non-rolling code-point fold
    def winnowRef(text: String, k: Int, w: Int): Set[Long] = {
      val c = text.codePoints().toArray
      if (c.length < k) Set.empty
      else {
        val M = 1000000007L
        val h = (0 to c.length - k).map { i =>
          var acc = 0L
          (0 until k).foreach(j => acc = (acc * 257 + c(i + j)) % M)
          acc
        }
        val nw = math.max(h.length - w + 1, 1)
        (0 until nw).map(t => h.slice(t, t + w).min).toSet
      }
    }
    def kernel(text: String, k: Int, w: Int): Set[Long] =
      graft.functions.Winnow.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), k, w)
        .toLongArray().toSet
    val (k, w) = (5, 4)
    // mixed scripts incl. surrogate-pair (non-BMP) code points
    val charGen = Gen.oneOf(
      Gen.alphaLowerChar.map(_.toString),
      Gen.oneOf("α", "β", "機", "器", "学", "習", " ", "é", "ß"),
      Gen.oneOf("𝔘", "𐍈", "🙂")) // non-BMP: surrogate pairs in UTF-16
    val textGen = Gen.listOf(charGen).map(_.mkString)
    check(Prop.forAll(textGen) { t =>
      kernel(t, k, w) == winnowRef(t, k, w)
    })
    // the winnowing guarantee holds for unicode text too
    val runGen = Gen.listOfN(12, charGen).map(_.mkString)
      .suchThat(_.codePoints().count() >= k + w - 1)
    check(Prop.forAll(textGen, textGen, runGen) { (pre, post, shared) =>
      kernel(s"$pre $shared", k, w)
        .intersect(kernel(s"$shared $post", k, w)).nonEmpty
    }, minTests = 50)
  }

  test("bpe invariants: concatenated pieces reproduce the word; counts add up") {
    val wordGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val corpusGen = Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, wordGen))
    // driver-side merge learning on the word-freq dict is exercised via
    // the Spark path elsewhere (BpeSpec); here the ENCODE invariants:
    // pieces concatenate back to the word, token counts are consistent,
    // and encoding is deterministic
    val merges = graft.ext.Bpe.BpeModel(Vector(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("e", "w"),
      ("a", "n"), ("an", "d"), ("t", "h"), ("th", "e")))
    check(Prop.forAll(wordGen) { word =>
      val pieces = merges.encodeWord(word)
      pieces.mkString == word && pieces.forall(_.nonEmpty) &&
        merges.encodeWord(word) == pieces
    })
    check(Prop.forAll(corpusGen) { words =>
      val text = words.mkString(" ")
      merges.countTokens(text) == words.map(merges.encodeWord(_).size).sum
    })
  }

  test("bpe merge learning: incremental pair stats match a naive recount trainer") {
    // naive reference: recount EVERY pair from scratch each iteration —
    // O(merges × dict × len), obviously correct; the production trainer
    // maintains counts incrementally and must produce the identical
    // merge sequence on any dict
    def naive(wf0: Array[(String, Long)], numMerges: Int): Seq[(String, String)] = {
      var words = wf0.map { case (w, c) => (w.map(_.toString).toArray, c) }
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.size < numMerges && !done) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- words; i <- 0 until syms.length - 1)
          pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + c
        if (pc.isEmpty) done = true
        else {
          val best = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
          merges += best
          words = words.map { case (syms, c) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
                out += (best._1 + best._2); j += 2
              } else { out += syms(j); j += 1 }
            }
            (out.toArray, c)
          }
        }
      }
      merges.toSeq
    }
    val wordGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val dictGen = Gen.chooseNum(1, 15).flatMap(n =>
      Gen.listOfN(n, Gen.zip(wordGen, Gen.chooseNum(1L, 9L))))
      .map(_.groupMapReduce(_._1)(_._2)(_ + _).toArray.sortBy(_._1))
    check(Prop.forAll(dictGen, Gen.chooseNum(0, 12)) { (wf, n) =>
      graft.ext.Bpe.learnMerges(wf, n) == naive(wf, n)
    }, minTests = 200)
  }

  test("aHash is invariant under lossless re-encodes on random images") {
    import graft.ext.Multimodal
    val pixGen = Gen.containerOfN[Array, Int](16 * 16, Gen.chooseNum(0, 0xFFFFFF))
    check(Prop.forAll(pixGen) { px =>
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, px(y * 16 + x))
      val h = Multimodal.aHash64(img)
      h == Multimodal.aHash64(
        Multimodal.decodeImage(Multimodal.encodeImage(img, "png"))) &&
        h == Multimodal.aHash64(
          Multimodal.decodeImage(Multimodal.encodeImage(img, "bmp")))
    }, minTests = 30)
  }
}
