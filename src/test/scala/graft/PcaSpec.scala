package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.Embeddings

/** PCA / whitening: spectrum recovery, orthonormality, whitened variance,
  * projection parity (codegen vs interpreted vs driver math), model
  * persistence, and the Engine lifecycle. */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(71)

  /** Corpus with a known decaying spectrum: x = Σ_j σ_j·g_j·b_j + mean,
    * where b_j are orthonormal axis-aligned directions. */
  private def corpus(n: Int, d: Int, sigmas: Seq[Double]): Seq[Seq[Float]] =
    Seq.fill(n) {
      val coords = sigmas.map(s => s * rnd.nextGaussian())
      Seq.tabulate(d)(i => (coords.applyOrElse(i, (_: Int) => 0.0) + i * 0.5).toFloat)
    }

  test("recovers a planted decaying spectrum with orthonormal components") {
    val d = 12
    val sigmas = Seq(8.0, 4.0, 2.0, 1.0)
    val df = corpus(4000, d, sigmas).map(Tuple1(_)).toDF("vec")
    val m = Embeddings.pcaTrain(df, "vec", k = 4)
    // eigenvalues ≈ σ² in order (sampling noise at 4000 rows is a few %)
    m.eigenvalues.zip(sigmas).foreach { case (ev, s) =>
      assert(math.abs(ev - s * s) / (s * s) < 0.15,
        s"eigenvalue $ev vs planted ${s * s}")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1)), "not sorted desc")
    // components orthonormal; each aligned with its planted axis
    for (r <- 0 until 4; q <- r until 4) {
      val dot = (0 until d).map(i => m.components(r)(i) * m.components(q)(i)).sum
      val want = if (r == q) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"component dot ($r,$q) = $dot")
    }
    for (r <- 0 until 4)
      assert(math.abs(m.components(r)(r)) > 0.98,
        s"component $r not aligned with planted axis: ${m.components(r).toSeq}")
  }

  test("whitened projections have ~unit variance; projection is codegen-parity") {
    val d = 10
    val df = corpus(3000, d, Seq(6.0, 3.0, 1.5)).map(Tuple1(_)).toDF("vec")
    val m = Embeddings.pcaTrain(df, "vec", k = 3, whiten = true)
    val proj = Embeddings.project(df, "vec", m, "p")
      .select($"p").as[Seq[Double]].collect()
    for (r <- 0 until 3) {
      val xs = proj.map(_(r))
      val mu = xs.sum / xs.length
      val v = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(v - 1.0) < 0.1, s"whitened variance component $r: $v")
    }
    // parity: codegen path == interpreted eval == driver recompute
    val rows = df.select($"vec").as[Seq[Float]].collect()
    val got = proj.head
    val x = rows.head
    val want = m.components.map { c =>
      var acc = 0.0
      var i = 0
      while (i < d) { acc += c(i) * (x(i).toDouble - m.mean(i)); i += 1 }
      acc
    }.toSeq
    assert(got == want, "codegen vs driver recompute")
    val expr = graft.functions.PcaProject(
      Literal.create(x, ArrayType(FloatType)), m.mean.toIndexedSeq, m.flat)
    val interp = expr.eval(InternalRow.empty)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray.toSeq
    assert(interp == want, "interpreted vs driver recompute")
  }

  test("model JSON round-trip is exact; Engine lifecycle persists") {
    val root = java.nio.file.Files.createTempDirectory("graft-pca").toString
    val engine = new graft.api.Engine(spark, root)
    val df = corpus(500, 6, Seq(3.0, 1.0)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    engine.makeTable("pv", df)
    val m = engine.trainPca("pw", "pv", "vec", k = 2, whiten = true)
    val back = engine.store.loadPcaModel("pw")
    assert(back.mean.toSeq == m.mean.toSeq, "mean round-trip")
    assert(back.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq,
      "components round-trip")
    assert(back.eigenvalues.toSeq == m.eigenvalues.toSeq && back.whitened,
      "eigenvalues/whitened round-trip")
    assert(engine.store.listPcaModels() == Seq("pw"))
    // projection under the loaded model equals projection under the fresh one
    val a = engine.projectPca("pv", "vec", "pw", "p")
      .select($"id", $"p").as[(Long, Seq[Double])].collect().toMap
    val b = Embeddings.project(engine.readTable(Seq("pv")), "vec", m, "p")
      .select($"id", $"p").as[(Long, Seq[Double])].collect().toMap
    assert(a == b, "persisted model must project identically")
    engine.remove()
  }

  test("PCA→IVF pipeline: rank-limited corpus searches losslessly in reduced space") {
    val d = 32
    val sigmas = Seq(8.0, 6.0, 4.0, 3.0, 2.0, 1.0) // rank-6 signal
    val rows = corpus(2000, d, sigmas).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "vec")
    val m = Embeddings.pcaTrain(df, "vec", k = 6)
    val root = java.nio.file.Files.createTempDirectory("graft-pca-ivf").toString
    val engine = new graft.api.Engine(spark, root)
    // reduced table: 32-d floats → 6-d projections, indexed like any vector
    engine.makeTable("pvt", Embeddings.project(df, "vec", m, "pvec")
      .select($"id", $"pvec"))
    engine.makeIndex("pc", "pvt", "pvec",
      graft.coder.CoderConfig(metric = "l2", codebookSize = 4,
        numCodebooks = 1, batchSize = 256, numEpochs = 3))
    val target = rows(5)._2
    // project the query the same way (driver math == PcaProject by parity test)
    val pt = m.components.map { c =>
      var acc = 0.0
      var i = 0
      while (i < d) { acc += c(i) * (target(i).toDouble - m.mean(i)); i += 1 }
      acc
    }
    val reduced = engine.search("pvt", "pvec", pt, coding = Some("pc"),
        probes = Some(4), k = 10, tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    val brute = graft.api.Search.knn(df, "vec",
        Seq(Tuple1(target.map(_.toDouble))).toDF("t"), "l2", k = 10,
        tieBreak = Seq("id"))
      .select("id").as[Long].collect().toSeq
    // rank-6 data + k=6 orthonormal components ⇒ pairwise distances are
    // exactly preserved (up to fp rounding), so the reduced-space search
    // must return the original-space answer
    assert(reduced == brute,
      s"reduced-space search diverged: $reduced vs $brute")
    engine.remove()
  }

  test("error contracts: dim mismatch, empty input, k too large") {
    val df = corpus(50, 4, Seq(1.0)).map(Tuple1(_)).toDF("vec")
    val m = Embeddings.pcaTrain(df, "vec", k = 2)
    val bad = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("vec")
    val e = intercept[Exception](
      Embeddings.project(bad, "vec", m).select("projection").collect())
    assert(e.getMessage.contains("dim mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dim mismatch"))
    intercept[IllegalArgumentException](
      Embeddings.pcaTrain(df, "vec", k = 10))
    val empty = Seq.empty[Tuple1[Seq[Float]]].toDF("vec")
    intercept[IllegalArgumentException](Embeddings.pcaTrain(empty, "vec", k = 1))
  }
}
