package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Search
import graft.functions.MaxSim
import graft.functions.functions.{maxsim, tokens_lit}

/** Late-interaction MaxSim: expression parity (codegen vs interpreted vs an
  * independent Scala recompute), error contracts, and the
  * [[Search.maxsimSearch]] brute / pooled-coarse paths. */
class MaxSimSpec extends SparkSuite {

  private val rnd = new scala.util.Random(41)
  private def tok(dim: Int): Seq[Float] = Seq.fill(dim)(rnd.nextFloat() * 2 - 1)

  /** Independent reference: plain Scala, same accumulation order. */
  private def refMaxsim(doc: Seq[Seq[Float]], qry: Seq[Seq[Double]],
      metric: String): Double = {
    var acc = 0.0
    for (q <- qry) {
      var best = Double.NegativeInfinity
      for (d <- doc) {
        var dot = 0.0; var nu = 0.0; var nv = 0.0
        for (i <- q.indices) {
          val a = q(i); val b = d(i).toDouble
          dot += a * b; nu += a * a; nv += b * b
        }
        val sim = if (metric == "dot") dot else dot / math.sqrt(nu * nv)
        if (sim > best) best = sim
      }
      acc += best
    }
    -acc
  }

  test("codegen matches interpreted eval and a Scala recompute (dot, cosine)") {
    import spark.implicits._
    val dim = 8
    val docs = Seq.tabulate(32)(i => (i.toLong, Seq.fill(3 + i % 4)(tok(dim))))
    val qry = Seq.fill(5)(tok(dim).map(_.toDouble))
    val df = docs.toDF("id", "tokens")
    for (m <- Seq("dot", "cosine")) {
      val got = df.withColumn("s", maxsim(col("tokens"), tokens_lit(qry), m))
        .select("id", "s").as[(Long, Double)].collect().toMap
      docs.foreach { case (id, d) =>
        val want = refMaxsim(d, qry, m)
        assert(got(id) == want, s"codegen vs scala, metric $m id $id")
        // interpreted eval (Literal children, no codegen) must agree bit-exactly
        val expr = MaxSim(
          Literal.create(d, ArrayType(ArrayType(FloatType))),
          Literal.create(qry, ArrayType(ArrayType(DoubleType))), m)
        assert(expr.eval(InternalRow.empty) == want, s"interpreted, metric $m id $id")
      }
    }
  }

  test("double-typed doc tokens and single-token degenerate case") {
    import spark.implicits._
    val doc = Seq(Seq(1.0, 2.0, 3.0))
    val qry = Seq(Seq(0.5, -1.0, 2.0))
    val df = Seq(Tuple1(doc)).toDF("tokens")
    val got = df.select(maxsim(col("tokens"), tokens_lit(qry), "dot"))
      .as[Double].head()
    assert(got == -(0.5 - 2.0 + 6.0))
  }

  test("empty token sets and dim mismatches throw") {
    import spark.implicits._
    val qry = Seq(Seq(1.0, 2.0))
    val empty = Seq(Tuple1(Seq.empty[Seq[Float]])).toDF("tokens")
    val e1 = intercept[Exception] {
      empty.select(maxsim(col("tokens"), tokens_lit(qry), "dot")).collect()
    }
    assert(e1.getMessage.contains("empty token set") ||
      e1.getCause != null && e1.getCause.getMessage.contains("empty token set"))
    val bad = Seq(Tuple1(Seq(Seq(1.0f, 2.0f, 3.0f)))).toDF("tokens")
    val e2 = intercept[Exception] {
      bad.select(maxsim(col("tokens"), tokens_lit(qry), "cosine")).collect()
    }
    assert(e2.getMessage.contains("dim mismatch") ||
      e2.getCause != null && e2.getCause.getMessage.contains("dim mismatch"))
    intercept[IllegalArgumentException](
      MaxSim(Literal.create(Seq(Seq(1.0f)), ArrayType(ArrayType(FloatType))),
        Literal.create(Seq(Seq(1.0)), ArrayType(ArrayType(DoubleType))), "l2"))
  }

  test("maxsimSearch: brute top-k matches a full Scala ranking") {
    import spark.implicits._
    val dim = 8
    val docs = Seq.tabulate(60)(i => (i.toLong, Seq.fill(4)(tok(dim))))
    val qry = Seq.fill(3)(tok(dim).map(_.toDouble))
    val df = docs.toDF("doc", "tokens")
    for (m <- Seq("dot", "cosine")) {
      val got = Search.maxsimSearch(df, "tokens", qry, m, k = 7,
          tieBreak = Seq("doc"))
        .select("doc").as[Long].collect().toSeq
      val want = docs.map { case (id, d) => (id, refMaxsim(d, qry, m)) }
        .sortBy { case (id, s) => (s, id) }.take(7).map(_._1)
      assert(got == want, s"brute maxsim top-k, metric $m")
    }
  }

  test("maxsimJoin: per-query top-k matches per-query maxsimSearch; " +
      "token matrices never shuffle; chunked path identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 8
    val docs = Seq.tabulate(40)(i => (i.toLong, Seq.fill(3 + i % 3)(tok(dim))))
    // materialize like a real table (the fixture's own repartition would
    // otherwise show up as a corpus shuffle in the plan assertion)
    val corpusDir = java.nio.file.Files.createTempDirectory("graft-msjoin").toString
    docs.toDF("doc", "tokens").repartition(4).write.mode("overwrite").parquet(corpusDir)
    val corpus = spark.read.parquet(corpusDir)
    val qdocs = Seq.tabulate(4)(i => (100L + i, Seq.fill(2)(tok(dim))))
    val queries = qdocs.toDF("q_doc", "q_toks")
    def collectJoin(cap: Long): Set[(Long, Long, Double)] =
      Search.maxsimJoin(corpus, "tokens", "doc", queries, "q_doc", "q_toks",
          "cosine", k = 5, tieBreak = Seq("doc"), broadcastCapBytes = cap)
        .select("q_doc", "doc", Search.DistCol)
        .as[(Long, Long, Double)].collect().toSet
    val joined = collectJoin(Search.QueryBroadcastCap)
    // reference: one maxsimSearch per query
    val want = qdocs.flatMap { case (qid, toks) =>
      Search.maxsimSearch(corpus, "tokens",
          toks.map(_.map(_.toDouble)), "cosine", k = 5, tieBreak = Seq("doc"))
        .select("doc", Search.DistCol).as[(Long, Double)].collect()
        .map { case (d, s) => (qid, d, s) }
    }.toSet
    assert(joined == want, "maxsimJoin must equal per-query maxsimSearch")
    // forced chunking (2 KB cap): bit-identical
    assert(collectJoin(2048) == joined, "chunked path must be identical")
    // codes-light contract: no ShuffleExchange carries a token matrix
    val planned = Search.maxsimJoin(corpus, "tokens", "doc", queries,
      "q_doc", "q_toks", "cosine", k = 5, tieBreak = Seq("doc"))
    val fmt = planned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val shuffleBlocks = fmt.split("\n\n")
      .filter(_.linesIterator.hasNext)
      .filter(_.linesIterator.next().matches("""\(\d+\) Exchange.*"""))
    assert(shuffleBlocks.nonEmpty, s"expected the window exchange in:\n$fmt")
    shuffleBlocks.foreach { b =>
      assert(!b.contains("tokens#") && !b.contains("q_toks#"),
        s"token matrix rides a shuffle:\n$b")
    }
  }

  test("Engine.maxsimSearch: indexed serving path prunes cells and stays exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 8
    val centers = Seq.fill(4)(Array.fill(dim)(rnd.nextDouble() * 10 - 5))
    val docs = Seq.tabulate(80) { i =>
      val c = centers(i % 4)
      (i.toLong, Seq.fill(5)(c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq))
    }
    val df = docs.toDF("doc", "tokens")
      .withColumn("pool", graft.functions.functions.pooled_tokens(col("tokens")))
    val root = java.nio.file.Files.createTempDirectory("graft-maxsim-ivf").toString
    val engine = new graft.api.Engine(spark, root)
    engine.makeTable("msd", df)
    engine.makeIndex("msc", "msd", "pool",
      graft.coder.CoderConfig(metric = "cosine", codebookSize = 4,
        numCodebooks = 1, batchSize = 64, numEpochs = 3))
    val qry = Seq.fill(3)(centers(0).map(x => x + rnd.nextGaussian() * 0.1).toSeq)
    def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.select("doc").as[Long].collect().toSeq
    val brute = ids(engine.maxsimSearch("msd", "tokens", qry, "cosine",
      k = 10, tieBreak = Seq("doc")))
    // full probes + full candidates: exact through the index
    val full = ids(engine.maxsimSearch("msd", "tokens", qry, "cosine",
      k = 10, candidates = 80, poolCol = Some("pool"), coding = Some("msc"),
      probes = Some(4), idCol = Some("doc"), tieBreak = Seq("doc")))
    assert(full == brute, "indexed maxsim at full budgets must equal brute")
    // pruned probes + tight candidates: the query sits on center 0, so the
    // probed coarse stage must still recover the true top-10
    val pruned = ids(engine.maxsimSearch("msd", "tokens", qry, "cosine",
      k = 10, candidates = 20, poolCol = Some("pool"), coding = Some("msc"),
      probes = Some(1), idCol = Some("doc"), tieBreak = Seq("doc")))
    assert(pruned == brute, "clustered fixture: probes=1 must recover the top-10")
    // misuse guards
    intercept[IllegalArgumentException](engine.maxsimSearch("msd", "tokens",
      qry, "cosine", k = 10, coding = Some("msc"), probes = Some(1)))
    engine.remove()
  }

  test("maxsimSearch: pooled coarse stage — exact at full budget, useful below it") {
    import spark.implicits._
    val dim = 8
    // clustered corpus: docs near one of 6 centers; query tokens near
    // center 0, so its docs must win and pooled prefilter must keep them
    val centers = Seq.fill(6)(Array.fill(dim)(rnd.nextDouble() * 10 - 5))
    val docs = Seq.tabulate(120) { i =>
      val c = centers(i % 6)
      (i.toLong, Seq.fill(4)(c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat).toSeq))
    }
    val qry = Seq.fill(3)(centers(0).map(x => x + rnd.nextGaussian() * 0.1).toSeq)
    val df = docs.toDF("doc", "tokens").repartition(4)
    val brute = Search.maxsimSearch(df, "tokens", qry, "cosine", k = 10,
        tieBreak = Seq("doc"))
      .select("doc").as[Long].collect().toSeq
    // full budget: two-stage plan, identical result (the oracle contract)
    val full = Search.maxsimSearch(df, "tokens", qry, "cosine", k = 10,
        candidates = 120, tieBreak = Seq("doc"))
      .select("doc").as[Long].collect().toSeq
    assert(full == brute, "pooled path at full budget must equal brute")
    // tight budget: 20 pooled survivors out of 120 still recover the top-10
    val tight = Search.maxsimSearch(df, "tokens", qry, "cosine", k = 10,
        candidates = 20, tieBreak = Seq("doc"))
      .select("doc").as[Long].collect().toSeq
    assert(tight == brute, "cluster fixture: pooled@20 must recover the top-10")
  }
}
