package graft

import org.apache.spark.sql.functions._

import graft.ext.Validate
import graft.ext.Validate._

class ValidateSpec extends SparkSuite {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame,
      checks: Seq[Check]): Map[String, (Long, Boolean)] =
    Validate.validate(df, checks).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap

  test("scalar checks count violations exactly") {
    val df = Seq(
      (Some(1L), Some(0.05), "A", "ab12"),
      (Some(2L), Some(0.20), "B", "cd34"),
      (None, Some(0.08), "A", "xy"),       // null id; regex miss
      (Some(2L), None, "C", "ef56"),       // dup id; set miss
    ).toDF("id", "rate", "flag", "code")
    val rep = report(df, Seq(
      NotNull("id"),
      Unique(Seq("id")),
      InRange("rate", 0.0, 0.10),
      InSet("flag", Seq("A", "B")),
      Matches("code", "[a-z]{2}[0-9]{2}"),
      RowCountAtLeast(10L),
    ))
    assert(rep("not_null(id)") == (1L, false))
    assert(rep("unique(id)") == (1L, false))       // two rows share id 2
    assert(rep("in_range(rate)") == (1L, false))   // 0.20
    assert(rep("in_set(flag)") == (1L, false))     // C
    assert(rep("matches(code)") == (1L, false))    // xy
    assert(rep("row_count_at_least(10)") == (6L, false)) // 10 - 4
  }

  test("passing checks report zero violations") {
    val df = Seq((1L, "A"), (2L, "B")).toDF("id", "flag")
    val rep = report(df, Seq(
      NotNull("id"), Unique(Seq("id")), InSet("flag", Seq("A", "B")),
      RowCountAtLeast(2L)))
    assert(rep.values.forall { case (v, p) => v == 0L && p })
  }

  test("multi-column uniqueness ignores NULL-containing tuples") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("x")),  // dup tuple
      (Some(1L), Some("y")),
      (None, Some("x")), (None, Some("x")),          // NULLs: not counted
    ).toDF("a", "b")
    val rep = report(df, Seq(Unique(Seq("a", "b"))))
    assert(rep("unique(a,b)") == (1L, false))
  }

  test("foreign key counts dangling non-NULL references only") {
    val ref = Seq(10L, 20L).toDF("k")
    val df = Seq(Some(10L), Some(20L), Some(30L), Some(30L), None)
      .toDF("fk")
    val rep = report(df, Seq(ForeignKey("fk", ref, "k"), NotNull("fk")))
    assert(rep("foreign_key(fk)") == (2L, false)) // the two 30s; NULL exempt
    assert(rep("not_null(fk)") == (1L, false))
  }

  test("duplicate reference keys do not inflate other checks") {
    // the FK join must be 1:1 — a duplicated ref key would double rows
    // and corrupt every other count in the shared pass
    val ref = Seq(10L, 10L, 20L).toDF("k")
    val df = Seq(Some(10L), Some(10L), Some(99L), None).toDF("fk")
    val rep = report(df, Seq(
      ForeignKey("fk", ref, "k"), NotNull("fk"), RowCountAtLeast(4L)))
    assert(rep("foreign_key(fk)") == (1L, false))
    assert(rep("not_null(fk)") == (1L, false))
    assert(rep("row_count_at_least(4)") == (0L, true))
  }

  test("whole batch is one aggregation job over one scan") {
    val ref = Seq(1L, 2L).toDF("k")
    val df = (1L to 100L).map(i => (i, i % 3)).toDF("id", "fk")
    val out = Validate.validate(df, Seq(
      NotNull("id"), Unique(Seq("id")), InRange("id", 0, 1000),
      ForeignKey("fk", ref, "k")))
    val plan = out.queryExecution.executedPlan.toString
    // one scan of df: the local relation appears once
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans <= 2, s"expected df+ref scans only, got $scans:\n$plan")
  }

  test("empty table: NotNull passes, RowCountAtLeast reports shortfall") {
    val df = Seq.empty[(Option[Long], String)].toDF("id", "flag")
    val rep = report(df, Seq(NotNull("id"), RowCountAtLeast(3L)))
    assert(rep("not_null(id)") == (0L, true))
    assert(rep("row_count_at_least(3)") == (3L, false))
  }

  test("lineitem reference-data contract at sf0.001") {
    val li = sf("sf0.001", "lineitem")
    val orders = sf("sf0.001", "orders")
    val part = sf("sf0.001", "part")
    val rep = report(li, Seq(
      NotNull("l_orderkey"),
      Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_discount", 0.0, 0.1),
      InSet("l_returnflag", Seq("A", "N", "R")),
      ForeignKey("l_orderkey", orders, "o_orderkey"),
      ForeignKey("l_partkey", part, "p_partkey"),
      RowCountAtLeast(1L)))
    // the synthetic generator does NOT make (orderkey, linenumber) a key
    // — 6000 rows over 4599 distinct pairs; the check must surface that
    assert(rep("unique(l_orderkey,l_linenumber)") == (1401L, false))
    assert((rep - "unique(l_orderkey,l_linenumber)").values
      .forall { case (v, p) => v == 0L && p }, rep.toString)
  }

  test("flagViolations: per-row labels, in check order, empty = clean") {
    val dim = Seq("a", "b").toDF("k")
    val df = Seq(
      (1L, Some(0.05), "a"),  // clean
      (2L, Some(0.20), "a"),  // range
      (3L, None, "z"),        // null rate + FK miss
    ).toDF("id", "rate", "k")
    val out = Validate.flagViolations(df, Seq(
        NotNull("rate"),
        InRange("rate", 0.0, 0.10),
        ForeignKey("k", dim, "k")))
      .select(col("id"), col("violations"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("in_range(rate)"))
    assert(out(3L) == Seq("not_null(rate)", "foreign_key(k)"))
  }

  test("flagViolations rejects frame-level checks loudly") {
    val df = Seq((1L, "a")).toDF("id", "k")
    for (bad <- Seq(Unique(Seq("id")), RowCountAtLeast(5L))) {
      val e = intercept[IllegalArgumentException](
        Validate.flagViolations(df, Seq(NotNull("id"), bad)))
      assert(e.getMessage.contains("not row-attributable"), e.getMessage)
    }
  }

  test("validateGateForEachBatch: clean rows flow, violators quarantine " +
      "with batch id, storage released") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq("a", "b").toDF("k")
    val checks = Seq(
      NotNull("k"): Check,
      InRange("v", 0.0, 10.0),
      ForeignKey("k", dim, "k"))
    val clean = scala.collection.mutable.ArrayBuffer.empty[Long]
    val held = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val gate = graft.streaming.Streams.validateGateForEachBatch(
      checks,
      df => clean ++= df.select("id").as[Long].collect(),
      Some(df => held ++= df
        .select(col("id"), array_join(col("violations"), ","), col("batch_id"))
        .as[(Long, String, Long)].collect()))
    val before = spark.sparkContext.getPersistentRDDs.size
    val mem = MemoryStream[(Long, Double, String)]
    val q = mem.toDF().toDF("id", "v", "k").writeStream
      .foreachBatch(gate).outputMode("update").start()
    try {
      mem.addData((1L, 1.0, "a"), (2L, 99.0, "a")); q.processAllAvailable()
      mem.addData((3L, 2.0, "z"), (4L, 3.0, "b")); q.processAllAvailable()
    } finally q.stop()
    assert(clean.sorted.toSeq == Seq(1L, 4L))
    assert(held.sortBy(_._1).toSeq == Seq(
      (2L, "in_range(v)", 0L), (3L, "foreign_key(k)", 1L)))
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "per-batch checkpoint not released")
  }

  test("diffByKey: added/removed/changed partition the differing keys; " +
      "NULL payloads compare null-safe; bad inputs refuse") {
    import graft.ext.Validate
    val a = Seq(
      (1L, Some("x"), 10L),   // unchanged
      (2L, Some("y"), 20L),   // text changes
      (3L, None: Option[String], 30L), // NULL text both sides → unchanged
      (4L, Some("z"), 40L),   // removed in b
      (5L, None: Option[String], 50L)  // NULL → non-NULL = changed
    ).toDF("id", "text", "n")
    val b = Seq(
      (1L, Some("x"), 10L),
      (2L, Some("y2"), 20L),
      (3L, None: Option[String], 30L),
      (5L, Some("now set"), 50L),
      (6L, Some("new"), 60L)  // added
    ).toDF("id", "text", "n")
    val diff = Validate.diffByKey(a, b, "id")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(diff == Seq(2L -> "changed", 4L -> "removed",
      5L -> "changed", 6L -> "added"), diff.toString)
    // identical sides → empty diff
    assert(Validate.diffByKey(a, a, "id").isEmpty)
    // duplicate key refuses loudly
    val dup = a.unionByName(Seq((1L, Some("x"), 10L)).toDF("id", "text", "n"))
    val e1 = intercept[IllegalArgumentException](
      Validate.diffByKey(dup, b, "id"))
    assert(e1.getMessage.contains("duplicate"), e1.getMessage)
    // NULL key refuses loudly
    val nk = Seq((Option.empty[Long], Some("x"), 1L)).toDF("id", "text", "n")
    val e2 = intercept[IllegalArgumentException](
      Validate.diffByKey(a.unionByName(nk), b, "id"))
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
    // missing compared column refuses statically
    val e3 = intercept[IllegalArgumentException](
      Validate.diffByKey(a, b.drop("n"), "id"))
    assert(e3.getMessage.contains("lacks"), e3.getMessage)
  }
}
