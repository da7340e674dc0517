package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{Engine, Search}
import graft.coder.CoderConfig
import graft.core.Metrics

/** Mirror of the reference's end-to-end suite
  * (`/root/reference/tests/test_flight.py`), operation for operation, so a
  * reference user's workflow maps 1:1 onto this engine:
  *
  *   - test_make_table (42-50): put + get round-trip, exact equality;
  *   - test_make_index ×5 metrics (52-86): train {k=8,n=2}, read-back with
  *     codes equals source after dropping `__CODED_ID__`, schema is
  *     source ⊕ `__CODED_ID__: long`;
  *   - test_search_without_index ×5 (98-114): top-10, schema is
  *     select ⊕ `__DISTANCE__`;
  *   - test_search_with_index ×5 (126-149): probes=16, 10 rows, schema ⊕
  *     `__CODED_ID__` ⊕ `__DISTANCE__`;
  *   - test_remove (151-154): root fully deleted.
  *
  * Where the reference asserts only shape, we additionally assert neighbor
  * identity against an in-suite brute-force computation (SURVEY §5 gap).
  */
class ReferenceParitySpec extends SparkSuite {
  import spark.implicits._

  private lazy val root = java.nio.file.Files.createTempDirectory("refparity").toString
  private lazy val engine = new Engine(spark, root)
  private lazy val source = sf("sf0.001", "embeddings")

  private def target: Array[Double] =
    source.filter($"vec_id" === 42).select($"embedding".cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray

  test("make_table: put + get round-trip is exact") {
    engine.makeTable("vectors", source)
    val back = engine.readTable(Seq("vectors"))
    assert(back.schema == source.schema)
    assert(back.exceptAll(source).isEmpty && source.exceptAll(back).isEmpty)
  }

  for (metric <- Metrics.All) {
    test(s"make_index + read with codes [$metric]") {
      val name = s"coding_$metric"
      engine.makeIndex(name, "vectors", "embedding",
        CoderConfig(metric = metric, codebookSize = 8, numCodebooks = 2,
          batchSize = 256, numEpochs = 2))
      val withCodes = engine.readTable(Seq("vectors"),
        coding = Some((name, "embedding")))
      // schema = source ⊕ __CODED_ID__ (long, ref: int64)
      assert(withCodes.schema.fieldNames.toSeq ==
        source.schema.fieldNames.toSeq :+ Search.CodeCol)
      assert(withCodes.schema(Search.CodeCol).dataType == LongType)
      // read-back equals source after dropping the code column
      val stripped = withCodes.drop(Search.CodeCol)
      assert(stripped.exceptAll(source).isEmpty && source.exceptAll(stripped).isEmpty)
      // every code in [0, 64)
      assert(withCodes.filter(col(Search.CodeCol) < 0 || col(Search.CodeCol) >= 64).isEmpty)
    }

    test(s"search without index [$metric]") {
      val res = engine.search("vectors", "embedding", target,
        metric = Some(metric), k = 10, tieBreak = Seq("vec_id"))
      val rows = res.collect()
      assert(rows.length == 10)
      // schema = source ⊕ __DISTANCE__
      assert(res.schema.fieldNames.toSeq ==
        source.schema.fieldNames.toSeq :+ Search.DistCol)
      // beyond the reference: neighbor identity vs local brute force
      val brute = source.select($"vec_id", $"embedding".cast("array<double>"))
        .as[(Long, Seq[Double])].collect()
        .map { case (id, v) => (Metrics.dist(v.toArray, target, metric), id) }
        .sortBy(identity).take(10).map(_._2).toSeq
      assert(rows.map(_.getAs[Long]("vec_id")).toSeq == brute)
    }

    test(s"search with index, probes=16 [$metric]") {
      val res = engine.search("vectors", "embedding", target,
        coding = Some(s"coding_$metric"), probes = Some(16), k = 10,
        tieBreak = Seq("vec_id"))
      val rows = res.collect()
      assert(rows.length == 10)
      assert(res.schema.fieldNames.contains(Search.CodeCol))
      assert(res.schema.fieldNames.last == Search.DistCol)
      // distances ascending
      val dists = rows.map(_.getAs[Double](Search.DistCol)).toSeq
      assert(dists == dists.sorted)
    }
  }

  test("remove deletes the root") {
    engine.remove()
    assert(engine.listTables().isEmpty && engine.listCodings().isEmpty)
  }
}
