package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.functions.sparse_dot

/** [[graft.functions.SparseDot]]: merge-pass dot over term-sorted
  * sparse vectors — value AND accumulation order (ascending term, the
  * oracle contract) pinned against a scala-side reference. */
class SparseDotSpec extends SparkSuite {
  import spark.implicits._

  private def ref(a: Seq[(String, Double)], b: Seq[(String, Double)]): Double = {
    val mb = b.toMap
    // left fold over a's shared terms in a's (ascending-term) order —
    // the exact sequence the previous HOF scorer and the SQL mirror use
    a.filter(s => mb.contains(s._1))
      .foldLeft(0.0)((acc, s) => acc + s._2 * mb(s._1))
  }

  test("sparse_dot == ascending-term left fold, codegen path") {
    val rnd = new scala.util.Random(99)
    val vocab = ('a' to 'z').map(_.toString)
    val rows = (0 until 200).map { i =>
      def vec() = rnd.shuffle(vocab).take(2 + rnd.nextInt(12)).sorted
        .map(t => (t, rnd.nextDouble() * 2 - 1))
      (i.toLong, vec(), vec())
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        col("a").cast("array<struct<term:string,u:double>>").as("a"),
        col("b").cast("array<struct<term:string,u:double>>").as("b"))
    val got = df.select(col("id"), sparse_dot(col("a"), col("b")).as("d"))
      .as[(Long, Double)].collect().toMap
    rows.foreach { case (i, a, b) =>
      val want = ref(a, b)
      assert(got(i) == want, s"row $i: ${got(i)} vs $want") // bit-exact
    }
  }

  test("nulls and empties are safe") {
    val df = Seq((1L, Seq(("a", 1.0)), Seq.empty[(String, Double)]))
      .toDF("id", "a", "b")
      .select(col("id"),
        col("a").cast("array<struct<term:string,u:double>>").as("a"),
        col("b").cast("array<struct<term:string,u:double>>").as("b"))
    assert(df.select(sparse_dot(col("a"), col("b"))).head().getDouble(0) == 0.0)
    assert(df.select(sparse_dot(lit(null).cast(
      "array<struct<term:string,u:double>>"), col("a"))).head().isNullAt(0))
  }
}
