package graft.ext

import org.apache.spark.sql.{Encoder, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * typed `Aggregator` — a mergeable frequency sketch for heavy-hitter
  * counting over keys too numerous to groupBy exactly. Deterministic
  * (fixed seeds), and mergeable across partitions, so it runs as a
  * map-side-combined aggregate with a w·d-long buffer regardless of key
  * cardinality — the reason to use it at 100 TB instead of an exact
  * groupBy whose state is O(distinct keys).
  *
  * Guarantee: estimate(k) ≥ true(k), and ≤ true(k) + εN with probability
  * 1−δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.
  */
case class CountMinSketch(width: Int, depth: Int) {
  def serializedSize: Int = width * depth
}

class CountMinAgg(width: Int = 1024, depth: Int = 4)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private def bucket(key: Long, row: Int): Int = {
    var h = key * 0x9E3779B97F4A7C15L + (row + 1) * 0xC2B2AE3D27D4EB4FL
    h ^= (h >>> 29); h *= 0xBF58476D1CE4E5B9L; h ^= (h >>> 32)
    ((h & Long.MaxValue) % width).toInt
  }
  override def zero: Array[Long] = new Array[Long](width * depth)
  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    var r = 0
    while (r < depth) { b(r * width + bucket(key, r)) += 1; r += 1 }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** Point-estimate a key's frequency from a finished sketch. */
  def estimate(sketch: Array[Long], key: Long): Long = {
    var min = Long.MaxValue; var r = 0
    while (r < depth) {
      val v = sketch(r * width + bucket(key, r))
      if (v < min) min = v
      r += 1
    }
    min
  }
}
