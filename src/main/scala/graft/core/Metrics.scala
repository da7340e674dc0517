package graft.core

/** Distance metrics of the engine.
  *
  * Semantics follow the reference engine exactly
  * (`/root/reference/src/fenix/io/coder/coder.py:38-50`):
  *   - `l2` / `euclidean`      -> sqrt(sum((u-v)^2))
  *   - `cosine`                -> 0.5 - 0.5 * cos(u,v)   (in [0, 1], NOT 1-cos)
  *   - `dot` / `inner_product` -> -(u . v)               (negated inner product)
  * All metrics are "smaller = nearer" so a single ascending top-k works.
  *
  * Computation is in double precision regardless of storage type so results
  * are reproducible against a SQL oracle computing on DOUBLE[].
  */
object Metrics {
  val All: Seq[String] = Seq("cosine", "dot", "inner_product", "l2", "euclidean")

  /** Canonicalize a user-facing metric name (validates like
    * `/root/reference/src/fenix/flight.py:254-256`). */
  def canonical(metric: String): String = metric.toLowerCase match {
    case "l2" | "euclidean"      => "l2"
    case "cosine"                => "cosine"
    case "dot" | "inner_product" => "dot"
    case other =>
      throw new IllegalArgumentException(
        s"unknown metric '$other'; expected one of ${All.mkString(", ")}")
  }

  def dist(u: Array[Double], v: Array[Double], metric: String): Double = {
    require(u.length == v.length, s"dim mismatch: ${u.length} vs ${v.length}")
    canonical(metric) match {
      case "l2" =>
        var acc = 0.0; var i = 0
        while (i < u.length) { val d = u(i) - v(i); acc += d * d; i += 1 }
        math.sqrt(acc)
      case "cosine" =>
        var dot = 0.0; var nu = 0.0; var nv = 0.0; var i = 0
        while (i < u.length) {
          dot += u(i) * v(i); nu += u(i) * u(i); nv += v(i) * v(i); i += 1
        }
        0.5 - 0.5 * (dot / math.sqrt(nu * nv))
      case "dot" =>
        var dot = 0.0; var i = 0
        while (i < u.length) { dot += u(i) * v(i); i += 1 }
        -dot
    }
  }

  def distF(u: Array[Float], v: Array[Float], metric: String): Double =
    dist(u.map(_.toDouble), v.map(_.toDouble), metric)

  /** L2-normalize in place-free fashion (used by cosine-metric training,
    * mirroring the reference's renormalization `coder.py:57-64`). */
  def normalize(u: Array[Double]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < u.length) { n += u(i) * u(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    u.map(_ * inv)
  }
}
