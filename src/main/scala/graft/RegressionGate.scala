package graft

/** Machine-speed-normalized per-query regression gate.
  *
  * Two rounds in a row the absolute gate (cur > 2× baseline seconds)
  * converted ENVIRONMENT into "confirmed regressions": the driver
  * machine ran the whole suite uniformly ~1.25-1.41× slower than the
  * builder box that recorded `tools/bench_baseline.json`, so untouched
  * sub-second queries grazed the 2× line, reproduced on the
  * confirmation re-run (the machine is consistently slow, not
  * transiently), and landed as regressions (r16 `graph_triangles`
  * 1.94×; r17 four entries, three of them sub-second and untouched).
  *
  * The fix: estimate the run's machine-speed ratio as the MEDIAN of
  * current/baseline over all entries with a ≥0.25s baseline (the
  * majority of queries are untouched in any round, so the median
  * tracks the machine, not the edits; sub-quarter-second entries
  * jitter well past 2× on a shared box and are excluded), then flag
  * only queries whose ratio exceeds 2× RELATIVE to that canary. The
  * absolute 2× check is kept as a secondary loud WARNING so a
  * uniformly slow run is still visible in the artifact — it just no
  * longer fails untouched queries.
  *
  * Pure functions over (current, baseline) maps — spec'd with
  * synthetic uniformly-slowed and genuinely-regressed runs
  * (RegressionGateSpec) without running a bench. */
object RegressionGate {

  /** Baseline entries below this many seconds are too jittery to
    * estimate machine speed from (and too jittery to gate absolutely —
    * the 0.25s floor predates the canary). */
  val MinSec = 0.25

  /** Fewer qualifying entries than this and the median is not a
    * machine-speed estimate — fall back to canary 1.0 (the absolute
    * gate). */
  val MinEntries = 8

  /** Sanity clamp: a "machine" more than 3× slower or 2× faster than
    * the baseline box is not believable as pure environment — beyond
    * it, trust the absolute numbers rather than normalize a
    * systemically broken run into silence. */
  val CanaryLo = 0.5
  val CanaryHi = 3.0

  /** First-class alert line: median normalization makes a UNIFORM code
    * regression (a common-path change slowing every query) invisible to
    * the per-query gate up to the [[CanaryHi]] clamp — the canary itself
    * is the only witness. Past this value the bench surfaces
    * `canary_alert` in its JSON and stderr: either the box really is
    * that slow (verify against `tools/canary_history.jsonl`, which the
    * bench appends every run) or every query got slower at once, which
    * no per-query ratio will ever flag. Observed clean-environment
    * canaries to date: 1.0-1.41. */
  val CanaryAlertHi = 1.5

  /** Median of current/baseline over entries whose baseline is ≥
    * [[MinSec]], clamped to [[CanaryLo]]..[[CanaryHi]]; 1.0 when fewer
    * than [[MinEntries]] entries qualify. */
  def canary(current: Map[String, Double],
      baseline: Map[String, Double]): Double = {
    val ratios = baseline.toSeq.collect {
      case (k, b) if b >= MinSec && b > 0.0 && current.contains(k) =>
        current(k) / b
    }.sorted
    val n = ratios.size
    if (n < MinEntries) 1.0
    else {
      val med =
        if (n % 2 == 1) ratios(n / 2)
        else (ratios(n / 2 - 1) + ratios(n / 2)) / 2.0
      math.max(CanaryLo, math.min(CanaryHi, med))
    }
  }

  /** Code-caused regression: >2× the machine-normalized baseline AND
    * >0.25s absolute over it (sub-100ms entries jitter well past 2×).
    * A zero/absent baseline gates nothing: a sub-millisecond query
    * rounded to 0.000 by the baseline writer would otherwise flag any
    * cur > MinSec and put factor = ∞ (invalid JSON) in the report. */
  def isRegression(cur: Double, base: Double, canary: Double): Boolean =
    base > 0.0 && cur > 2.0 * canary * base && cur - canary * base > MinSec

  /** The pre-canary absolute gate, kept as a loud warning. */
  def isAbsoluteOver(cur: Double, base: Double): Boolean =
    base > 0.0 && cur > 2.0 * base && cur - base > MinSec
}
