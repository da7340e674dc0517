package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-speed probe for the SOAK artifacts — the bench's
  * [[RegressionGate]] canary derives machine speed from the suite's own
  * baseline medians, but a standalone soak has no baseline map to
  * median over, and its numbers drifted 10-40% across rounds purely
  * with machine state. This probe runs a FIXED synthetic workload
  * (4.3G `xxhash64` + map-side partial sum over exactly 32 input
  * partitions — CPU/memory-bandwidth bound, no shuffle, so the number
  * does not depend on the session's shuffle-partition setting) and
  * reports both the raw seconds and the factor vs [[ReferenceSec]],
  * the builder box that recorded the current soak baselines. A
  * cross-round soak comparison divides the wall times by the factor
  * the same way the bench gate normalizes by its canary. */
object MachineCanary {

  /** [[measureSec]] on the round-19 builder box (best-of-3 observed
    * 0.75-0.90 across repeated JVMs; midpoint recorded). */
  val ReferenceSec: Double = 0.82

  def measureSec(spark: SparkSession): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      // fixed 32 input partitions: comparable numbers from any soak's
      // session config (local[32] everywhere, but shuffle partitions
      // and default parallelism vary)
      // double sum: a long sum of the hashes overflows under ANSI mode
      spark.range(0L, 1L << 32, 1L, 32)
        .select(sum(xxhash64(col("id")).cast("double"))).head()
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).map(_ => once()).min
  }

  /** `"canary_sec":…,"canary_factor":…` — splice into a soak's one-line
    * JSON artifact (leading comma NOT included). */
  def jsonFragment(spark: SparkSession): String = {
    val sec = measureSec(spark)
    f""""canary_sec":$sec%.3f,"canary_factor":${sec / ReferenceSec}%.3f"""
  }

  /** A soak's one-line `{…}` JSON with the canary fields spliced in —
    * every soak artifact records the machine it ran on. */
  def withCanary(spark: SparkSession, json: String): String = {
    require(json.endsWith("}"), s"not a one-line JSON object: $json")
    json.stripSuffix("}") + "," + jsonFragment(spark) + "}"
  }
}
