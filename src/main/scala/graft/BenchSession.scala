package graft

import org.apache.spark.sql.SparkSession

/** THE bench session config, shared by [[Bench]], [[QueryBench]] and
  * [[PlanDump]] — the three mains whose numbers and plan artifacts must
  * be comparable. Previously each duplicated the config literals, and a
  * silent drift would have made QueryBench A/B numbers or PlanDump
  * artifacts incomparable with the driver's bench (the r20 ADVICE
  * item). One builder, one source of truth:
  *
  *  - `local[$SPARK_GRAFT_CPUS]` — the driver VARIES the core count to
  *    measure scaling, so the master is never hard-coded;
  *  - `spark.sql.shuffle.partitions = cpus` — scale-adaptive with the
  *    session size (AQE coalescing handles the rest), not a constant
  *    tuned for either local mode or a cluster;
  *  - everything else at Spark defaults (AQE on), so the bench measures
  *    the code, not a config tune. */
object BenchSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def create(): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
      .getOrCreate()
}
