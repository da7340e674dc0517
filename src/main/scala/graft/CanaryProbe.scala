package graft

import org.apache.spark.sql.SparkSession

/** One-liner to (re)measure [[MachineCanary.ReferenceSec]] on a new
  * builder box: `sbt "runMain graft.CanaryProbe"`, run a few times,
  * record the midpoint. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"[canary] measured=${MachineCanary.measureSec(spark)}%.3f " +
      f"(reference=${MachineCanary.ReferenceSec}%.3f)")
    spark.stop()
  }
}
