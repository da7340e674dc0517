package graft
import org.apache.spark.sql.SparkSession
object CurveRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    CurveBench.run(spark).foreach { case (k, v) => println(f"$k = $v%.3f") }
    spark.stop()
  }
}
