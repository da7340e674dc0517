package graft
import org.apache.spark.sql.SparkSession
object MaxsimCurveRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_mscurve"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    val engine = new graft.api.Engine(spark, root)
    CurveBench.maxsimCurves(spark, engine).foreach { case (k, v) => println(f"$k = $v%.3f") }
    engine.remove()
    spark.stop()
  }
}
