package graft
import org.apache.spark.sql.SparkSession
object QCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); q <- args) {
      println(s"=== $q @ $sf ===")
      SparkEntry.queries(q)(spark, s"/root/testdata/$sf").show(10, false)
    }
    spark.stop()
  }
}
