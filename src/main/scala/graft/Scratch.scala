package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      try {
        val df = SparkEntry.queries(name)(spark, d)
        println(s"== $name rows=${df.count()}")
        df.show(5, false)
      } catch { case e: Throwable => println(s"== $name FAILED: ${e.getMessage.take(600)}") }
    }
    spark.stop()
  }
}
