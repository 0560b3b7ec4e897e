package graft.tools

import graft.SparkEntry

object SmokeKey {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("smoke")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (k <- args) {
      val df = SparkEntry.queries(k)(spark, "/root/testdata/sf0.001")
      val rows = df.collect()
      println(s"KEY $k rows=${rows.length}")
      rows.take(5).foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
