package graft.tools

import graft.SparkEntry

object PlanDump100 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/tmp/graft_scale100_sf01"
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, d)
      df.collect()
      println(s"########## $name")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan parquet") || l.contains("PartitionFilters") ||
          l.contains("PushedFilters")).take(20).mkString("\n"))
    }
    spark.stop()
  }
}
