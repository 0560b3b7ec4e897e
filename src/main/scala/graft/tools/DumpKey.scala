package graft.tools

import graft.SparkEntry

object DumpKey {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("dump")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val Array(key, sfDir, out) = args
    SparkEntry.queries(key)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    val sqlOut = new java.io.PrintWriter(s"$out/oracle.sql")
    sqlOut.write(SparkEntry.oracleSql(key)); sqlOut.close()
    spark.stop()
  }
}
