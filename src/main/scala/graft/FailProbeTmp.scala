package graft

import org.apache.spark.sql.SparkSession

// temporary probe — not committed
object FailProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/tmp/graft_scale100_sf01"
    def heap(tag: String): Unit = {
      val rt = Runtime.getRuntime
      System.gc()
      println(f"HEAP $tag used=${(rt.totalMemory - rt.freeMemory)/1e9}%.2f GB total=${rt.totalMemory/1e9}%.2f GB")
    }
    for (k <- Seq("q_dedup_simhash")) {
      heap(s"before $k")
      try {
        val n = SparkEntry.queries(k)(spark, d).count()
        println(s"FAILPROBE $k rows=$n OK")
      } catch {
        case e: Throwable =>
          println(s"FAILPROBE $k FAILED: ${e.getClass.getName}: ${e.getMessage}")
          var c = e
          while (c.getCause != null && c.getCause != c) c = c.getCause
          println("ROOT: " + c.getClass.getName + ": " + c.getMessage)
          c.getStackTrace.take(18).foreach(s => println("  at " + s))
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      heap(s"after $k")
    }
    spark.stop()
  }
}
