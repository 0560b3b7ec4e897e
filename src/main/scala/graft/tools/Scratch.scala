package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession
/** Ad-hoc harness: run named keys on SPARK_GRAFT_SCRATCH_SF (default the
  * smoke tier), print rows + min-of-SPARK_GRAFT_BENCH_RUNS timing each. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SCRATCH_SF", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "1").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      try {
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, d).count()
          (n, (System.nanoTime() - t0) / 1e9)
        }
        val best = times.map(_._2).min
        println(f"== $name rows=${times.head._1} best=$best%.3fs")
        if (runs == 1) SparkEntry.queries(name)(spark, d).show(5, false)
      } catch { case e: Throwable => println(s"== $name FAILED: ${e.getMessage.take(600)}") }
    }
    spark.stop()
  }
}
