package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Targeted 10x scale probe for the pair-generation queries: times each
  * named query at a base tier and at a key-offset 10x replica tier (built
  * by graft.ScaleUp), printing the time ratio. Sub-quadratic candidate
  * generation should keep the ratio far below the ~100x an all-pairs
  * O(N^2) plan exhibits.
  *
  * Usage: runMain graft.ScaleProbe <baseDir> <scaledDir> <query>...
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args(0); val scaled = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, d: String): Double = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    for (n <- names) {
      time(n, base) // warm-up
      val tB = time(n, base); val tS = time(n, scaled)
      println(f"[scaleprobe] $n%-20s base=$tB%.2fs 10x=$tS%.2fs ratio=${tS / tB}%.1fx")
    }
    spark.stop()
  }
}
