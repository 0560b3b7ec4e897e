package graft.tools

import graft.SparkEntry


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: dump the sf0.1 ANN mutual edges for driver-side
  * simulation of the CC fixpoint. */
object ProbeDumpEdges {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("q_knn_graph_ann")(spark, "/root/testdata/sf0.1")
      .select("vec_a", "vec_b")
      .coalesce(1).write.mode("overwrite")
      .option("header", "false").csv("/tmp/ann_edges_sf01")
    spark.stop()
  }
}
