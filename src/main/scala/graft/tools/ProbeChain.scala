package graft.tools

import graft.SparkEntry


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: DedupCluster on a pure 200-deep chain — converges in
  * ~10 rounds iff the pointer jump actually computes label(label). */
object ProbeChain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 200
    val verts = (0L until n.toLong).toDF("doc_id")
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b")
    val t0 = System.nanoTime()
    try {
      val out = graft.operators.DedupCluster.clusters(verts, chain)
      val bad = out.filter(col("cluster_id") =!= 0L).count()
      println(f"[chain] ok in ${(System.nanoTime() - t0) / 1e9}%.1f s, " +
        s"wrong labels = $bad")
    } catch {
      case e: Throwable => println(s"[chain] FAILED: ${e.getMessage}")
    }

    // the sf0.1 ANN mutual graph with the FIXED jump, per-round sums
    val d = "/root/testdata/sf0.1"
    val g = SparkEntry.queries("q_knn_graph_ann")(spark, d)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .localCheckpoint(true)
    val p = graft.util.Fixpoint.materialize(g)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = graft.util.Fixpoint.materialize(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("cluster_id", col("doc_id")))
    def sumOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
    println(s"[ann] verts=${labels.count()} sum=${sumOf(labels)}")
    for (i <- 0 until 10) {
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val hop = graft.util.Fixpoint.materialize(
        labels.unionByName(prop)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id")))
      val next = if (i < 2) hop else {
        val pSide = hop.sparkSession.createDataFrame(hop.rdd, hop.schema)
          .select(col("doc_id").as("p_doc"),
                  col("cluster_id").as("p_cluster"))
        val jumped = graft.util.Fixpoint.materialize(
          hop.join(pSide, col("cluster_id") === col("p_doc"))
            .select(col("doc_id"), col("p_cluster").as("cluster_id")))
        jumped.sparkSession.createDataFrame(jumped.rdd, jumped.schema)
      }
      println(s"[ann] round $i: rows=${next.count()} sum=${sumOf(next)}")
      labels = next
    }
    spark.stop()
  }
}
