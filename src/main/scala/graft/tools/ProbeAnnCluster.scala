package graft.tools

import graft.SparkEntry


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: reproduce the sf0.1-only q_knn_graph_cluster_ann
  * convergence failure and inspect the fixpoint's label sums. */
object ProbeAnnCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val g = SparkEntry.queries("q_knn_graph_ann")(spark, d).localCheckpoint(true)
    println(s"[probe] edges = ${g.count()}")
    // degenerate structures?
    println(s"[probe] self-loops = ${g.filter(col("vec_a") === col("vec_b")).count()}")
    println(s"[probe] dup edges = ${g.groupBy("vec_a", "vec_b").count().filter(col("count") > 1).count()}")
    val verts = graft.sources.Tables.embeddings(spark, d)
      .select(col("vec_id").as("doc_id"))
    println(s"[probe] verts = ${verts.count()}, distinct = ${verts.distinct().count()}")
    try {
      val t0 = System.nanoTime()
      val out = graft.operators.DedupCluster.clusters(verts,
        g.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      println(s"[probe] clusters ok, rows = ${out.count()} in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      // sanity: union-find ground truth driver-side
      val es = g.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val ids = verts.collect().map(_.getLong(0))
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = {
        var r = x; while (parent(r) != r) r = parent(r); r
      }
      for ((a, b) <- es) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ids.groupBy(find).toSeq.flatMap { case (_, ms) =>
        val l = ms.min; ms.toSeq.map(_ -> l)
      }.toMap
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val bad = expect.count { case (k, v) => got(k) != v }
      println(s"[probe] label mismatches vs union-find: $bad")
    } catch {
      case e: Throwable => println(s"[probe] FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
