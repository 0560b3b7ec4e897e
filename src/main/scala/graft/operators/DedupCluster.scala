package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns PAIRS into a dedup DECISION: every document gets a cluster_id
  * (the smallest doc_id reachable through pairs), the cluster_id member
  * is the canonical keeper, everything else in the cluster is a drop.
  *
  * Algorithm: iterative min-label propagation to a fixpoint — the
  * standard distributed connected-components (GraphX/Pregel shape) in
  * plain DataFrame ops. The loop is a DRIVER-SIDE fixpoint control with
  * per-iteration convergence checks, which is the one legitimate use of
  * a driver loop: iteration count is O(component diameter), a property
  * of the DATA (near-dup clusters are near-cliques — diameter 1-3), not
  * of corpus size. All per-iteration work is shuffle-partitioned joins
  * and aggregates over the PAIR-GRAPH vertices only (documents touched
  * by at least one pair — vastly smaller than the corpus); the untouched
  * corpus joins back in once, at the end, as singleton clusters via a
  * single anti-join. localCheckpoint truncates the growing lineage so
  * plan size stays constant per iteration.
  *
  * Determinism: min-label fixpoints are confluent — the final labels are
  * independent of propagation order, so output is stable run-to-run.
  */
object DedupCluster {

  /** (doc_id, cluster_id) for every id in `allIds`, where cluster_id is
    * the min doc_id of the id's connected component in `pairs`
    * ((doc_a, doc_b) rows; ids absent from pairs become singletons). */
  def clusters(allIds: DataFrame, pairs: DataFrame,
               maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    val verts = edges.select(col("src").as("doc_id")).distinct()
    var labels = verts.withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // labels flowing one hop along edges, folded with the current label
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = labels.unionByName(prop)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("o"), Seq("doc_id"))
        .filter(col("n.cluster_id") =!= col("o.cluster_id"))
        .count()
      labels = next
      converged = changed == 0L
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIters iters")
    val singletons = allIds.select("doc_id")
      .join(verts, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    labels.unionByName(singletons)
  }
}
