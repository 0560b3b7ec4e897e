package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns PAIRS into a dedup DECISION: every document gets a cluster_id
  * (the smallest doc_id reachable through pairs), the cluster_id member
  * is the canonical keeper, everything else in the cluster is a drop.
  *
  * Algorithm: min-label propagation WITH POINTER JUMPING to a fixpoint.
  * Each round does (a) one hop of label flow along edges, then (b) a
  * pointer jump — label := label(label) — which halves the residual
  * label-chain depth. Propagation alone needs O(component diameter)
  * rounds, which a chain-shaped component (transitive drift chains do
  * occur at corpus scale) can push past any fixed budget; the jump step
  * brings convergence to O(log diameter), so the default maxIters = 25
  * covers diameters beyond 2^25 — no realistic corpus can exhaust it.
  *
  * The loop is a DRIVER-SIDE fixpoint control with per-iteration
  * convergence checks — the one legitimate use of a driver loop. All
  * per-iteration work is shuffle-partitioned joins and aggregates over
  * the PAIR-GRAPH vertices only (documents touched by at least one
  * pair — vastly smaller than the corpus); the untouched corpus joins
  * back in once, at the end, as singleton clusters via a single
  * anti-join.
  *
  * Fault-tolerance trade-off: by default each round truncates its
  * lineage with localCheckpoint(eager = true) — plan size stays
  * constant per iteration, but the checkpointed blocks live on
  * executors, so an executor loss mid-fixpoint fails the job (Spark
  * cannot recompute a truncated lineage). Right for this engine's
  * single-JVM harness and short fixpoints (O(log d) rounds of seconds
  * each). A long-running 1000-executor deployment flips the dial by
  * setting `spark.graft.checkpointDir` (util.Fixpoint): the SAME call
  * sites then use reliable `checkpoint()` against that directory,
  * swapping re-execution risk for one HDFS round-trip per iteration.
  * The fixpoint itself is restart-idempotent either way — labels are a
  * pure function of the pair graph.
  *
  * Determinism: min-label fixpoints are confluent — the final labels are
  * independent of propagation order (and of whether a jump step fired),
  * so output is stable run-to-run.
  */
object DedupCluster {

  /** (doc_id, cluster_id) for every id in `allIds`, where cluster_id is
    * the min doc_id of the id's connected component in `pairs`
    * ((doc_a, doc_b) rows; ids absent from pairs become singletons).
    * `maxIters` bounds fixpoint rounds; with pointer jumping the rounds
    * needed are ~log2(max component diameter), so the default is a
    * safety net, not a tuning knob — callers with pathological graphs
    * can raise it. */
  def clusters(allIds: DataFrame, pairs: DataFrame,
               maxIters: Int = 25): DataFrame = {
    // materialize the PAIR PIPELINE once, before the symmetrization
    // union — both union children would otherwise carry the caller's
    // (potentially expensive: prefix filter + exact Jaccard) pair plan
    // and compute it twice in one job (measured 2× the whole pair cost
    // at the replica stress tier). The union itself is then two narrow
    // projections over the materialized rows — no second checkpoint
    // needed.
    val p = graft.util.Fixpoint.materialize(
      pairs.select("doc_a", "doc_b"))
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(
        p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val verts = edges.select(col("src").as("doc_id")).distinct()
    var labels = graft.util.Fixpoint.materialize(
      verts.withColumn("cluster_id", col("doc_id")))
    // convergence check: labels only ever DECREASE, so the label sum
    // strictly decreases until the fixpoint — comparing exact decimal
    // sums (no int64 overflow at any corpus scale) detects convergence
    // with one aggregate over the materialized labels instead of a
    // labels⋈next join per round
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    // an EMPTY pair graph (no near-dups at all — small corpora, strict
    // thresholds) has no vertices to propagate over: sum() is NULL and
    // the fixpoint is trivially converged at "everything a singleton"
    var converged = prevSum == null
    var i = 0
    while (!converged && i < maxIters) {
      // (a) labels flowing one hop along edges, folded with current labels
      val prop = edges
        .join(labels.withColumnRenamed("doc_id", "src"), Seq("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      // checkpointed so the self-join below sees a flat scan, not a
      // Union subtree (Catalyst's union constraint rewrite cannot handle
      // the deduplicated self-join attributes), and so per-round plan
      // size stays constant
      val hop = graft.util.Fixpoint.materialize(
        labels.unionByName(prop)
          .groupBy("doc_id").agg(min("cluster_id").as("cluster_id")))
      // (b) pointer jump: label := label(label). Every label is a vertex
      // id in the same component (it arrived there along edges), so the
      // inner self-join keeps every row; labels only decrease, so the
      // jump is sound and halves residual chain depth each round.
      // ADAPTIVE: the jump is skipped for the first two rounds — near-dup
      // components are near-cliques that converge by then, and the jump's
      // extra join + materialization costs ~50% per round (measured at
      // sf0.1); a deep chain survives past round 2 and from there halves
      // each round, preserving the O(log diameter) bound.
      val next = if (i < 2) hop else {
        val jumped = graft.util.Fixpoint.materialize(hop.as("h")
          .join(hop.as("p"), col("h.cluster_id") === col("p.doc_id"))
          .select(col("h.doc_id").as("doc_id"),
                  col("p.cluster_id").as("cluster_id")))
        // rebuild from the checkpointed RDD: localCheckpoint preserves
        // the origin plan's constraints, and the self-join's equality
        // constraint references the pruned p-side attribute — the next
        // round's Union constraint rewrite would throw on it (key not
        // found). A fresh LogicalRDD starts constraint-free.
        jumped.sparkSession.createDataFrame(jumped.rdd, jumped.schema)
      }
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIters iters")
    val singletons = allIds.select("doc_id")
      .join(verts, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    labels.unionByName(singletons)
  }
}
