package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorExprs

/** Deterministic spherical k-means for IVF coarse quantization — REAL
  * centroid training (vs the round-3 stub that reused fixed vec_ids),
  * entirely in Catalyst ops so the same code path trains on a 1000-
  * executor cluster:
  *
  *  - seeding: the k vectors with the smallest xxhash64(vec_id, seed) —
  *    a deterministic uniform sample, no RNG object, identical on every
  *    run and every JVM;
  *  - Lloyd rounds: assign every vector to its max-cosine centroid
  *    (a pure-map expression scan — centroids are tiny and bake in as
  *    a literal, functions.NearestCellScore), then
  *    recompute each centroid as the component-wise MEAN of its members.
  *    Sums go through DECIMAL(30,12) so they are exact and partition-
  *    order-independent (graft.util.Det rationale): bit-identical
  *    centroids run-to-run, which the determinism lint requires;
  *  - a cell that loses all members simply drops out (k shrinks) — the
  *    assignment window tie-breaks on cent_id so membership is total.
  *
  * At 100 TB: train on a hash-sample (the seeding predicate IS a sample
  * filter), broadcast the k×dim centroid table, and assignment stays an
  * embarrassingly parallel map — the IVF cell id then partitions the
  * corpus for probe-time pruning.
  */
object IvfKMeans {

  /** (cent_id, cv: array<double>, cnrm) — `iters` Lloyd rounds from
    * hash-sampled seeds over `emb` = (vec_id, v: array<double>, nrm). */
  def centroids(emb: DataFrame, k: Int, iters: Int, seed: Int = 42): DataFrame = {
    val h = xxhash64(col("vec_id"), lit(seed))
    var cents = emb.withColumn("h", h).orderBy("h").limit(k)
      .withColumn("cent_id", row_number().over(Window.orderBy("h")))
      .select(col("cent_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    for (_ <- 1 to iters) {
      // assignment as a PURE MAP (functions.NearestCellScore): the
      // in-training centroid frame is k rows — pulled to the driver per
      // round (which also materializes the round incrementally instead
      // of replaying the whole Lloyd lineage at the end) and scanned in
      // a primitive loop per vector, (sim desc, cent_id asc) tie order
      // preserved bit-for-bit. The crossJoin + row_number form pushed
      // N·k rows through a per-vector window SORT every round.
      val rows = graft.util.Local
        .modelRows(cents.select("cent_id", "cv", "cnrm"))
      val nc = graft.functions.IvfProbe
        .nearestCell(col("v"), col("nrm"), rows, emitTheta = false)
      val assigned = emb.select(nc.as("nc"), col("v"))
        .select(col("nc.cell").cast("int").as("cent_id"), col("v"))
      // centroid update as ONE decimal-exact vector-mean aggregate
      // (functions.DecimalVecMean): the posexplode → groupBy(cent_id,
      // pos) → groupBy(cent_id) form materialized d rows per vector and
      // paid TWO exchanges per Lloyd round; this streams the vectors
      // through a flat per-cell buffer and pays ONE k-row exchange —
      // component values bit-identical (sum(cast(x as decimal(30,12)))
      // cast double / count, replicated inside the aggregate; pinned in
      // DecimalVecMeanSpec + ClusterSpec)
      cents = assigned.groupBy("cent_id")
        .agg(graft.functions.DecimalVecMean.mean(col("v")).as("cv"))
        .withColumn("cnrm", VectorExprs.norm(col("cv")))
        .select("cent_id", "cv", "cnrm")
    }
    // publish the trained model as a LocalRelation (k rows): every later
    // broadcast (corpus assignment, query probe) is then a driver-side
    // copy instead of a replay of the whole Lloyd lineage — measured
    // 0.6 s off q_knn_ivfpq at sf0.1, and the train-once/publish shape
    // is what a real deployment does with an index artifact anyway
    graft.util.Local.model(cents)
  }

  /** Final cluster assignment: every `emb` row (vec_id, v, nrm) to its
    * max-cosine centroid from `cents` (cent_id, cv, cnrm) →
    * (vec_id, cluster: long, cohesion: 6-dp cosine). The ONE definition
    * behind q_cluster_kmeans, q_cluster_assign, and s_cluster_assign —
    * their spec-pinned equivalences (batch ≡ at-rest ≡ streamed union)
    * hold because all three share this code path, so a tie-break or
    * rounding change cannot drift one surface away from the others. */
  def assignClusters(emb: DataFrame, cents: DataFrame): DataFrame = {
    // same pure-map assignment as the Lloyd rounds (cohesion keeps the
    // Catalyst 6-dp HALF_UP round on the emitted sim — N rows now, so
    // the per-row BigDecimal is noise)
    val rows = graft.util.Local
      .modelRows(cents.select("cent_id", "cv", "cnrm"))
    val nc = graft.functions.IvfProbe
      .nearestCell(col("v"), col("nrm"), rows, emitTheta = false)
    emb.select(col("vec_id"), nc.as("nc"))
      .select(col("vec_id"), col("nc.cell").as("cluster"),
        round(col("nc.score"), 6).as("cohesion"))
  }
}
