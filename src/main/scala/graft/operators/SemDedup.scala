package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup made
  * tractable by CLUSTER-SCOPING the pair search — k-means cells first,
  * then pairwise cosine only WITHIN a cell, so pair work drops from
  * O(N²) to O(N²/k) by construction and each cell's block is an
  * independent task. The keep policy is the paper's: within a group of
  * τ-similar items, prefer the item FARTHEST from its cluster centroid
  * (low centroid-similarity examples are the informative ones; the ones
  * nearest the centroid are the redundant core).
  *
  * Deterministic decision rule (the greedy order the paper's
  * implementation induces, made engine-portable): process each cell in
  * keep-priority order — ascending centroid similarity, ties by
  * ascending id — and DROP v iff some τ-neighbor u precedes it
  * (u.cent_sim < v.cent_sim, ties by id). Chain-dropping is
  * intentional: a duplicate of a duplicate is still a duplicate.
  *
  * Scale shape: the assignment is a broadcast of the k-row centroid
  * model; the pair search is an EQUI-join on the cell id (shuffle
  * hash/SMJ — never a corpus nested loop); per-cell cost is bounded by
  * the cell size (pick k ~ √N as the corpus grows — the
  * VectorSimJoin.adaptiveCells guidance — and AQE's skew split handles
  * hot cells, proven in VectorSimJoinSpec). The `beaten` distinct is
  * bounded by the dropped count, not the pair count, after map-side
  * combine.
  */
object SemDedup {

  /** Per-vector dedup decisions over L2-NORMALIZED `emb(vec_id, v)`
    * against the `cents(cent_id, cv, cnrm)` model frame:
    * (vec_id, cell, cent_sim, is_dropped 0/1). */
  def decisions(emb: DataFrame, cents: DataFrame, tau: Double): DataFrame = {
    // pure-map assignment (functions.NearestCellScore). emb is already
    // L2-normalized, so the original sim was dot/cnrm — passing nrm = 1
    // yields dot/(1.0·cnrm), bit-identical in IEEE arithmetic.
    val rows = graft.util.Local
      .modelRows(cents.select("cent_id", "cv", "cnrm"))
    val nc = graft.functions.IvfProbe
      .nearestCell(col("v"), lit(1.0), rows, emitTheta = false)
    val assigned = emb.select(col("vec_id"), nc.as("nc"), col("v"))
      .select(col("vec_id"), col("nc.cell").cast("int").as("cell"),
        col("v"), col("nc.score").as("cent_sim"))
      .localCheckpoint(true) // two consumers: pair join sides + final join
    val u = assigned.select(col("cell"), col("vec_id").as("u_id"),
      col("v").as("u_v"), col("cent_sim").as("u_cs"))
    val v = assigned.select(col("cell"), col("vec_id").as("v_id"),
      col("v").as("v_v"), col("cent_sim").as("v_cs"))
    val beaten = u.join(v, Seq("cell"))
      .filter(col("u_id") =!= col("v_id"))
      .filter(VectorExprs.dot(col("u_v"), col("v_v")) >= tau)
      .filter(col("u_cs") < col("v_cs") ||
        (col("u_cs") === col("v_cs") && col("u_id") < col("v_id")))
      .select(col("v_id").as("vec_id")).distinct()
      .withColumn("is_dropped", lit(1L))
    assigned.select("vec_id", "cell", "cent_sim")
      .join(beaten, Seq("vec_id"), "left")
      .na.fill(0L, Seq("is_dropped"))
  }
}
