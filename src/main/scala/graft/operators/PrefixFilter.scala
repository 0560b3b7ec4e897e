package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix filtering for EXACT set-similarity joins (Chaudhuri et al.
  * SSJoin / Bayardo et al. All-Pairs): under any global total order on
  * shingles, two sets A, B with Jaccard(A,B) >= t MUST share a shingle
  * within the first |X| - ceil(t*|X|) + 1 shingles of each set.
  *
  * Proof: J >= t implies |A∩B| >= t*|A∪B| >= t*max(|A|,|B|), so with
  * alpha = ceil(t*max(|A|,|B|)) we have |A∩B| >= alpha. Let x be the
  * order-smallest element of A∩B; within A, x is followed by >= alpha-1
  * other intersection elements, so x sits at position <= |A| - alpha + 1
  * <= |A| - ceil(t*|A|) + 1 — inside A's prefix. Same for B. Hence the
  * self-join restricted to PREFIX rows loses no qualifying pair, and the
  * caller's exact verification step restores exact precision.
  *
  * The order used is ascending global document frequency (rarest shingle
  * first, shingle value as tie-break): prefixes then hold the rarest
  * shingles, so the candidate join's buckets are the SMALLEST buckets —
  * the frequent shingles whose buckets grow quadratically with corpus
  * size never reach the join. Everything is Catalyst-native: one
  * aggregate for df, one window rank per doc, one equi-join on the
  * prefix rows — every step partition-parallel at 100 TB.
  */
object PrefixFilter {

  /** Every (doc_id, shingle) row ranked under the global df-ascending
    * order (rarest first, shingle value tie-break), with the doc's total
    * size: (doc_id, shingle, prefix_pos, n_sh). One df aggregate + one
    * doc-keyed window shuffle; shared by the prefix side and (for the
    * positional filter) the full side of a candidate join — Catalyst
    * reuses the window exchange across the self-join. */
  def rankedRows(shingleRows: DataFrame): DataFrame = {
    val df = shingleRows.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id")
    val rankW = byDoc.orderBy(col("df").asc, col("shingle").asc)
    shingleRows.join(df, Seq("shingle"))
      .withColumn("prefix_pos", row_number().over(rankW))
      .withColumn("n_sh", count(lit(1)).over(byDoc))
  }

  /** Prefix rows of (doc_id, shingle) under the df-ascending order: each
    * doc keeps its first |s| - ceil(t*|s|) + 1 shingles. The 1e-9 slack
    * guards the fp product t*|s| from rounding UP past an integer (which
    * would shorten the prefix and silently lose pairs); it can only ever
    * lengthen a prefix by one row — sound, never lossy. */
  def prefixRows(shingleRows: DataFrame, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold $threshold")
    rankedRows(shingleRows)
      .filter(col("prefix_pos") <=
        col("n_sh") - ceil(lit(threshold) * col("n_sh") - lit(1e-9)) + 1)
      .select("doc_id", "shingle")
  }

  /** Distinct candidate pairs (doc_a < doc_b) sharing a PREFIX shingle —
    * a provable superset of all pairs with Jaccard >= threshold, via an
    * equi-join over prefix rows only (never the full shingle self-join). */
  def candidatePairs(shingleRows: DataFrame, threshold: Double): DataFrame = {
    val pre = prefixRows(shingleRows, threshold)
    pre.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(pre.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Candidate DIRECTED pairs for CONTAINMENT C(a→b) = |A∩B|/|A| >=
    * tauNum/tauDen (the sub-document duplication predicate: a is mostly
    * contained in b). Two sound filters compose:
    *
    * 1. PREFIX (contained side only): C(a→b) >= t implies
    *    |A∩B| >= ceil(t*|A|) =: alpha, so the order-smallest common
    *    shingle is followed within A by >= alpha-1 other common
    *    shingles — it sits inside A's first |A| - alpha + 1 shingles.
    *    No such bound exists on its position in B (|B| may dwarf
    *    alpha), so the b side joins ALL its shingles.
    *
    * 2. POSITIONAL (the PPJoin refinement, Xiao et al.), applied per
    *    matching row BEFORE the distinct: let the shared shingle sit at
    *    rank i of A and rank j of B under the global order. For the
    *    order-SMALLEST common shingle x of a qualifying pair, every
    *    element of A∩B ranks >= i in A and >= j in B, so
    *    |A∩B| <= min(|A|-i, |B|-j) + 1 — and |A∩B| >= alpha means the
    *    x-row always survives (n_a - i + 1)*den >= num*n_a AND
    *    (n_b - j + 1)*den >= num*n_a. Rows for LATER common shingles
    *    may be (correctly) dropped by the same test — the pair already
    *    survives through its x-row, so recall stays exactly 1. Pure
    *    int64 arithmetic; an integer LHS >= ceil(p/q) iff LHS*q >= p,
    *    so no float enters the predicate.
    *
    * With the df-ascending order A's prefix holds only the rarest
    * shingles, keeping the per-shingle join buckets small; the
    * positional test then discards the high-position matches those
    * buckets still produce — the candidate count stops tracking the
    * R² growth of the verified output's tail. */
  def containmentCandidates(shingleRows: DataFrame,
                            tauNum: Int, tauDen: Int): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum, s"bad tau $tauNum/$tauDen")
    val t = tauNum.toDouble / tauDen
    val ranked = rankedRows(shingleRows)
    val pre = ranked
      .filter(col("prefix_pos") <=
        col("n_sh") - ceil(lit(t) * col("n_sh") - lit(1e-9)) + 1)
    pre.select(col("doc_id").as("doc_a"), col("shingle"),
               col("prefix_pos").as("pos_a"), col("n_sh").as("n_a"))
      .join(ranked.select(col("doc_id").as("doc_b"), col("shingle"),
                          col("prefix_pos").as("pos_b"),
                          col("n_sh").as("n_b")),
            Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .filter((col("n_a") - col("pos_a") + 1) * tauDen >=
                col("n_a") * tauNum)
      .filter((col("n_b") - col("pos_b") + 1) * tauDen >=
                col("n_a") * tauNum)
      .select("doc_a", "doc_b").distinct()
  }
}
