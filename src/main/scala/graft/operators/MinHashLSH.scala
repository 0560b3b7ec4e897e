package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + banded LSH over shingle sets — the 100-TB candidate generator
  * for near-duplicate detection: signature → bands → bucket equi-join, so
  * candidate pairs arrive via a Catalyst-native shuffle join on band keys
  * (never an all-pairs product). Seeds are literals (SURVEY §7.5 #6), so
  * every run — including the driver's — produces identical candidates.
  *
  * Recall math: P(candidate | Jaccard=J) = 1 − (1 − J^r)^b. With the
  * defaults b=8, r=2: J=0.8 → 0.9997, J≥0.9 → ~1. The caller re-verifies
  * candidates with EXACT Jaccard, so precision is always exact and the
  * only approximation is (vanishing) recall loss at the threshold.
  */
object MinHashLSH {

  /** k-permutation MinHash signature per doc from (doc_id, shingle:int64)
    * rows: sig_s = min over shingles of xxhash64(shingle, s). */
  def signatures(shingleRows: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(s =>
      min(xxhash64(col("shingle"), lit(s))).as(s"mh$s"))
    shingleRows.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band_idx, band_hash) — one row per band; band_hash folds the
    * band's r signature components plus the band index. */
  def bands(sig: DataFrame, b: Int, r: Int): DataFrame = {
    val bandCols = (0 until b).map { bi =>
      val parts = (0 until r).map(ri => col(s"mh${bi * r + ri}"))
      struct(lit(bi).as("band_idx"),
             xxhash64(parts :+ lit(bi): _*).as("band_hash")).as(s"b$bi")
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("band.band_idx").as("band_idx"),
              col("band.band_hash").as("band_hash"))
  }

  /** Asymmetric (cross-corpus) candidate pairs: every (doc_a ∈ A,
    * doc_b ∈ B) sharing at least one band bucket — the contamination /
    * screening shape, where A is a training corpus and B a bench suite.
    * No `doc_a < doc_b` filter (the sides are disjoint id sets and the
    * pair is DIRECTED corpus→bench); the bench side's band table is
    * suite-sized, so at 100 TB the equi-join broadcasts it and the
    * corpus is never shuffled. Same recall math as [[candidatePairs]].
    */
  def candidatePairsAcross(shA: DataFrame, shB: DataFrame, k: Int = 16,
                           b: Int = 8, r: Int = 2): DataFrame = {
    require(b * r <= k, s"bands($b)×rows($r) exceed signature length $k")
    val ba = bands(signatures(shA, k), b, r)
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
    val bb = bands(signatures(shB, k), b, r)
      .select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
    ba.join(bb, Seq("band_idx", "band_hash"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Distinct candidate pairs (doc_a < doc_b) sharing at least one band
    * bucket. The equi-join on (band_idx, band_hash) is the whole trick:
    * similarity search as a shuffle join. */
  def candidatePairs(shingleRows: DataFrame, k: Int = 16, b: Int = 8,
                     r: Int = 2): DataFrame = {
    require(b * r <= k, s"bands($b)×rows($r) exceed signature length $k")
    candidatePairsFromBands(bands(signatures(shingleRows, k), b, r))
  }

  /** [[candidatePairs]] from a PRECOMPUTED band table — for callers that
    * already hold (and typically checkpointed) the bands because several
    * consumers share them (the dedup-index ingest path computes bands
    * once per batch for within-batch pairing, the stored-index query,
    * AND the append — re-deriving signatures per consumer tripled the
    * most expensive stage of the batch). */
  def candidatePairsFromBands(bd: DataFrame): DataFrame = {
    val left = bd.select(col("doc_id").as("doc_a"), col("band_idx"),
                         col("band_hash"))
    val right = bd.select(col("doc_id").as("doc_b"), col("band_idx"),
                          col("band_hash"))
    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }
}
