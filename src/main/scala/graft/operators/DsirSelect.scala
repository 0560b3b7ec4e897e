package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.util.Local

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose hashed-n-gram distribution resembles
  * a TARGET domain. The published estimator fits bag-of-hashed-bigrams
  * unigram models p (target) and q (raw) over B buckets and scores a
  * document by log w = Σ_j [log p − log q](bucket(gram_j)) — summing the
  * per-bucket log-ratio over the document's bigram OCCURRENCES.
  *
  * 100-TB shape: the MODEL is two map-side-combinable counts capped at B
  * rows each (never the corpus), folded on the driver into a B-double
  * log-ratio table published as an expression LITERAL (the SdcKnnJoin
  * lookup-table discipline — model-sized, ships with the plan). Scoring
  * is then MAP-ONLY: one HOF aggregate per document over its own bigram
  * sequence, left-to-right — no shuffle, no join, no UDF, and the
  * summation order is the document's own token order, so the score is
  * bit-deterministic under any partitioning (the float-sum
  * nondeterminism a groupBy-sum over exploded grams would have).
  *
  * Smoothing is add-one over (count + 1)/(total + B); the keep rule
  * score > 0 selects documents more target-like than raw-average —
  * threshold-free, so selection needs no global sort (the top-k variant
  * of the paper is one TopKByScore away if a budget is fixed).
  */
object DsirSelect {

  /** ENGINE-PORTABLE token hash: left-to-right char fold
    * (acc·31 + codepoint) mod 1e9+7 — exact int64 arithmetic both
    * engines compute identically (the q_text_fingerprint discipline),
    * unlike xxhash64 (not reproducible in DuckDB), which is what makes
    * this key SQL-oracle-able. The fixture vocabulary maps injectively
    * under it (31/31 distinct codes), so bucket discrimination matches
    * a cryptographic hash here.
    *
    * The fold + bigram-bucket chain is computed by the fused codegen
    * expression `DsirBucketCodes` (functions/DsirExprs.scala) — the
    * interpreted HOF form it replaces (`transform(split)`+`aggregate`+
    * `zip_with(slice,slice)`) was measured at 6× the family median
    * (round-9 verdict). Identical semantics, pinned in DsirSpec. */
  private def buckets(text: Column, b: Int): Column =
    graft.functions.DsirExprs.buckets(text, b)

  /** (doc_id, lang, dsir_score, selected) for every document; target =
    * rows where `targetPred` holds (here: lang = 'en'). */
  def select(docs: DataFrame, targetPred: Column, b: Int = 4096): DataFrame = {
    val withBkts = docs.select(col("doc_id"), col("lang"),
      buckets(col("text"), b).as("bkts"))
    // ONE ≤ B-row count frame carrying both marginals — the entire
    // trained model in a single explode+groupBy job (was two jobs, each
    // re-running the bucketizer over the corpus)
    val occ = withBkts.select(col("lang"), explode(col("bkts")).as("bkt"))
    val nT = new Array[Long](b)
    val nR = new Array[Long](b)
    Local.modelRows(
      occ.groupBy("bkt").agg(
        count(lit(1)).as("n_all"),
        sum(when(targetPred, 1L).otherwise(0L)).as("n_tgt")))
      .foreach { r =>
        nR(r.getInt(0)) = r.getLong(1)
        nT(r.getInt(0)) = r.getLong(2)
      }
    val lut = logRatios(nT, nR, b)
    // scoring is the fused left-to-right lookup sum — one primitive
    // double[] shipped once via the codegen reference array, not a boxed
    // 4096-double typedLit per occurrence (the SdcLookupSum discipline)
    val score = graft.functions.DsirExprs.lookupSum(col("bkts"), lut)
    withBkts
      .select(col("doc_id"), col("lang"), round(score, 6).as("dsir_score"))
      .withColumn("selected", (col("dsir_score") > 0.0d).cast("long"))
      .orderBy("doc_id")
  }

  /** Add-one-smoothed log p − log q per bucket — driver-side fold of the
    * two count artifacts (deterministic: integer counts + Math.log). */
  def logRatios(nT: Array[Long], nR: Array[Long], b: Int): Array[Double] = {
    val tTot = nT.sum.toDouble + b
    val rTot = nR.sum.toDouble + b
    Array.tabulate(b) { i =>
      math.log((nT(i) + 1).toDouble / tTot) -
        math.log((nR(i) + 1).toDouble / rTot)
    }
  }
}
