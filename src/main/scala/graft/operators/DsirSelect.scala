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

  /** Per-doc bigram array in document order (whitespace tokens). */
  private def bigrams(text: Column): Column = {
    val toks = split(text, " ")
    zip_with(slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  private def bucket(g: Column, b: Int): Column =
    pmod(xxhash64(g), lit(b.toLong)).cast("int")

  /** (doc_id, lang, dsir_score, selected) for every document; target =
    * rows where `targetPred` holds (here: lang = 'en'). */
  def select(docs: DataFrame, targetPred: Column, b: Int = 4096): DataFrame = {
    val withGrams = docs.select(col("doc_id"), col("lang"),
      bigrams(col("text")).as("grams"))
    val occ = withGrams.select(col("lang"),
        explode(col("grams")).as("g"))
      .select(col("lang"), bucket(col("g"), b).as("bkt"))
    // two ≤ B-row count frames — the entire trained model
    def counts(df: DataFrame): Array[Long] = {
      val a = new Array[Long](b)
      Local.modelRows(df.groupBy("bkt").agg(count(lit(1)).as("n")))
        .foreach(r => a(r.getInt(0)) = r.getLong(1))
      a
    }
    val nT = counts(occ.filter(targetPred))
    val nR = counts(occ)
    val lut = logRatios(nT, nR, b)
    val lutLit = typedLit(lut.toSeq)
    val score = aggregate(col("grams"), lit(0.0d),
      (acc, g) => acc + element_at(lutLit, bucket(g, b) + 1))
    withGrams
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
