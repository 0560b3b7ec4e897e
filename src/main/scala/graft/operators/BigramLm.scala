package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interpolated bigram language model AT REST — the stored-artifact twin
  * of q_select_perplexity_bigram's grid, applying the same "train once,
  * score forever" discipline the NB unigram model got (NbClassifier
  * store/storedGrid): the model GRID (one row per DISTINCT corpus
  * bigram, integer micro-nat log-likelihood) is written to parquet on
  * first use and every later scoring call reads the artifact instead of
  * re-deriving counts from the corpus.
  *
  * Model: p(w2|w1) = 0.7·n2/n1 + 0.3·(cnt(w2)+1)/(T+V) — MLE bigram
  * interpolated with the add-one-smoothed unigram, so unseen-context
  * mass never zeroes the log. Determinism discipline: ONE ln per
  * DISTINCT bigram rounded to integer micro-nats (both engines compute
  * the identical IEEE expression), exact INT64 from there on — the grid
  * survives a parquet round-trip bit-for-bit, so stored ≡ trained and a
  * full-recompute oracle still hash-matches.
  *
  * Scale shape: counts are map-side-combinable aggs; the grid is
  * distinct-bigram-sized and joins occurrences by (w1, w2) equi-join —
  * deliberately NEVER broadcast (vocabulary² can exceed memory; only
  * the 1-row stats frame broadcasts). Training makes ONE corpus bigram
  * explode (localCheckpointed — it feeds the bigram counts AND the
  * context counts; before this the explode re-derived ~3× per call,
  * the r14 verdict's item 3) plus one unigram pass; scoring re-derives
  * the explode exactly once per scored batch.
  */
object BigramLm {

  private def gridDir(root: String): String = s"$root/grid"

  def exists(s: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"${gridDir(root)}/_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The corpus bigram explode: (doc_id, w1, w2) — one row per adjacent
    * token pair on the whitespace tokenization. */
  def bigrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("l"))
      .filter(size(col("l")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(l) - 2)," +
          " i -> struct(l[i] AS w1, l[i + 1] AS w2))")).as("bg"))
      .select(col("doc_id"), col("bg.w1"), col("bg.w2"))

  /** Train the micro-nat grid (w1, w2, llk2) from `docs(doc_id, text)`.
    * One checkpointed bigram explode + one unigram pass. */
  def train(docs: DataFrame): DataFrame = {
    val bg = graft.util.Fixpoint.materialize(bigrams(docs))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("l"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    val uni = toks.select(explode(col("l")).as("w2"))
    val cnt = uni.groupBy("w2").agg(count(lit(1)).as("cnt"))
    val stats = uni.agg(count(lit(1)).as("t"),
      countDistinct(col("w2")).as("v"))
    val p = lit(0.7) * (col("n2").cast("double") / col("n1").cast("double")) +
      lit(0.3) * ((col("cnt") + lit(1)).cast("double") /
                  (col("t") + col("v")).cast("double"))
    c2.join(c1, Seq("w1")).join(cnt, Seq("w2"))
      .crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"),
        round(log(p) * lit(1000000.0)).cast("long").as("llk2"))
  }

  def store(docs: DataFrame, root: String): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    train(docs).write.mode("overwrite").parquet(gridDir(root))
  }

  def storedGrid(s: SparkSession, root: String): DataFrame = {
    require(exists(s, root), s"no bigram LM under $root")
    s.read.parquet(gridDir(root))
  }
}
