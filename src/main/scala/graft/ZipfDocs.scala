package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zipf-shaped documents fixture generator (verdict r17 #1): the driver
  * fixture's ~60-token vocabulary makes every postings bucket dense and
  * every text key measure an adversarial density no real corpus has —
  * ProbeZipf quantified the probe-side curve; this writes a WHOLE
  * documents.parquet tier with a Zipf(s≈1) vocabulary so the full text
  * family (tfidf/bm25/collocations/ngram-lm/perplexity + the stored
  * text index) re-measures under realistic head-term skew at
  * sf0.1-shape/10×/100× doc counts.
  *
  * rank = ceil(V^u) with u uniform — the exact inverse CDF of
  * p(r) ∝ 1/r on [1, V]. All column expressions (xxhash64-seeded), the
  * corpus generates distributed: no driver loop, no Random, fully
  * deterministic per (doc_id, position). Schema mirrors the driver
  * fixture: (doc_id, text, lang, source, n_chars); ~50 tokens/doc like
  * the fixture's ~300 chars.
  *
  * Usage: runMain graft.ZipfDocs <dstDir> <nDocs> [vocab]
  */
object ZipfDocs {
  def main(args: Array[String]): Unit = {
    val dst = args(0)
    val nDocs = args(1).toLong
    val vocab = if (args.length > 2) args(2).toInt else 60000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lnV = math.log(vocab.toDouble)
    val langs = array(lit("en"), lit("en"), lit("en"), lit("de"),
      lit("fr"), lit("es"), lit("it"))
    val docs = spark.range(0, nDocs)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), lit(40) + pmod(col("id"), lit(20)).cast("int")),
          i => {
            val h = xxhash64(col("id"), i)
            val u = pmod(h, lit(1000003L)).cast("double") / 1000003.0
            concat(lit("t"), ceil(exp(u * lnV)).cast("long").cast("string"))
          })).as("text"),
        element_at(langs,
          pmod(xxhash64(col("id"), lit(-1)), lit(7)).cast("int") + 1)
          .as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.repartition(cpus.toInt).write.mode("overwrite")
      .parquet(s"$dst/documents.parquet")
    println(s"[zipfdocs] wrote $nDocs docs (vocab $vocab) to $dst")
    spark.stop()
  }
}
