package graft.tools

import graft.SparkEntry


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing of q_select_perplexity_bigram / q_text_ngram_lm
  * scoring on the Zipf tier — which shuffle eats the 100-s wall under a
  * realistic vocabulary? Usage: runMain graft.ProbeBigram <zipfDir> */
object ProbeBigram {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.BigramLm
    import graft.sources.Tables

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = Tables.documents(spark, d)
    val root = graft.queries.Scans.scratch("bigramlm", spark, d)
    if (!BigramLm.exists(spark, root))
      t("train+store")(BigramLm.store(docs, root))
    val grid = BigramLm.storedGrid(spark, root)
    t("grid count")(println("  grid rows: " + grid.count()))
    t("occ explode count")(
      println("  occ rows: " + BigramLm.bigrams(docs).count()))
    for (r <- 1 to 2) {
      t(s"occ join grid (run $r)")(
        println("  joined: " + BigramLm.bigrams(docs)
          .join(grid, Seq("w1", "w2")).count()))
      t(s"score agg (run $r)") {
        val scored = BigramLm.bigrams(docs).join(grid, Seq("w1", "w2"))
          .select(col("doc_id"), col("llk2").as("llk"),
            lit(null).cast("long").as("n_tok"))
        val anchors = docs.select(col("doc_id"),
          lit(null).cast("long").as("llk"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        println("  agg: " + scored.unionByName(anchors)
          .groupBy("doc_id")
          .agg(sum("llk").as("ssum"), max("n_tok").as("n_tok")).count())
      }
      t(s"full key (run $r)")(
        println("  out: " + SparkEntry
          .queries("q_select_perplexity_bigram")(spark, d).count()))
    }
    spark.stop()
  }
}
