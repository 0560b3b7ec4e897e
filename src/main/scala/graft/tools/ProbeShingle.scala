package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: where do the shingle-family keys' seconds go at the
  * replica tier — the shingle explode + string build, the k×xxhash64
  * min-aggregation, or the profile (sorted distinct array) pass?
  * Decides whether a one-pass shingle/minhash kernel (the PHashKernel
  * treatment) is worth building. Not part of the declared surface. */
object ProbeShingle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/tier100x")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "text")
    t("docs count (scan)") { docs.count() }
    val sh = graft.Graft.shingleRows(docs, "doc_id", "text")
    for (_ <- 1 to 2) {
      t("shingleRows count") { sh.count() }
      t("shingle agg (count distinct doc)") {
        sh.groupBy("doc_id").agg(count(lit(1))).count()
      }
      t("minhash signatures") {
        graft.operators.MinHashLSH.signatures(sh, 16).count()
      }
      t("bands") {
        graft.operators.MinHashLSH.bands(
          graft.operators.MinHashLSH.signatures(sh, 16), 8, 2).count()
      }
      t("profiles (sorted shingle sets)") {
        sh.groupBy("doc_id")
          .agg(sort_array(collect_list(col("shingle"))).as("ss"),
               count(lit(1)).as("n_sh")).count()
      }
    }
    spark.stop()
  }
}
