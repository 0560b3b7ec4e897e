package graft.tools


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage wall decomposition of the stored-index
  * BM25 probe (q_text_index_query) against an EXISTING index root —
  * the tool that settles where the 100×-tier residual actually lives
  * (file listing? stats jobs? pruned scan? score pass?). Usage:
  *   runMain graft.ProbeTidx <indexRoot> [reps]
  */
object ProbeTidx {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.InvertedIndex
    val terms = Seq("spark", "window", "dup", "merge")

    def t[A](label: String)(body: => A): A = {
      val mins = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${mins.min}%.3f  all=${mins.map(x => f"$x%.3f").mkString(",")}")
      body
    }

    // full query, the reference number
    t("full query")(InvertedIndex.query(spark, root, terms, 20).count())
    t("dfs read+agg") {
      if (new java.io.File(s"$root/dfs").exists())
        spark.read.parquet(s"$root/dfs")
          .filter(col("term").isin(terms: _*))
          .groupBy("term").agg(sum("df")).collect()
    }
    // pieces
    t("exists+recover")(InvertedIndex.exists(spark, root))
    t("stats scan+agg") {
      spark.read.parquet(s"$root/stats").agg(sum("n_docs")).collect()
    }
    import spark.implicits._
    t("bucket job") {
      graft.util.Local.model(
        terms.toDF("term")
          .select(pmod(xxhash64(col("term")), lit(32L)).as("tb")))
        .collect()
    }
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(32L)).as("tb"))
      .collect().map(_.getLong(0)).distinct.toSeq
    t("pruned scan count") {
      spark.read.parquet(s"$root/postings")
        .filter(col("tb").isin(buckets: _*))
        .filter(col("term").isin(terms: _*)).count()
    }
    t("pruned scan NO term filter") {
      spark.read.parquet(s"$root/postings")
        .filter(col("tb").isin(buckets: _*)).count()
    }
    t("unpruned full scan") {
      spark.read.parquet(s"$root/postings").count()
    }
    println("pruned rows: " + spark.read.parquet(s"$root/postings")
      .filter(col("tb").isin(buckets: _*))
      .filter(col("term").isin(terms: _*)).count())
    spark.stop()
  }
}
