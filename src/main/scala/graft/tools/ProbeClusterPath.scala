package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Dev probe (r18): where do q_dedup_cluster's ~26 jobs / ~3.5 s go?
  * Replays dedupClusterFrame's phases with per-phase wall + job counts:
  * content-grain grouping, shingle/prefix/verify pair pipeline, the CC
  * fixpoint, and the member expansion.
  * Usage: runMain graft.tools.ProbeClusterPath <sfDir>
  */
object ProbeClusterPath {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[T](name: String)(f: => T): T = {
      Thread.sleep(100); jobs.set(0)
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"[phase] $name%-28s jobs=${jobs.get()}%-3d t=$secs%.2fs")
      r
    }
    // warm the JVM/codegen/footers once
    graft.SparkEntry.queries("q_dedup_cluster")(spark, d).count()

    val docs = graft.sources.Tables.documents(spark, d)
    val g = phase("group texts (checkpoint)") {
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep"),
             collect_list(col("doc_id")).as("members"))
        .localCheckpoint(true)
    }
    val sh = graft.queries.LlmOps.shingles(
      g.select(col("rep").as("doc_id"), col("text")))
    val cands = graft.operators.PrefixFilter.candidatePairs(sh, 0.8)
    val rp = phase("pair pipeline (checkpoint)") {
      graft.queries.DedupOps.jaccardPairs(sh, Some(cands))
        .filter(col("jaccard_raw") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
        .localCheckpoint(true)
    }
    val gf = phase("has_sh flag join (count)") {
      val x = g.join(
          sh.select(col("doc_id").as("rep")).distinct()
            .withColumn("has_sh", lit(true)),
          Seq("rep"), "left")
        .withColumn("has_sh", coalesce(col("has_sh"), lit(false)))
      x.count(); x
    }
    val repClusters = phase("CC fixpoint (to count)") {
      val x = graft.operators.DedupCluster.clusters(
        g.select(col("rep").as("doc_id")),
        rp.select("doc_a", "doc_b"))
      x.count(); x
    }
    phase("expansion + orderBy (count)") {
      val m = g.select(col("rep"), explode(col("members")).as("doc_id"))
      m.join(repClusters.withColumnRenamed("doc_id", "rep")
          .withColumnRenamed("cluster_id", "rep_cluster"), Seq("rep"))
        .join(gf.select("rep", "has_sh"), Seq("rep"))
        .withColumn("cluster_id",
          when(col("has_sh"), col("rep_cluster")).otherwise(col("doc_id")))
        .select("doc_id", "cluster_id").orderBy("doc_id").count()
    }
    spark.stop()
  }
}
