package graft.tools


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of q_dedup_simhash at a given tier —
  * signature pass vs banded sig-pairs vs the two expansion legs.
  * Usage: runMain graft.ProbeSim <sfDir> [reps]
  */
object ProbeSim {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, d)

    def t(label: String)(body: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-24s min=${xs.map(_._1).min}%.2f rows=${xs.head._2} " +
        s"all=${xs.map(x => f"${x._1}%.2f").mkString(",")}")
    }

    t("full pairs")(graft.operators.SimHash.pairs(docs).count())
    // content-grain signature frame (the pairs() input)
    val g = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("members"))
    t("group frame")(g.count())
    def sigG(): DataFrame = {
      val gc = g.localCheckpoint(true)
      val repSig = graft.operators.SimHash.signatures(
        gc.select(col("rep").as("doc_id"), col("text")))
      gc.select(col("rep"), explode(col("members")).as("did"))
        .join(repSig.select(col("doc_id").as("rep"), col("simhash")), Seq("rep"))
        .select(col("did").as("doc_id"), col("simhash"))
    }
    t("grained sig")(sigG().count())
    val sig = sigG().localCheckpoint(true)
    t("sigPairs (rep grain)")(
      graft.operators.SimHash.signaturePairs(sig, 4, 3).count())
    val sp = graft.operators.SimHash.signaturePairs(sig, 4, 3)
      .repartition(32)
      .localCheckpoint(true)
    println("sp partitions: " + sp.rdd.getNumPartitions +
      ", sig partitions: " + sig.rdd.getNumPartitions)
    t("intra expansion") {
      sig.select(col("simhash"), col("doc_id").as("doc_a"))
        .join(broadcast(sig.select(col("simhash"), col("doc_id").as("doc_b"))),
              Seq("simhash"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    t("inter expansion bcast") {
      sp.join(broadcast(sig.select(col("simhash").as("sig_a"),
                col("doc_id").as("da"))), Seq("sig_a"))
        .join(broadcast(sig.select(col("simhash").as("sig_b"),
                col("doc_id").as("db"))), Seq("sig_b"))
        .count()
    }
    t("inter expansion shuffle") {
      sp.join(sig.select(col("simhash").as("sig_a"), col("doc_id").as("da")),
              Seq("sig_a"))
        .join(sig.select(col("simhash").as("sig_b"), col("doc_id").as("db")),
              Seq("sig_b"))
        .count()
    }
    // the exact pairs() dataflow, built from the checkpointed inputs
    val intraFull = sig.select(col("simhash"), col("doc_id").as("doc_a"))
      .join(broadcast(sig.select(col("simhash"), col("doc_id").as("doc_b"))),
            Seq("simhash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), lit(0L).as("hamming"))
    val interFull = sp
      .join(broadcast(sig.select(col("simhash").as("sig_a"),
            col("doc_id").as("da"))), Seq("sig_a"))
      .join(broadcast(sig.select(col("simhash").as("sig_b"),
            col("doc_id").as("db"))), Seq("sig_b"))
      .select(least(col("da"), col("db")).as("doc_a"),
              greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    t("intra w/ select")(intraFull.count())
    t("inter w/ select")(interFull.count())
    val u = intraFull.unionByName(interFull)
    val cnt = u.groupBy().count()
    println("#### union-count executed plan")
    cnt.collect()
    println(cnt.queryExecution.executedPlan.toString.linesIterator
      .take(60).mkString("\n"))
    spark.stop()
  }
}
