package graft.tools


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: decompose the r17 rep-assignment grainedSignatures —
  * where did q_dedup_simhash's 4.35 → 35 s at 100× come from?
  * Usage: runMain graft.ProbeSim2 <sfDir> [reps]
  */
object ProbeSim2 {
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
      println(f"$label%-28s min=${xs.map(_._1).min}%.2f rows=${xs.head._2} " +
        s"all=${xs.map(x => f"${x._1}%.2f").mkString(",")}")
    }

    // the new rep-assignment grainedSignatures, inline
    def newSig(gateOn: Boolean): DataFrame = {
      val g = docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep"))
        .localCheckpoint(true)
      val repSig = graft.operators.SimHash.signatures(
        g.select(col("rep").as("doc_id"), col("text")))
      val sigByText = g
        .join(repSig.select(col("doc_id").as("rep"), col("simhash")),
              Seq("rep"))
        .select(col("text"), col("simhash"))
      val gated = if (gateOn) broadcast(sigByText) else sigByText
      docs.select(col("doc_id"), col("text"))
        .join(gated, Seq("text"))
        .select(col("doc_id"), col("simhash"))
    }
    t("new sig bcast")(newSig(true).count())
    t("new sig shuffle")(newSig(false).count())
    t("new sig bcast ckpt")(newSig(true).localCheckpoint(true).count())
    val sigPlain = newSig(true).localCheckpoint(true)
    val sigClustered = newSig(true)
      .repartition(32, col("simhash")).sortWithinPartitions("simhash")
      .localCheckpoint(true)
    var sig = sigClustered
    println("sig partitions: " + sig.rdd.getNumPartitions)
    t("pairs from CLUSTERED ckpt") {
      val nParts = 32
      val diag = sig.select(col("simhash")).distinct()
        .select(col("simhash").as("sig_a"), col("simhash").as("sig_b"),
                lit(0L).as("hamming"))
      val sigPairs = graft.operators.SimHash.signaturePairs(sig, 4, 3)
        .unionByName(diag)
        .repartition(nParts)
      sigPairs
        .join(broadcast(sig.select(col("simhash").as("sig_a"),
                              col("doc_id").as("da"))), Seq("sig_a"))
        .join(broadcast(sig.select(col("simhash").as("sig_b"),
                              col("doc_id").as("db"))), Seq("sig_b"))
        .filter(col("sig_a") =!= col("sig_b") || col("da") < col("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
                greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
        .count()
    }
    sig = sigPlain
    t("pairs from PLAIN ckpt") {
      val diag = sig.select(col("simhash")).distinct()
        .select(col("simhash").as("sig_a"), col("simhash").as("sig_b"),
                lit(0L).as("hamming"))
      val sigPairs = graft.operators.SimHash.signaturePairs(sig, 4, 3)
        .unionByName(diag)
        .repartition(32)
      sigPairs
        .join(broadcast(sig.select(col("simhash").as("sig_a"),
                              col("doc_id").as("da"))), Seq("sig_a"))
        .join(broadcast(sig.select(col("simhash").as("sig_b"),
                              col("doc_id").as("db"))), Seq("sig_b"))
        .filter(col("sig_a") =!= col("sig_b") || col("da") < col("db"))
        .select(least(col("da"), col("db")).as("doc_a"),
                greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
        .count()
    }
    spark.stop()
  }
}
