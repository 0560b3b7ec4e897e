package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of q_frame_index_backfill's screen at
  * a given tier — wave signature pass (sample + dHash + hot anti-join)
  * vs the stored equi-join + pair aggregation — so a signature-kernel
  * change's effect is attributable. Usage:
  * runMain graft.tools.ProbeFrameBackfill <sfDir> [reps]
  */
object ProbeFrameBackfill {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.{FrameIndex, Multimodal, PHash}

    def t(label: String)(body: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s min=${xs.map(_._1).min}%.2f rows=${xs.head._2} " +
        s"all=${xs.map(x => f"${x._1}%.2f").mkString(",")}")
    }

    val root = graft.queries.Scans.scratch("frameindexbf", spark, d)
    val docs = graft.sources.Tables.documents(spark, d)
    val m5 = pmod(col("doc_id"), lit(5))
    if (!FrameIndex.exists(spark, root))
      FrameIndex.build(docs.filter(m5 === 0), root)
    val wave = docs.filter(m5 =!= 0)

    t("full screen (the key)") {
      PHash.screenFrames(wave, FrameIndex.stored(spark, root),
          hotHashes = Some(FrameIndex.hotHashes(spark, root)))
        .orderBy("batch_doc", "corpus_doc").count()
    }
    t("wave signatures only") {
      PHash.frameSignatures(Multimodal.sampleFrames(
        Multimodal.fromDocuments(wave), PHash.NPix, 2)).count()
    }
    t("stored scan only")(FrameIndex.stored(spark, root).count())
    spark.stop()
  }
}
