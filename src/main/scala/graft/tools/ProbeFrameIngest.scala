package graft.tools


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: phase-level timing of the frame-index ingest batch —
  * where do s_frame_index_ingest's per-batch seconds go (containment vs
  * screen vs append vs the output write)? Mirrors the BenchStream
  * corpus (40k docs, 40 batches, empty backfill) but drives the batch
  * body by hand so each phase gets its own wall clock and job count.
  * Not part of the declared surface. */
object ProbeFrameIngest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{FrameIndex, PHash}
    import graft.streaming.Streams

    def tok(b: Int, i: Int): String =
      s"w${(b.toLong * 131 + i * 31 + (b.toLong * i) % 17) % 60013}"
    def cleanText(b: Int): String =
      (0 until 12).map(i => tok(b, i)).mkString(" ")
    val nIngest = 40000
    val nDistinct = nIngest / 4
    val docs = (0 until nIngest).iterator
      .map(k => (k.toLong, cleanText(k % nDistinct))).toVector

    val tmp = System.getProperty("java.io.tmpdir")
    val root = s"$tmp/graft_probe_frameingest/idx"
    val out = s"$tmp/graft_probe_frameingest_out"
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$tmp/graft_probe_frameingest"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))

    val sc = spark.sparkContext
    def t[A](label: String)(body: => A): A = {
      val j0 = sc.statusTracker.getJobIdsForGroup(null).length
      val t0 = System.nanoTime()
      val r = body
      val jobs = sc.statusTracker.getJobIdsForGroup(null).length - j0
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  ($jobs%3d jobs)")
      r
    }

    FrameIndex.build(
      docs.take(1).toDF("doc_id", "text").filter(lit(false)), root)

    val bs = docs.grouped(1000).toSeq
    // run the first 20 batches through the REAL entry to grow the index,
    // then decompose batches 21..24 phase by phase
    bs.take(20).zipWithIndex.foreach { case (b, i) =>
      Streams.frameIndexIngest(b.toDF("doc_id", "text"), root, out, i.toLong)
    }
    println("[probe] index grown to 20k docs; decomposing next batches")
    bs.slice(20, 24).zipWithIndex.foreach { case (b, i) =>
      val batchId = 20L + i
      println(s"[probe] ---- batch $batchId (fused decomposition)")
      val batch = b.toDF("doc_id", "text")
      val sig = t("sig ckpt") {
        PHash.frameSignatures(graft.operators.Multimodal.sampleFrames(
            graft.operators.Multimodal.fromDocuments(batch), PHash.NPix, 2))
          .localCheckpoint(true)
      }
      val fused = t("fused screen define") {
        PHash.ingestScreenFused(batch, sig, FrameIndex.stored(spark, root),
          FrameIndex.hotHashes(spark, root))
      }
      t("fused write") {
        fused.write.mode("overwrite").parquet(s"$out/v$batchId")
      }
      t("appendSig") { FrameIndex.appendSig(sig, root, batchId + 1) }
      // (an AQE-off control was probed here: same wall at fewer jobs —
      // the per-batch floor is broadcast materializations + per-stage
      // task scheduling, which static execution pays too, NOT AQE's
      // stage-job bookkeeping; so the fusion attacks exchange count)
      // the pre-fusion form for comparison (same batch, separate out dir)
      val within = PHash.frameContainment(batch,
        precomputedSig = Some(sig), ordered = false)
      val cross = PHash.screenAdmitFused(sig, FrameIndex.stored(spark, root),
        excludeStored = batch,
        hotHashes = Some(FrameIndex.hotHashes(spark, root)))
      t("unfused union write") {
        within.unionByName(cross).write.mode("overwrite")
          .parquet(s"$out/v${batchId}_unfused")
      }
    }
    // and the undecomposed real entry for reference
    bs.slice(24, 36).zipWithIndex.foreach { case (b, i) =>
      t(s"real frameIndexIngest ${24 + i}") {
        Streams.frameIndexIngest(b.toDF("doc_id", "text"), root, out,
          24L + i)
      }
    }
    spark.stop()
  }
}
