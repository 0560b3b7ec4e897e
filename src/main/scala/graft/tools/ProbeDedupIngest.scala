package graft.tools


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: phase-level timing of ONE dedup-index ingest batch
  * against a large stored index — used to find where the s_dedup_index
  * bench's per-batch seconds actually go (guessing twice failed:
  * neither the triple signature pass nor the small-file open cost moved
  * the wall). Not part of the declared surface. */
object ProbeDedupIngest {
  def main(args: Array[String]): Unit = {
    // arg "sep": the BENCH corpus shape (separated 60k-vocab texts, 4
    // exact copies per distinct — band-collision-free) on local[32]/8
    // like BenchStream; default: the band-DEGENERATE corpus that
    // documents the pair-count-gate finding below.
    val sep = args.headOption.contains("sep")
    val spark = SparkSession.builder()
      .master(if (sep) "local[32]" else "local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{DedupIndex, MinHashLSH}

    def sepTok(b: Int, i: Int): String =
      s"w${(b.toLong * 131 + i * 31 + (b.toLong * i) % 17) % 60013}"
    def docAt(k: Int): (Long, String) =
      if (sep) (k.toLong,
        (0 until 12).map(i => sepTok(k % 10000, i)).mkString(" "))
      else {
        val base = k % 10000
        (k.toLong, s"crawl snapshot body $base with stable filler tokens " +
          s"for realistic width ${base % 97}")
      }
    val tmp = System.getProperty("java.io.tmpdir")
    val root = s"$tmp/graft_probe_dedupindex"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))

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

    // backfill: 39k docs in ONE ingest partition (file layout is not the
    // suspect per the coalesce test — build it in one shot)
    val backfill = (0 until 39000).map(docAt).toDF("doc_id", "text")
    t("backfill build") {
      DedupIndex.build(graft.Graft.shingleRows(backfill, "doc_id", "text",
        n = 3), root)
    }

    val batch = (39000 until 40000).map(docAt).toDF("doc_id", "text")
      .localCheckpoint(true)
    for (round <- 1 to 2) {
      println(s"[probe] ---- round $round")
      val sh = t("shingle+ckpt") {
        graft.Graft.shingleRows(batch, "doc_id", "text", n = 3)
          .localCheckpoint(true)
      }
      val bd = t("bands+ckpt") {
        MinHashLSH.bands(MinHashLSH.signatures(sh, 16), 8, 2)
          .localCheckpoint(true)
      }
      val pf = t("profiles+ckpt") { DedupIndex.profiles(sh).localCheckpoint(true) }
      t("within pairs") {
        graft.queries.DedupOps
          .jaccardPairs(sh, Some(MinHashLSH.candidatePairsFromBands(bd)))
          .filter(col("jaccard_raw") >= 0.8).count()
      }
      // replicate queryPrepared's internals with per-phase timers.
      // FINDING (r18): on THIS probe's corpus the cands materialization
      // is the wall because the corpus is band-DEGENERATE — the texts
      // share nearly all their 3-gram shingles (only $base and
      // ${base%97} vary), so minhash bands collide corpus-wide and a
      // 1000-doc batch yields 27.7M candidate pairs. That is precisely
      // the fan-out hazard queryPrepared's PAIR-COUNT gate exists for
      // (the round-10 OOM catch): the gate's checkpoint+count actions
      // are load-bearing safety, not removable job-floor fat. The
      // BENCH corpus (60013-token space) is non-degenerate and its
      // per-batch cost is the ~1.2 s commit floor the trigger matrix
      // quantifies.
      locally {
        import org.apache.spark.sql.functions.broadcast
        val nBatch = t("  nBatch count") { pf.count() }
        val batchBands = bd.withColumnRenamed("doc_id", "batch_doc")
        val candsPlan = spark.read.parquet(s"$root/bands")
          .join(broadcast(batchBands), Seq("band_idx", "band_hash"))
          .select(col("batch_doc"), col("doc_id").as("corpus_doc"))
          .distinct()
        val cands = t("  cands ckpt") { candsPlan.localCheckpoint(true) }
        val nPairs = t("  nPairs count") { cands.count() }
        println(s"[probe]   nBatch=$nBatch nPairs=$nPairs")
        val verified = cands.join(pf
          .select(col("doc_id").as("batch_doc"), col("ss").as("sa"),
            col("n_sh").as("n_a")), Seq("batch_doc"))
        val out = spark.read.parquet(s"$root/profiles")
          .select(col("doc_id").as("corpus_doc"), col("ss").as("sb"),
            col("n_sh").as("n_b"))
          .join(broadcast(verified), Seq("corpus_doc"))
          .withColumn("n_inter",
            size(array_intersect(col("sa"), col("sb"))).cast("long"))
          .filter(col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double") >= 0.8)
        t("  verify count") { out.count() }
      }
      val cross = t("queryPrepared plan+exec") {
        DedupIndex.queryPrepared(spark, root, bd, pf)
      }
      t("cross count") { cross.count() }
      // the one-candidate-pass form (the streaming face since r18):
      // same pair set, one gate, one verify
      val fused = t("ingestQueryFused plan+exec") {
        DedupIndex.ingestQueryFused(spark, root, bd, pf,
          excludeIds = batch.select(col("doc_id")))
      }
      t("fused count") { fused.count() }
      t("append write") { DedupIndex.writePrepared(bd, pf, root, round.toLong) }
    }
    spark.stop()
  }
}
