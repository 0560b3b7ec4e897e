package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex
import graft.sources.Tables

/** The dedup-index-at-rest contract: the stored band+profile artifact
  * dedups an incoming batch (a) identically to the exhaustive exact-
  * Jaccard pair set restricted to the batch/corpus split, (b) purely
  * from storage on repeat queries, (c) incrementally via append —
  * indexing a batch costs O(batch), never a corpus re-signature — and
  * (d) without ever shuffling the stored corpus (broadcast-batch plan
  * shape, the 100-TB property the artifact exists for). */
class DedupIndexSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_didx_$tag").toString

  private def shingles(sfDir: String, pred: org.apache.spark.sql.Column) =
    graft.Graft.shingleRows(
      Tables.documents(spark, sfDir).filter(pred), "doc_id", "text", n = 3)

  /** Exhaustive ground truth: exact Jaccard >= t over batch×corpus pairs
    * via the shared shingle equi-join path (no banding involved). */
  private def exhaustive(sfDir: String, t: Double): Seq[String] = {
    val sh = graft.Graft.shingleRows(
      Tables.documents(spark, sfDir), "doc_id", "text", n = 3)
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("ss"),
           count(lit(1)).as("n_sh"))
    val batch = sets.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id").as("batch_doc"), col("ss").as("sa"),
              col("n_sh").as("n_a"))
    val corpus = sets.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id").as("corpus_doc"), col("ss").as("sb"),
              col("n_sh").as("n_b"))
    batch.crossJoin(corpus)
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("j", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("j") >= t)
      .select(col("batch_doc"), col("corpus_doc"),
              round(col("j"), 6).as("jaccard"))
      .orderBy("batch_doc", "corpus_doc")
      .collect().map(_.toString).toSeq
  }

  private def declared(sfDir: String): Seq[String] =
    SparkEntry.queries("q_dedup_index_query")(spark, sfDir)
      .collect().map(_.toString).toSeq

  test("q_dedup_index_query == exhaustive batch×corpus Jaccard at two tiers") {
    for (sf <- Seq(sf0001, sf001))
      assert(declared(sf) === exhaustive(sf, 0.8), s"mismatch at $sf")
  }

  test("repeat queries answer purely from storage (no rebuild, identical)") {
    // first declared call built the artifact; a second must return the
    // identical pair set without re-signaturing the corpus
    val first = declared(sf0001)
    val second = declared(sf0001)
    assert(first === second && first.nonEmpty)
  }

  test("append == rebuild: incremental indexing matches a full build") {
    val docs = Tables.documents(spark, sf001)
    val corpusPred = pmod(col("doc_id"), lit(5)) =!= 0
    // full build over the whole corpus
    val full = tmpRoot("full")
    DedupIndex.build(shingles(sf001, corpusPred), full)
    // half-then-append: initial backfill + an incremental day
    val incr = tmpRoot("incr")
    DedupIndex.build(
      shingles(sf001, corpusPred && col("doc_id") < 250), incr)
    DedupIndex.append(
      shingles(sf001, corpusPred && col("doc_id") >= 250), incr, ingestId = 1)
    val batch = shingles(sf001, pmod(col("doc_id"), lit(5)) === 0)
      .localCheckpoint(true)
    def ask(root: String) =
      DedupIndex.queryBatch(spark, root, batch)
        .orderBy("batch_doc", "corpus_doc").collect().map(_.toString).toSeq
    assert(ask(incr) === ask(full) && ask(full).nonEmpty)
  }

  test("the query path never shuffles the stored corpus (broadcast-batch shape)") {
    // since the adaptive-broadcast change the query is TWO plans: the
    // candidate job (bands scan, checkpointed for the pair-count plan
    // pick) and the verify job (profiles scan). The invariant is the
    // same for both: on an increment-sized batch the stored-artifact
    // scan joins through a BROADCAST of the batch side — an Exchange
    // hashpartitioning over a stored-table scan would mean the corpus
    // is shuffled per batch.
    val root = tmpRoot("shape")
    DedupIndex.build(shingles(sf001, pmod(col("doc_id"), lit(5)) =!= 0), root)
    val q = DedupIndex.queryBatch(spark, root,
      shingles(sf001, pmod(col("doc_id"), lit(5)) === 0))
    q.collect()
    // AQE-final section only (toString repeats scans in "== Initial Plan ==")
    def finalPlan(full: String): String = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    val verify = finalPlan(q.queryExecution.executedPlan.toString)
    assert(verify.contains("BroadcastHashJoin"), s"no broadcast join:\n$verify")
    // the stored profiles scan must sit on the STREAMED side: in the
    // indented plan tree a scan under the BroadcastExchange appears
    // AFTER that node, so "profiles scan before any BroadcastExchange"
    // pins the build side to the batch frame (the batch-bounded side
    // may shuffle internally — that's fine and batch-sized)
    val lines = verify.linesIterator.toSeq
    val profIdx = lines.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("/profiles"))
    val bcastIdx = lines.indexWhere(_.contains("BroadcastExchange"))
    assert(profIdx >= 0, s"verify job does not scan the stored profiles:\n$verify")
    assert(bcastIdx >= 0 && profIdx < bcastIdx,
      s"stored profiles are on the built (broadcast) side, not streamed:\n$verify")
    // candidate job: rebuild its un-checkpointed twin to inspect the plan
    // (queryBatch checkpoints it for the pair-count plan pick)
    val batchSh = shingles(sf001, pmod(col("doc_id"), lit(5)) === 0)
    val bands = graft.operators.MinHashLSH.bands(
      graft.operators.MinHashLSH.signatures(batchSh, 16), 8, 2)
      .withColumnRenamed("doc_id", "batch_doc")
    val cands = spark.read.parquet(s"$root/bands")
      .join(org.apache.spark.sql.functions.broadcast(bands),
        Seq("band_idx", "band_hash"))
      .select(col("batch_doc"), col("doc_id").as("corpus_doc")).distinct()
    cands.collect()
    val candPlan = finalPlan(cands.queryExecution.executedPlan.toString)
    assert(candPlan.contains("BroadcastHashJoin"),
      s"candidate job does not broadcast the batch bands:\n$candPlan")
    assert(candPlan.linesIterator.exists(l =>
      l.contains("FileScan parquet") && l.contains("/bands")),
      s"candidate job does not stream the stored bands:\n$candPlan")
  }

  test("shuffle branch (corpus-scale batch) ≡ broadcast branch at two sizes") {
    // The adaptive pick's OTHER arm — the plan that exists because a
    // forced broadcast of a 100k-doc batch OOMed the 100× probe. Force
    // it by zeroing the gates and pin (a) bit-for-bit result equality
    // with the broadcast branch and (b) the plan shape: no broadcast of
    // the batch frame — the joins run as exchanges on the join keys.
    for (sf <- Seq(sf0001, sf001)) {
      val root = tmpRoot("shufbr")
      DedupIndex.build(shingles(sf, pmod(col("doc_id"), lit(5)) =!= 0), root)
      val batch = shingles(sf, pmod(col("doc_id"), lit(5)) === 0)
      def ask(docLim: Long, pairLim: Long) =
        DedupIndex.queryBatch(spark, root, batch,
          docBroadcastLimit = docLim, pairBroadcastLimit = pairLim)
      val bcast = ask(20000L, 100000L)
      // Zeroing the gates removes the HINT; at fixture scale AQE still
      // elects to broadcast the byte-tiny frames (correct adaptive
      // behavior — at a real corpus-scale batch the frames exceed the
      // auto threshold and AQE goes shuffle on its own). Pin the shuffle
      // SHAPE by also disabling auto-broadcast, the way the 100×-scale
      // sizes would.
      val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold")
      val prev = thresholds.map(t => t -> spark.conf.getOption(t)).toMap
      thresholds.foreach(spark.conf.set(_, "-1"))
      val (shuf, shufRows) =
        try {
          val df = ask(0L, 0L).orderBy("batch_doc", "corpus_doc")
          (df, df.collect().map(_.toString).toSeq) // executed shuffle-shaped
        } finally prev.foreach {
          case (t, Some(v)) => spark.conf.set(t, v)
          case (t, None)    => spark.conf.unset(t)
        }
      assert(shufRows
        === bcast.orderBy("batch_doc", "corpus_doc").collect().map(_.toString).toSeq,
        s"shuffle branch diverged from broadcast branch at $sf")
      def finalPlan(full: String): String =
        full.indexOf("== Initial Plan ==") match {
          case -1 => full
          case i  => full.substring(0, i)
        }
      val plan = finalPlan(shuf.queryExecution.executedPlan.toString)
      assert(!plan.contains("BroadcastHashJoin"),
        s"shuffle branch still broadcasts at $sf:\n$plan")
      assert(plan.contains("Exchange hashpartitioning"),
        s"shuffle branch shows no key exchange at $sf:\n$plan")
    }
  }

  test("compact: answers, band and profile rows preserved; ingests fold to one") {
    val corpusPred = pmod(col("doc_id"), lit(5)) =!= 0
    val root = tmpRoot("cpt")
    DedupIndex.build(
      shingles(sf001, corpusPred && col("doc_id") < 200), root)
    DedupIndex.append(
      shingles(sf001, corpusPred && col("doc_id") >= 200 &&
        col("doc_id") < 320), root, ingestId = 1)
    DedupIndex.append(
      shingles(sf001, corpusPred && col("doc_id") >= 320), root,
      ingestId = 2)
    val batch = shingles(sf001, pmod(col("doc_id"), lit(5)) === 0)
      .localCheckpoint(true)
    def ask() = DedupIndex.queryBatch(spark, root, batch)
      .orderBy("batch_doc", "corpus_doc").collect().map(_.toString).toSeq
    def rows(sub: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$root/$sub")
        .select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    val (beforeAns, beforeBands, beforeProfs) =
      (ask(), rows("bands", Seq("doc_id", "band_idx", "band_hash")),
        rows("profiles", Seq("doc_id", "ss", "n_sh")))
    DedupIndex.compact(spark, root)
    assert(ask() === beforeAns, "compaction changed the query answer")
    assert(rows("bands", Seq("doc_id", "band_idx", "band_hash"))
      === beforeBands, "compaction changed the band rows")
    assert(rows("profiles", Seq("doc_id", "ss", "n_sh")) === beforeProfs,
      "compaction changed the profile rows")
    def ingests(sub: String): Seq[String] = {
      val d = new java.io.File(s"$root/$sub")
      d.listFiles().toSeq.map(_.getName).filter(_.startsWith("ingest="))
        .sorted
    }
    assert(ingests("bands") === Seq("ingest=0") &&
      ingests("profiles") === Seq("ingest=0"),
      "compaction left more than the single ingest-0 partition")
  }

  test("replaying an ingest already folded by compaction is refused (HWM)") {
    val root = tmpRoot("cpthwm")
    DedupIndex.build(shingles(sf001, col("doc_id") < 100), root)
    val inc = shingles(sf001,
      col("doc_id") >= 100 && col("doc_id") < 150).localCheckpoint(true)
    DedupIndex.append(inc, root, ingestId = 1)
    DedupIndex.compact(spark, root)
    assert(DedupIndex.compactedThrough(spark, root) === 1L)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.append(inc, root, ingestId = 1)
    }
    assert(e.getMessage.contains("high-water"),
      s"wrong refusal message: ${e.getMessage}")
    // a NEW ingest above the mark is still accepted
    DedupIndex.append(
      shingles(sf001, col("doc_id") >= 150 && col("doc_id") < 180), root,
      ingestId = 2)
  }

  test("an uncommitted (crashed) append is invisible to queries — " +
      "bands-only commits too — and redeliverable") {
    // writePrepared lands bands BEFORE profiles, so two crash windows
    // exist: no marker at all, and committed bands with uncommitted
    // profiles. Both must read as 'ingest absent' (the committedIngests
    // both-dirs intersection) — trusting bands alone would generate
    // candidates that verify against NO profile row and silently drop
    // real pairs; trusting partial rows would answer wrongly until the
    // replay. The FrameIndexSpec crashed-append law, on this index.
    val root = tmpRoot("crash")
    DedupIndex.build(shingles(sf001, col("doc_id") < 200), root)
    def q(): Seq[String] =
      DedupIndex.queryBatch(spark, root,
          shingles(sf001, pmod(col("doc_id"), lit(5)) === 0))
        .collect().map(_.toString).sorted.toSeq
    val before = q()
    assert(before.nonEmpty, "fixture produced no stored hits")
    val inc = shingles(sf001,
      col("doc_id") >= 200 && col("doc_id") < 260).localCheckpoint(true)
    DedupIndex.append(inc, root, ingestId = 1)
    val committed = q()
    assert(committed.size > before.size,
      "test shape: the appended docs must add query hits")
    // window 1: profiles marker torn (bands committed) — the ingest
    // must vanish ENTIRELY, not leave verify-less band candidates
    val profMarker = new java.io.File(s"$root/profiles/ingest=1/_SUCCESS")
    assert(profMarker.exists && profMarker.delete())
    assert(q() === before,
      "bands-only ingest visible: candidates without profiles")
    // window 2: both markers torn
    val bandMarker = new java.io.File(s"$root/bands/ingest=1/_SUCCESS")
    assert(bandMarker.exists && bandMarker.delete())
    assert(q() === before, "uncommitted ingest rows visible to queries")
    // the at-least-once redelivery lands normally
    DedupIndex.append(inc, root, ingestId = 1)
    assert(q() === committed, "redelivered ingest must restore the answer")
  }

  test("ingestQueryFused == within-pairs ∪ stored-query, redeliveries " +
      "excluded, both gate branches") {
    // the one-candidate-pass screen must reproduce the unfused pair
    // set exactly on a split where every population is non-trivial:
    // within-batch near-dups, batch×stored hits, and a redelivered doc
    // (in both batch and store — must match nothing of itself). The
    // sf0.01 fixture carries natural near-dups in all groups.
    import graft.operators.MinHashLSH
    val root = tmpRoot("fused")
    val m5 = pmod(col("doc_id"), lit(5))
    DedupIndex.build(shingles(sf001, m5 =!= 0 && m5 =!= 1), root)
    // batch = splits 0+1, with split-1 docs ALSO re-appended to the
    // store first (the redelivery population)
    DedupIndex.append(shingles(sf001, m5 === 1), root, ingestId = 1)
    val batchDocs = Tables.documents(spark, sf001)
      .filter(m5 === 0 || m5 === 1).select("doc_id", "text")
    val sh = graft.Graft.shingleRows(batchDocs, "doc_id", "text", n = 3)
      .localCheckpoint(true)
    val bd = MinHashLSH.bands(MinHashLSH.signatures(sh, 16), 8, 2)
      .localCheckpoint(true)
    val pf = DedupIndex.profiles(sh).localCheckpoint(true)
    val within = graft.queries.DedupOps
      .jaccardPairs(sh, Some(MinHashLSH.candidatePairsFromBands(bd)))
      .filter(col("jaccard_raw") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val cross = DedupIndex.queryPrepared(spark, root, bd, pf)
      .join(broadcast(batchDocs.select(col("doc_id").as("corpus_doc"))),
            Seq("corpus_doc"), "left_anti")
      .select(least(col("batch_doc"), col("corpus_doc")).as("doc_a"),
              greatest(col("batch_doc"), col("corpus_doc")).as("doc_b"),
              col("jaccard"))
    val unfused = within.unionByName(cross)
      .collect().map(_.toString).sorted.toSeq
    def fused(docLimit: Long, pairLimit: Long): Seq[String] =
      DedupIndex.ingestQueryFused(spark, root, bd, pf,
          excludeIds = batchDocs, docBroadcastLimit = docLimit,
          pairBroadcastLimit = pairLimit)
        .collect().map(_.toString).sorted.toSeq
    val bcast = fused(20000L, 100000L)
    assert(bcast === unfused,
      "one-candidate-pass screen diverges from the unfused operators")
    assert(fused(0L, 0L) === unfused,
      "fused shuffle branch diverges from the broadcast branch")
    // teeth: every population contributed
    assert(within.count() > 0, "no within-batch pairs in the fixture")
    assert(cross.count() > 0, "no batch×stored pairs in the fixture")
    val redelivered = Tables.documents(spark, sf001).filter(m5 === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(redelivered.nonEmpty)
  }
}
