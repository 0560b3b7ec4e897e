package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash/LSH dedup index AT REST — the artifact-centric half of the
  * near-dup stack, mirroring [[AnnIndex]] for retrieval.
  *
  * q_dedup_minhash demonstrates the banded-LSH *math* end-to-end, but
  * re-signatures the whole corpus inside every execution. No 100-TB
  * dedup pipeline works that way: the corpus is signatured ONCE, the
  * artifact lives on shared storage, and each incoming batch (a crawl
  * snapshot, a day of documents) is deduped AGAINST the stored index —
  * then appended to it. Artifacts:
  *
  *   root/bands/    — (band_idx, band_hash, doc_id)   corpus band buckets
  *   root/profiles/ — (doc_id, ss, n_sh)              sorted shingle sets
  *
  * Scale shape of the query path (the whole point of the artifact):
  *  - the BATCH side is signatured in flight (batch ≪ corpus) and, for
  *    INCREMENT-SIZED batches, its band rows are BROADCAST, so candidate
  *    generation is one streaming scan of the stored band table through a
  *    BroadcastHashJoin — the corpus is never shuffled, and the band
  *    files are written sorted on (band_idx, band_hash) so parquet
  *    min/max row-group stats prune buckets that no batch band touches;
  *  - exact-Jaccard verification joins the (batch-bounded) candidate set
  *    against the stored PROFILES table the same way — candidates
  *    broadcast, profile scan streams, zero corpus shuffle. Precision is
  *    exact (array_intersect on the stored sorted sets); the only
  *    approximation is banding recall at the threshold, identical to
  *    q_dedup_minhash (b=8, r=2: P(candidate | J=0.8) ≈ 0.9997);
  *  - the broadcasts are ADAPTIVE, each gated on the size of the frame
  *    it actually ships: the bands join on batch DOC count (payload =
  *    band rows), the profiles join on candidate PAIR count (payload =
  *    pairs × full shingle sets — a small batch against a
  *    high-duplication corpus fans out to millions of pairs, so doc
  *    count alone would still OOM the driver). Above the thresholds
  *    queryBatch falls back to plain shuffle joins — the correct plan
  *    once the "batch" is itself corpus-scale (found the hard way: a
  *    100k-doc batch at the 100× probe tier OOMed the forced
  *    broadcast). The size facts cost two bounded jobs at call time
  *    (the AQE trade); the batch shingles are checkpointed once so
  *    nothing is shingled twice.
  *
  * The batch-vs-corpus contract means a pipeline alternates
  * queryBatch → append: accepted batches join the index incrementally,
  * so the corpus is signatured exactly once across its lifetime. Both
  * artifacts are hive-partitioned by INGEST id (`bands/ingest=N/`):
  * each append overwrites only its own ingest partition, which makes
  * re-delivery of a batch (a streaming replay after failure) exactly
  * idempotent — the property [[graft.streaming.Streams.dedupIndexIngest]]
  * builds on — and gives per-batch lineage/retention at rest for free.
  */
object DedupIndex {

  private def bandsDir(root: String)    = s"$root/bands"
  private def profilesDir(root: String) = s"$root/profiles"
  private def hwmPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/compacted_through")

  private def fsOf(s: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest ingest id folded by a [[compact]] (−1 if never compacted):
    * appends at or below it are refused — their documents are already
    * in the compacted partition, and re-appending would duplicate every
    * band and profile row (the InvertedIndex high-water-mark rule). */
  def compactedThrough(s: SparkSession, root: String): Long = {
    val fs = fsOf(s, root)
    if (!fs.exists(hwmPath(root))) -1L
    else {
      val in = fs.open(hwmPath(root))
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Ingest ids committed on BOTH artifact sides (profiles are written
    * last, so a torn append shows bands without profiles and is
    * excluded — folding it would bake half a batch into ingest 0). */
  private def committedIngests(s: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(s, root)
    def ids(dir: String): Set[Long] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith("ingest="))
        .filter(st => fs.exists(
          new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.getName.stripPrefix("ingest=").toLong).toSet
    }
    (ids(bandsDir(root)) intersect ids(profilesDir(root))).toSeq.sorted
  }

  /** True iff an index exists under `root` (the backfill's profiles are
    * written last, so their _SUCCESS marker implies the whole artifact).
    * Side effect by design: first repairs any compaction swap a crash
    * tore mid-rename (util.AtomicSwap.recover — the compacted artifact,
    * complete but not yet promoted, is moved into place), so a torn
    * swap heals on first touch instead of reading as "no index" and
    * baiting callers into a wipe-and-rebuild over the orphaned fold. */
  def exists(s: SparkSession, root: String): Boolean = {
    val fs = fsOf(s, root)
    graft.util.AtomicSwap.recover(
      fs, new org.apache.hadoop.fs.Path(root), "compacted_through")
    fs.exists(new org.apache.hadoop.fs.Path(
      s"${profilesDir(root)}/ingest=0/_SUCCESS"))
  }

  /** Per-doc profile rows (doc_id, ss: sorted shingle array, n_sh) from
    * (doc_id, shingle) rows — the exact-verify artifact. */
  private[graft] def profiles(shingleRows: DataFrame): DataFrame =
    shingleRows.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("ss"),
           count(lit(1)).as("n_sh"))

  /** Signature the initial corpus (the backfill) and persist the index
    * as ingest partition 0, wiping any previous artifact under `root`.
    * `shingleRows` = (doc_id, shingle:int64) rows (Graft.shingleRows). */
  def build(shingleRows: DataFrame, root: String, k: Int = 16, b: Int = 8,
            r: Int = 2): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(
      shingleRows.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    writeRows(shingleRows, root, 0L, k, b, r)
  }

  /** Incrementally index an accepted batch as ingest partition
    * `ingestId` (> 0, unique per batch — a streaming batchId). The
    * corpus is never re-signatured — this is the step that makes 100-TB
    * dedup O(batch) per day instead of O(corpus) — and re-delivering
    * the same batch overwrites its own partition, so replays are
    * exactly idempotent. */
  def append(shingleRows: DataFrame, root: String, ingestId: Long,
             k: Int = 16, b: Int = 8, r: Int = 2): Unit = {
    require(ingestId > 0, s"ingestId must be > 0 (0 is the backfill): $ingestId")
    writeRows(shingleRows, root, ingestId, k, b, r)
  }

  private def writeRows(shingleRows: DataFrame, root: String,
                        ingestId: Long, k: Int, b: Int, r: Int): Unit =
    writePrepared(MinHashLSH.bands(MinHashLSH.signatures(shingleRows, k),
      b, r), profiles(shingleRows), root, ingestId)

  /** [[append]] from PRECOMPUTED (bands, profiles) frames — the ingest
    * path computes them once per batch and shares them across the
    * within-batch pairing, the stored-index query, and this write.
    *
    * FILE-COUNT discipline (the small-file problem, measured): every
    * batch's queryBatch re-scans the whole stored index, and Spark pays
    * a per-FILE open cost (openCostInBytes bin-packing, footer read,
    * stream open) — with shuffle-partition-many files per ingest the
    * 40k-doc stream bench degraded to ~16 s/batch by batch 40, ~7 s of
    * which was just opening ~700 accumulated small files per scan. So:
    * the BACKFILL (ingest 0, corpus-sized) keeps the band_idx
    * repartition for parallel scan bandwidth, while INCREMENTS (batch-
    * sized by the queryBatch→append contract) each write ONE band file
    * and ONE profile file, globally sorted on the probe key so row-group
    * min/max pruning still applies. A long-running deployment
    * additionally compacts old increments into the backfill partition —
    * same answer, bounded file count. */
  private[graft] def writePrepared(bd: DataFrame, pf: DataFrame,
                                   root: String, ingestId: Long): Unit = {
    if (ingestId > 0L) {
      val hwm = compactedThrough(bd.sparkSession, root)
      require(ingestId > hwm,
        s"ingest $ingestId was already folded by a compaction (high-water " +
          s"mark $hwm) — re-appending it would duplicate every document")
    }
    // sorted on the probe key: bucket lookups skip row groups via
    // parquet min/max stats instead of scanning every band file
    val bands =
      if (ingestId == 0L) bd.repartition(col("band_idx"))
      else bd.repartition(1)
    bands.sortWithinPartitions("band_idx", "band_hash")
      .write.mode("overwrite").parquet(s"${bandsDir(root)}/ingest=$ingestId")
    val profs = if (ingestId == 0L) pf else pf.coalesce(1)
    profs.write.mode("overwrite")
      .parquet(s"${profilesDir(root)}/ingest=$ingestId")
  }

  /** Near-duplicate pairs (batch_doc, corpus_doc, jaccard) between an
    * incoming batch and the STORED corpus index: banded candidates from
    * the band artifact, exact Jaccard >= `threshold` from the profile
    * artifact. The corpus documents themselves are never read — only
    * their (8-byte band rows, shingle profiles) at rest. */
  /** `docBroadcastLimit` / `pairBroadcastLimit` expose the adaptive-pick
    * thresholds (tests pin the shuffle branch by forcing them to 0; the
    * defaults are the production gates). */
  def queryBatch(s: SparkSession, root: String, batchShingles: DataFrame,
                 k: Int = 16, b: Int = 8, r: Int = 2,
                 threshold: Double = 0.8,
                 docBroadcastLimit: Long = 20000L,
                 pairBroadcastLimit: Long = 100000L): DataFrame = {
    // Adaptive plan picks need SIZE FACTS, which cost bounded jobs (the
    // same trade AQE makes): checkpoint the batch shingles once so the
    // two decision counts never re-run the shingling, then key EACH
    // broadcast on the size of the frame it actually ships —
    //   bands join:    payload = batch BAND rows        → gate on docs
    //   profiles join: payload = candidate PAIRS × full shingle sets
    //                  → gate on PAIR count (a small batch against a
    //                    high-duplication corpus can fan out to millions
    //                    of pairs; doc count alone would still OOM the
    //                    driver — the round-10 review catch)
    val batchSh = batchShingles.localCheckpoint(true)
    queryPrepared(s, root,
      MinHashLSH.bands(MinHashLSH.signatures(batchSh, k), b, r),
      profiles(batchSh), threshold, docBroadcastLimit, pairBroadcastLimit)
  }

  /** The stored band rows across every COMMITTED ingest — `_SUCCESS`
    * in BOTH table dirs (the [[committedIngests]] intersection: bands
    * are written before profiles, so a crash between the two leaves
    * committed bands whose candidates would verify against NO profile
    * row and silently drop real pairs until the replay). Restricting
    * here is a static partition filter (pruned at listing, no data
    * read) — the FrameIndex.stored discipline; before it, a crashed
    * append's partial band/profile rows answered queries wrongly until
    * redelivery. Static schema: footer inference is a Spark job the
    * streaming ingest would pay per micro-batch. */
  private[graft] def storedBands(s: SparkSession, root: String): DataFrame = {
    val inSet = committedIngests(s, root).map(java.lang.Long.valueOf)
    s.read.schema("doc_id BIGINT, band_idx INT, band_hash BIGINT, ingest BIGINT")
      .parquet(bandsDir(root))
      .filter(col("ingest").isin(inSet: _*))
      .select("doc_id", "band_idx", "band_hash")
  }

  /** The stored profile rows across every committed ingest — see
    * [[storedBands]]. */
  private[graft] def storedProfiles(s: SparkSession, root: String)
      : DataFrame = {
    val inSet = committedIngests(s, root).map(java.lang.Long.valueOf)
    s.read.schema(
        "doc_id BIGINT, ss ARRAY<BIGINT>, n_sh BIGINT, ingest BIGINT")
      .parquet(profilesDir(root))
      .filter(col("ingest").isin(inSet: _*))
      .select("doc_id", "ss", "n_sh")
  }

  /** [[queryBatch]] from PRECOMPUTED (bands, profiles) frames — pass
    * checkpointed frames (the ingest path shares one band/profile pass
    * across three consumers; an unmaterialized plan here would re-run
    * the signature aggregation for the two size-fact counts). */
  private[graft] def queryPrepared(s: SparkSession, root: String,
                                   batchBandsRaw: DataFrame,
                                   batchProfiles: DataFrame,
                                   threshold: Double = 0.8,
                                   docBroadcastLimit: Long = 20000L,
                                   pairBroadcastLimit: Long = 100000L)
      : DataFrame = {
    // profiles are one row per (shingled) doc, so this IS the doc count
    val nBatch = batchProfiles.count()
    def docSized(df: DataFrame): DataFrame =
      if (nBatch <= docBroadcastLimit) broadcast(df) else df
    val batchBands = batchBandsRaw.withColumnRenamed("doc_id", "batch_doc")
    // candidate generation: batch bands broadcast (increment) or
    // shuffled (backfill), stored bands stream either way
    val cands = storedBands(s, root)
      .join(docSized(batchBands), Seq("band_idx", "band_hash"))
      .select(col("batch_doc"), col("doc_id").as("corpus_doc"))
      .distinct()
      .localCheckpoint(true) // two-long rows; reused by count + join
    val nPairs = cands.count()
    def pairSized(df: DataFrame): DataFrame =
      if (nPairs <= pairBroadcastLimit) broadcast(df) else df
    // exact verify: candidates (pair-bounded) against the stored
    // profiles; batch profiles computed in flight
    val verified = cands
      .join(batchProfiles
              .select(col("doc_id").as("batch_doc"), col("ss").as("sa"),
                      col("n_sh").as("n_a")), Seq("batch_doc"))
    storedProfiles(s, root)
      .select(col("doc_id").as("corpus_doc"), col("ss").as("sb"),
              col("n_sh").as("n_b"))
      .join(pairSized(verified), Seq("corpus_doc"))
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard_raw",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("batch_doc"), col("corpus_doc"),
              round(col("jaccard_raw"), 6).as("jaccard"))
  }

  /** The ENTIRE per-batch pair pass of the screen-then-admit loop —
    * within-batch near-dup pairs AND the batch×stored index query — as
    * ONE candidate pass (the PHash.ingestScreenFused discipline on the
    * dedup index): the batch's band rows probe a single unioned
    * candidate side (stored bands with the batch's own redelivered ids
    * excluded ∪ the batch bands themselves), one distinct + one
    * pair-count gate cover both populations, and ONE verify join runs
    * the exact-Jaccard screen with the stored profiles scanned once
    * and never shuffled (the batch-side p_a profile always comes from
    * the broadcast batch frame; the p_b profile from stored ∪ batch —
    * disjoint id sets once redeliveries are excluded, so each pair
    * verifies against exactly one profile row per side). Output is
    * row-identical to
    * `jaccardPairs(within) ∪ (queryPrepared minus redelivered)` in the
    * canonical (least, greatest) orientation — pinned against the
    * unfused pair in DedupIndexSpec, both gate branches. The unfused
    * form paid the candidate machinery twice (self-join + distinct for
    * within, band join + distinct + gates for cross) and re-aggregated
    * the batch shingle sets for the within verify; at micro-batch
    * grain those duplicated exchanges are wall, not work
    * (ProbeDedupIngest). */
  private[graft] def ingestQueryFused(s: SparkSession, root: String,
                                      bd: DataFrame, pf: DataFrame,
                                      excludeIds: DataFrame,
                                      threshold: Double = 0.8,
                                      docBroadcastLimit: Long = 20000L,
                                      pairBroadcastLimit: Long = 100000L)
      : DataFrame = {
    val nBatch = pf.count()
    def docSized(df: DataFrame): DataFrame =
      if (nBatch <= docBroadcastLimit) broadcast(df) else df
    val batchBands = bd.withColumnRenamed("doc_id", "batch_doc")
    val candS = storedBands(s, root)
      .join(docSized(excludeIds.select(col("doc_id"))), Seq("doc_id"),
        "left_anti") // replay guard: a re-delivered batch is already
                     // IN the index and must not match itself
      .select(col("doc_id").as("other_doc"), col("band_idx"),
        col("band_hash"), lit(true).as("is_stored"))
    val candB = bd.select(col("doc_id").as("other_doc"), col("band_idx"),
      col("band_hash"), lit(false).as("is_stored"))
    val cands = candS.unionByName(candB)
      .join(docSized(batchBands), Seq("band_idx", "band_hash"))
      // within pairs canonicalize here (batch < other keeps each
      // unordered batch pair exactly once — candidatePairsFromBands'
      // doc_a < doc_b); cross pairs keep every (batch, stored) hit
      .filter(col("is_stored") || col("batch_doc") < col("other_doc"))
      .select(col("batch_doc").as("p_a"), col("other_doc").as("p_b"))
      .distinct()
      .localCheckpoint(true) // two-long rows; reused by count + join
    val nPairs = cands.count()
    def pairSized(df: DataFrame): DataFrame =
      if (nPairs <= pairBroadcastLimit) broadcast(df) else df
    // p_a is ALWAYS a batch doc; p_b is batch (within) or stored
    // (cross) — the profile union serves both sides with the stored
    // table scanned once (its redelivered rows excluded so a batch
    // doc's profile resolves uniquely to the batch frame)
    val withA = cands.join(
      pf.select(col("doc_id").as("p_a"), col("ss").as("sa"),
        col("n_sh").as("n_a")), Seq("p_a"))
    storedProfiles(s, root)
      .join(docSized(excludeIds.select(col("doc_id"))), Seq("doc_id"),
        "left_anti")
      .unionByName(pf)
      .select(col("doc_id").as("p_b"), col("ss").as("sb"),
              col("n_sh").as("n_b"))
      .join(pairSized(withA), Seq("p_b"))
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard_raw",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard_raw") >= threshold)
      .select(least(col("p_a"), col("p_b")).as("doc_a"),
              greatest(col("p_a"), col("p_b")).as("doc_b"),
              round(col("jaccard_raw"), 6).as("jaccard"))
  }

  /** Fold every committed ingest partition into a single ingest-0
    * partition set — the index-maintenance step a continuously-ingesting
    * dedup deployment runs periodically: each streamed append leaves one
    * small band file + one profile file, every queryBatch re-scans the
    * whole artifact, and Spark pays a per-FILE open cost, so probe cost
    * degrades with file COUNT even though the row volume is unchanged
    * (measured on the stream bench — see writePrepared's Scaladoc).
    * Band and profile ROWS are preserved exactly, so every query
    * answers identically before and after (pinned in DedupIndexSpec) —
    * only the physical layout changes, and the rewrite lands in the
    * backfill layout (band_idx-partitioned, probe-key-sorted).
    *
    * Staged write + two-rename swap (util.AtomicSwap — the shared
    * compaction discipline): the fold lands completely under
    * `root.compact` with the high-water mark written LAST (marker =
    * fold finished), then root steps aside and staging is promoted. A
    * crash at any point is healed by the recover call inside exists():
    * either the old root rolls back or the completed fold is promoted —
    * never a missing artifact, never a half-compacted index that
    * answers wrongly. The high-water mark travels with the artifact:
    * writePrepared refuses any ingest id a future re-delivery might
    * duplicate. */
  def compact(s: SparkSession, root: String): Unit = {
    require(exists(s, root), s"no dedup index under $root")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(s, root)
    val stagingPath = graft.util.AtomicSwap.stagingPath(rootPath)
    val staging = stagingPath.toString
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    val committed = committedIngests(s, root)
    val inSet = committed.map(java.lang.Long.valueOf)
    writePrepared(
      s.read.parquet(bandsDir(root))
        .filter(col("ingest").cast("long").isin(inSet: _*))
        .select("doc_id", "band_idx", "band_hash"),
      s.read.parquet(profilesDir(root))
        .filter(col("ingest").cast("long").isin(inSet: _*))
        .select("doc_id", "ss", "n_sh"),
      staging, 0L)
    val hwm = math.max(committed.max, compactedThrough(s, root))
    val out = fs.create(hwmPath(staging), true)
    try out.write(hwm.toString.getBytes("UTF-8")) finally out.close()
    graft.util.AtomicSwap.promote(fs, rootPath)
  }
}
