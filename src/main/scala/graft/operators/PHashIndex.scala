package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash (dHash) dedup index AT REST — the fifth stored index
  * (DedupIndex, InvertedIndex, AnnIndex, FrameIndex are the siblings),
  * closing the IMAGE-modality serving gap: q_dedup_phash demonstrates
  * the banded-hamming math end-to-end but re-hashes the whole corpus
  * inside every execution (~17 s at the 100× replica tier — the last
  * 100×-heavy dedup key with no at-rest twin). A real image platform
  * hashes each upload ONCE, stores the 8-byte signature, and screens
  * every new batch against the stored signatures — then admits it.
  *
  * Storage: ONE table (`sigs/`) of (doc_id, phash, band_idx, band_val)
  * rows — the 63-bit dHash split into `b` contiguous 16-bit bands (the
  * [[SimHash.bands]] layout: the full signature rides on every band row,
  * 8 bytes, so the verify step needs NO second artifact — contrast
  * DedupIndex's bands+profiles pair). Hive-partitioned by `ingest`
  * (0 = backfill, 1… = streamed admissions), each partition sorted on
  * (band_idx, band_val) so bucket probes skip row groups via parquet
  * min/max stats. One table ⇒ appends commit atomically under the
  * Hadoop job-commit protocol (no torn two-table window).
  *
  * Query scale shape: the batch is hashed in flight (one codegen'd
  * map-side pass — [[PHash.signatures]]), its band rows BROADCAST for
  * increment-sized batches, so candidate generation is one streaming
  * scan of the stored band table with zero corpus shuffle; the hamming
  * verify reads the signature already on the candidate row. Recall is
  * EXACT by pigeonhole (maxHamming < b), so the keys are SQL-oracled —
  * strictly stronger than the ANN family's test oracles. 4 rows × ~32
  * bytes per image; a 10¹⁰-image corpus is a ~1.3 TB artifact, scanned
  * per batch but never shuffled, and compaction bounds its file count.
  */
object PHashIndex {

  private def sigsDir(root: String) = s"$root/sigs"
  private def hwmPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/compacted_through")

  private def fsOf(s: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Highest ingest id folded by a [[compact]] (−1 if never compacted):
    * appends at or below it are refused (the shared high-water-mark
    * rule — a re-delivered folded batch would store every signature
    * row twice and double-report its pairs). */
  def compactedThrough(s: SparkSession, root: String): Long = {
    val fs = fsOf(s, root)
    if (!fs.exists(hwmPath(root))) -1L
    else {
      val in = fs.open(hwmPath(root))
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** Ingest ids whose partition carries its `_SUCCESS` commit marker —
    * a crashed append's partial directory is invisible to screens and
    * to compaction until its replay overwrites it (the FrameIndex
    * convention). */
  private def committedIngests(s: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(s, root)
    val p = new org.apache.hadoop.fs.Path(sigsDir(root))
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("ingest="))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("ingest=").toLong).sorted
  }

  /** True iff an index exists under `root`. Side effect by design:
    * first heals any compaction swap a crash tore mid-rename
    * (util.AtomicSwap.recover). */
  def exists(s: SparkSession, root: String): Boolean = {
    val fs = fsOf(s, root)
    graft.util.AtomicSwap.recover(
      fs, new org.apache.hadoop.fs.Path(root), "compacted_through")
    fs.exists(new org.apache.hadoop.fs.Path(
      s"${sigsDir(root)}/ingest=0/_SUCCESS"))
  }

  /** The banded signature rows of a document frame: (doc_id, phash,
    * band_idx, band_val) — one map-side hash pass + a `b`-way explode,
    * no shuffle. */
  private[graft] def sigRows(docs: DataFrame, b: Int = 4): DataFrame =
    SimHash.bands(
        PHash.signatures(docs)
          .select(col("doc_id"), col("phash").as("simhash")), b)
      .select(col("doc_id"), col("simhash").as("phash"),
              col("band_idx"), col("band_val"))

  /** Hash the initial corpus (the backfill) and persist it as ingest
    * partition 0, wiping any previous artifact under `root` first (the
    * DedupIndex.build discipline: a rebuild that dies mid-way must
    * read as exists()==false, never as new-models-over-stale-rows). */
  def build(docs: DataFrame, root: String, b: Int = 4): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(
      docs.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    writePrepared(sigRows(docs, b), root, 0L)
  }

  /** Incrementally admit an accepted batch as ingest partition
    * `ingestId` (> 0, unique per batch). The corpus is never re-hashed;
    * a re-delivered batch overwrites only its own partition (replay
    * exactly-once). */
  def append(docs: DataFrame, root: String, ingestId: Long,
             b: Int = 4): Unit = {
    require(ingestId > 0,
      s"ingestId must be > 0 (0 is the backfill): $ingestId")
    writePrepared(sigRows(docs, b), root, ingestId)
  }

  /** Write one ingest's banded rows. File-count discipline (the
    * measured small-file trap — DedupIndex.writePrepared's Scaladoc):
    * the backfill keeps the band_idx repartition for parallel scan
    * bandwidth; increments (batch-sized by the query→append contract)
    * write ONE file, globally sorted on the probe key so row-group
    * pruning still applies. */
  private[graft] def writePrepared(rows: DataFrame, root: String,
                                   ingestId: Long): Unit = {
    if (ingestId > 0L) {
      val hwm = compactedThrough(rows.sparkSession, root)
      require(ingestId > hwm,
        s"ingest $ingestId was already folded by a compaction (high-water " +
          s"mark $hwm) — re-appending it would duplicate every signature")
    }
    val laidOut =
      if (ingestId == 0L) rows.repartition(col("band_idx"))
      else rows.coalesce(1)
    laidOut.sortWithinPartitions("band_idx", "band_val")
      .write.mode("overwrite").parquet(s"${sigsDir(root)}/ingest=$ingestId")
  }

  /** The stored banded rows across every COMMITTED ingest. Static
    * schema: inference is a footer-reading job the streaming screen
    * would pay every micro-batch. */
  def stored(s: SparkSession, root: String): DataFrame = {
    val inSet = committedIngests(s, root).map(java.lang.Long.valueOf)
    s.read
      .schema("doc_id BIGINT, phash BIGINT, band_idx INT, " +
        "band_val BIGINT, ingest BIGINT")
      .parquet(sigsDir(root))
      .filter(col("ingest").isin(inSet: _*))
      .select("doc_id", "phash", "band_idx", "band_val")
  }

  /** Near-duplicate pairs (batch_doc, corpus_doc, hamming ≤ maxHamming)
    * between an incoming batch and the STORED index. The corpus images
    * are never read — only their 8-byte signatures at rest. Recall is
    * exact (pigeonhole: maxHamming < b); the adaptive broadcast gate is
    * the DedupIndex.queryBatch discipline — an increment ships
    * map-side, a corpus-scale backfill wave crosses the gate and AQE
    * plans the band-keyed exchange. */
  def queryBatch(s: SparkSession, root: String, batchDocs: DataFrame,
                 maxHamming: Int = 3, b: Int = 4,
                 docBroadcastLimit: Long = 20000L): DataFrame = {
    require(maxHamming < b,
      s"pigeonhole needs maxHamming($maxHamming) < bands($b) for recall 1")
    val rows = sigRows(batchDocs, b).localCheckpoint(true)
    queryPrepared(s, root, rows, maxHamming,
      rows.count() <= docBroadcastLimit * b)
  }

  /** [[queryBatch]] from PRECOMPUTED (checkpointed) banded rows — the
    * ingest path computes them once per batch and shares them across
    * the within-batch pairing, this query, and the append. */
  private[graft] def queryPrepared(s: SparkSession, root: String,
                                   batchRows: DataFrame, maxHamming: Int,
                                   broadcastBatch: Boolean): DataFrame = {
    val gate: DataFrame => DataFrame =
      if (broadcastBatch) broadcast else identity
    val bb = batchRows.select(col("doc_id").as("batch_doc"),
      col("phash").as("phash_b"), col("band_idx"), col("band_val"))
    stored(s, root)
      .join(gate(bb), Seq("band_idx", "band_val"))
      .withColumn("hamming",
        bit_count(col("phash").bitwiseXOR(col("phash_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      // a pair at hamming h < b − 1 agrees on several bands and matches
      // once per agreeing band — distinct AFTER the verify so the
      // distinct's input is already threshold-bounded
      .select(col("batch_doc"), col("doc_id").as("corpus_doc"),
        col("hamming"))
      .distinct()
  }

  /** Fold every committed ingest partition into the single backfill
    * partition — the maintenance step bounding the per-probe file
    * count. Rows are preserved exactly, so every query answers
    * identically before and after; staged write + two-rename swap
    * (util.AtomicSwap) with the high-water mark written LAST, healed
    * on first touch by [[exists]] after any crash. */
  def compact(s: SparkSession, root: String): Unit = {
    require(exists(s, root), s"no phash index under $root")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(s, root)
    val stagingPath = graft.util.AtomicSwap.stagingPath(rootPath)
    val staging = stagingPath.toString
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    val committed = committedIngests(s, root)
    writePrepared(stored(s, root), staging, 0L)
    val hwm = math.max(committed.max, compactedThrough(s, root))
    val out = fs.create(hwmPath(staging), true)
    try out.write(hwm.toString.getBytes("UTF-8")) finally out.close()
    graft.util.AtomicSwap.promote(fs, rootPath)
  }
}
