package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 inverted index AT REST — the lexical-retrieval sibling of
  * [[AnnIndex]], and the second leg of hybrid (lexical + semantic)
  * retrieval over a training/RAG corpus.
  *
  * q_text_bm25 demonstrates the BM25 *math* as a map-only full scan; no
  * 100-TB corpus serves queries that way. The deployment shape is the
  * classic search-engine artifact — build-once / append-batches /
  * answer-every-query-from-storage:
  *
  *   root/stats/    — (n_docs, total_tokens)       PARTITIONED BY (batch)
  *   root/postings/ — (term, doc_id, tf, dl)       PARTITIONED BY (tb, batch)
  *   root/dfs/      — (term, df)                   PARTITIONED BY (tb, batch)
  *
  * `dfs` is the DICTIONARY side table (vocabulary-sized): per-term
  * document frequency per batch, so the probe's idf comes from a
  * dictionary lookup instead of a count over every pruned postings row
  * — see [[dfsOf]] for the write-order crash contract and the exactness
  * argument.
  *
  * `tb = pmod(xxhash64(term), 32)` is a hash term-bucket: a query's
  * terms map to a handful of buckets, and the probe's `tb IN (…)`
  * literal filter becomes STATIC PARTITION PRUNING — only those
  * buckets' files are ever listed or read, however many terms the
  * corpus holds. The per-doc token length `dl` is DENORMALIZED into
  * every posting (the Lucene norms discipline): query-time scoring
  * needs no join against a corpus-sized doc-length table — everything
  * after the pruned scan is arithmetic plus one broadcast of per-term
  * idf rows.
  *
  * Scoring is quantized-BM25 (k1 = 1.2, b = 0.75, Robertson idf):
  * each (doc, term) contribution is rounded to 1e-6 and summed as an
  * exact INT64 — integer addition commutes, so the per-doc score is
  * bit-identical whatever the partitioning or merge order, and a
  * DuckDB full-scan recompute hash-matches the stored-index answer
  * (the q_text_index_query oracle).
  *
  * Batch stats rows sum at query time (n_docs, total_tokens are
  * associative), so appends never rewrite history; `batch=` partitions
  * plus dynamic partition overwrite give exactly-once replay — the
  * s_text_index_ingest contract, same as AnnIndex.append.
  */
object InvertedIndex {

  val NumBuckets = 32
  val K1 = 1.2
  val B  = 0.75

  private def statsDir(root: String)    = s"$root/stats"
  private def postingsDir(root: String) = s"$root/postings"
  private def dfsDir(root: String)      = s"$root/dfs"
  private def hwmPath(root: String) =
    new org.apache.hadoop.fs.Path(s"$root/compacted_through")

  private def fsOf(s: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Committed `batch=` ids under a table dir (postings nest under
    * `tb=`; a glob over both layouts covers either table). */
  private def batchIds(s: SparkSession, dir: String): Set[Long] = {
    val fs = fsOf(s, dir)
    Seq(s"$dir/batch=*", s"$dir/tb=*/batch=*").flatMap { g =>
      fs.globStatus(new org.apache.hadoop.fs.Path(g)) match {
        case null => Nil
        case st => st.toSeq.map(_.getPath.getName.stripPrefix("batch=").toLong)
      }
    }.toSet
  }

  /** The batch ids BOTH tables have committed. A crash between append()'s
    * two writes leaves a torn batch present on one side only — reading
    * the intersection makes that batch invisible (the index answers as
    * if the append never ran) instead of silently skewing df/avgdl with
    * stats rows whose postings are missing. Replaying the batch repairs
    * it in place. */
  private def committedBatches(s: SparkSession, root: String): Set[Long] =
    batchIds(s, statsDir(root)) intersect batchIds(s, postingsDir(root))

  /** Highest batch id folded into batch 0 by [[compact]] (−1 before any
    * compaction). append() refuses ids at or below it: a foreachBatch
    * re-delivery of an ALREADY-FOLDED batch would otherwise re-create
    * its partitions next to the compacted copies and double-count every
    * posting — better a hard error than silent duplication. (Operate
    * compaction only past the stream's committed checkpoint and the
    * error can never fire.) */
  def compactedThrough(s: SparkSession, root: String): Long = {
    val fs = fsOf(s, root)
    if (!fs.exists(hwmPath(root))) -1L
    else {
      val in = fs.open(hwmPath(root))
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  /** True iff a complete index exists under `root` (postings are written
    * last, so their _SUCCESS marker implies the whole artifact). Side
    * effect by design: first repairs any compaction swap a crash tore
    * mid-rename (util.AtomicSwap.recover), so a torn swap heals on
    * first touch instead of reading as "no index" and baiting callers
    * into a wipe-and-rebuild over the orphaned fold. */
  def exists(s: SparkSession, root: String): Boolean = {
    val fs = fsOf(s, root)
    graft.util.AtomicSwap.recover(
      fs, new org.apache.hadoop.fs.Path(root), "compacted_through")
    fs.exists(new org.apache.hadoop.fs.Path(s"${postingsDir(root)}/_SUCCESS"))
  }

  /** Tokens of `text` — split on single spaces, empties dropped. ONE
    * definition shared by the index build and the full-scan twin so
    * `tf`/`dl` can never disagree between the two paths. */
  def tokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(text, " "), t => length(t) > 0)

  /** Postings rows for a document frame — (term, doc_id, tf, dl, tb).
    * One explode + one (doc, term) count: the only corpus-sized shuffle
    * in the whole build. */
  private def postingsOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
    toks.groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(NumBuckets.toLong)))
  }

  /** Batch stats. NOTE: tokenizes the batch a second time (postingsOf
    * is the first) — deliberately NOT derived from the postings rows,
    * whose (doc, term) grain drops zero-token documents from n_docs.
    * Builds/appends pay two scans of their own batch; queries pay none.
    * `nb` pins the bucketing constant INTO the artifact so a probe
    * compiled with a different NumBuckets fails loudly instead of
    * pruning to the wrong partitions. */
  private def statsOf(docs: DataFrame): DataFrame =
    docs.select(size(tokens(col("text"))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
      .withColumn("nb", lit(NumBuckets.toLong))

  /** Per-term document frequencies of ONE batch set's postings — the
    * DICTIONARY side table of a classic inverted index: (term, tb, df),
    * vocabulary-sized. Stored beside the postings so the probe's idf
    * table is a dictionary lookup instead of a count over every pruned
    * postings row (the probe's only corpus-DENSITY-dependent aggregation:
    * at the 100× replica tier the four bench terms match 1.19M postings
    * rows, and re-counting them per query was the measured residual the
    * file-listing theory failed to explain — the scans themselves
    * min-of-5 at 0.15 s). Exactness: (term, doc_id) is unique across
    * batches by the append contract, so df(term) = Σ over batches of the
    * per-batch df. WHO writes it: build (batch 0) and compact (the fold)
    * — NOT append: a per-micro-batch dictionary write costs two extra
    * jobs per batch and measured s_text_index_ingest at 2.8× slower, so
    * streamed batches stay dictionary-less until a compaction folds
    * them, and [[dfTable]] HYBRIDIZES — dictionary for the covered
    * bulk + a recount over only the uncovered ingest TAIL (tail batches
    * are micro-batch-sized by construction; the corpus-dense bulk is
    * exactly what build/compact covered). */
  private def dfsOf(postings: DataFrame): DataFrame =
    postings.groupBy("term", "tb").agg(count(lit(1)).as("df"))

  /** True iff the dictionary table finished its JOB commit — the
    * explicit marker [[writeDfs]] creates only after its write
    * returns. Presence of the per-(tb, batch) directories alone is
    * NOT enough: the writer creates/renames them per partition before
    * job commit, so a crash mid-write leaves a PARTIAL set that would
    * pass a directory-presence check — terms in the missing buckets
    * would get undercounted df or drop out of the idf inner join
    * entirely, silently corrupting BM25 scores. (It must be OUR
    * marker: the dynamic-partition-overwrite protocol never emits the
    * usual `_SUCCESS` — verified on disk, a gate on it would silently
    * disable the dictionary forever.) Only build/compact write dfs
    * (each into a fresh dir), so one marker covers the artifact; a
    * torn write reads as "no dictionary" and both [[dfTable]] and
    * [[compact]] fall back to recounting from the postings — the
    * recount the scaladoc promises. */
  private def dfsCommitted(s: SparkSession, root: String): Boolean =
    fsOf(s, root).exists(dfsMarker(root))

  private def dfsMarker(root: String) =
    new org.apache.hadoop.fs.Path(s"${dfsDir(root)}/_GRAFT_COMMIT")

  /** Hybrid df table for the probe: Some((term, df)) = dictionary rows
    * over the covered batches + a pruned-postings recount over the
    * uncovered (post-compaction ingest tail) batches; None — full
    * recount — for pre-dictionary artifacts. */
  private def dfTable(s: SparkSession, root: String, terms: Seq[String],
      buckets: Seq[Long], committed: Seq[java.lang.Long])
      : Option[DataFrame] = {
    if (!dfsCommitted(s, root)) None
    else {
      val committedSet = committed.map(_.longValue).toSet
      val covered = batchIds(s, dfsDir(root)) intersect committedSet
      if (covered.isEmpty) None
      else {
        val coveredIds = covered.toSeq.sorted.map(java.lang.Long.valueOf)
        val dict = s.read.parquet(dfsDir(root))
          .filter(col("batch").isin(coveredIds: _*))
          .filter(col("tb").isin(buckets: _*))
          .filter(col("term").isin(terms: _*))
          .select("term", "df")
        val tail = (committedSet -- covered).toSeq.sorted
          .map(java.lang.Long.valueOf)
        val withTail =
          if (tail.isEmpty) dict
          else dict.unionByName(
            s.read.parquet(postingsDir(root))
              .filter(col("batch").isin(tail: _*))
              .filter(col("tb").isin(buckets: _*))
              .filter(col("term").isin(terms: _*))
              .groupBy("term").agg(count(lit(1)).as("df")))
        Some(withTail.groupBy("term").agg(sum("df").as("df")))
      }
    }
  }

  /** The compact physical layout every postings write emits: repartition
    * ON the bucket id so each tb lands wholly in one task — exactly ONE
    * file per (tb, batch) instead of up-to-shuffle.partitions files (the
    * groupBy shuffle otherwise scatters a bucket's rows over every
    * reducer, and probe cost at the 100x tier proved file-LISTING bound
    * even under perfect partition pruning) — and sort within partitions
    * on (tb, term) so row-group min/max stats prune the probe's
    * In(term, ...) pushdown inside the file too. One extra exchange at
    * write time (postings-sized, build/append/compact only); queries pay
    * nothing, ever. */
  private def compactLayout(postings: DataFrame): DataFrame =
    postings.repartition(NumBuckets, col("tb"))
      .sortWithinPartitions("tb", "term", "doc_id")

  /** The dictionary write shared by build/append/compact: df rows laid
    * out like the postings (one file per (tb, batch), term-sorted). */
  private def writeDfs(dfs: DataFrame, root: String, batchId: Long): Unit = {
    dfs.repartition(NumBuckets, col("tb"))
      .sortWithinPartitions("tb", "term")
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tb", "batch").parquet(dfsDir(root))
    // commit marker LAST (see dfsCommitted — dynamic overwrite emits
    // no _SUCCESS of its own)
    val s = dfs.sparkSession
    fsOf(s, root).create(dfsMarker(root), true).close()
  }

  /** Build and persist the backfill index (batch 0). Wipes any previous
    * artifact first — stats land before postings, so a rebuild dying
    * mid-way reads as exists()==false (the AnnIndex.build discipline).
    * Emits the compacted one-file-per-bucket layout directly (see
    * [[compactLayout]]) — a fresh backfill should never need a compaction
    * pass to reach its own steady-state file count. The dictionary (dfs)
    * is derived by reading the WRITTEN postings back — vocabulary-sized
    * agg over an already-tokenized artifact, not a third corpus pass —
    * and lands after them: a crash in that window leaves a complete,
    * correct index whose probes fall back to counting df (dfTable's
    * coverage check), never a wrong one. */
  def build(docs: DataFrame, root: String): Unit = {
    val s = docs.sparkSession
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(rootPath)) fs.delete(rootPath, true)
    statsOf(docs).withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("batch").parquet(statsDir(root))
    compactLayout(postingsOf(docs)).withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("tb", "batch")
      .parquet(postingsDir(root))
    writeDfs(dfsOf(s.read.parquet(postingsDir(root))), root, 0L)
  }

  /** Append a NEW batch of documents under its own `batch=` partitions
    * with dynamic partition overwrite — replaying a batch id rewrites
    * only itself (exactly-once under any re-delivery). Contract: doc_ids
    * must be new to the index; re-delivery of a whole batch under its
    * original batchId is the supported replay path. Per-batch cost is
    * O(batch) — the stored corpus partitions are untouched, and the
    * batch's stats row sums in at query time instead of rewriting the
    * global counters. */
  def append(docs: DataFrame, root: String, batchId: Long): Unit = {
    val s = docs.sparkSession
    require(exists(s, root),
      s"no inverted index under $root — build the backfill first")
    require(batchId > 0L, "batch 0 is the backfill partition")
    val hwm = compactedThrough(s, root)
    require(batchId > hwm,
      s"batch $batchId was already folded by a compaction (high-water " +
        s"mark $hwm) — re-appending it would double-count every posting")
    // POSTINGS FIRST, stats LAST. committedBatches() gates on directory
    // presence on BOTH sides, and the postings write is a multi-partition
    // job whose tb=*/batch=N dirs materialize non-atomically — were stats
    // written first, a crash mid-postings would leave the batch "committed"
    // with full n_docs/avgdl but partial postings (silently wrong scores).
    // Stats is a single-row, single-partition write (near-atomic commit),
    // so writing it last shrinks the torn window to nothing observable:
    // partial postings with no stats row stay invisible until replayed.
    compactLayout(postingsOf(docs)).withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tb", "batch").parquet(postingsDir(root))
    statsOf(docs).withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(statsDir(root))
  }

  /** Compact all ingest batches into a single batch-0 partition set —
    * the index-maintenance step a continuously-ingesting deployment
    * runs periodically: streaming appends leave one small file set per
    * (bucket, batch), and probe cost degrades with file COUNT even when
    * pruning is perfect. Compaction preserves the postings ROWS exactly
    * and sums the stats rows, so every query answers identically before
    * and after (pinned in RetrievalSpec) — only the physical layout
    * changes. Staged write + two-rename swap (util.AtomicSwap): the fold
    * lands completely under root.compact with the high-water mark
    * written LAST, then root steps aside and staging is promoted; a
    * crash at any point is healed by the recover call inside exists() —
    * never a missing artifact, never a half-compacted index that
    * answers wrongly (an object-store deployment would swap a manifest
    * instead of renaming). */
  def compact(s: SparkSession, root: String): Unit = {
    require(exists(s, root), s"no inverted index under $root")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = fsOf(s, root)
    val stagingPath = graft.util.AtomicSwap.stagingPath(rootPath)
    val staging = stagingPath.toString
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    // fold only batches COMMITTED on both sides — a torn append's
    // orphan partition would otherwise be baked into batch 0
    val committed = committedBatches(s, root).toSeq.sorted
    val batchSet = committed.map(java.lang.Long.valueOf)
    s.read.parquet(statsDir(root))
      .filter(col("batch").isin(batchSet: _*))
      .agg(sum("n_docs").as("n_docs"),
        sum("total_tokens").as("total_tokens"))
      .withColumn("nb", lit(NumBuckets.toLong))
      .withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("batch")
      .parquet(statsDir(staging))
    compactLayout(s.read.parquet(postingsDir(root))
        .filter(col("batch").isin(batchSet: _*))
        .select("term", "doc_id", "tf", "dl", "tb"))
      .withColumn("batch", lit(0L))
      .write.mode("overwrite").partitionBy("tb", "batch")
      .parquet(postingsDir(staging))
    // dictionary fold: sum per-batch dfs when the artifact carries them
    // for every folded batch, else recount from the folded postings —
    // either way the compacted artifact is dictionary-carrying (a
    // compaction UPGRADES a pre-dfs index)
    val foldedDfs = {
      val fromDict =
        if (!dfsCommitted(s, root)) None
        else if (!committed.toSet.subsetOf(batchIds(s, dfsDir(root)))) None
        else Some(s.read.parquet(dfsDir(root))
          .filter(col("batch").isin(batchSet: _*))
          .groupBy("term", "tb").agg(sum("df").as("df")))
      fromDict.getOrElse(
        dfsOf(s.read.parquet(postingsDir(root))
          .filter(col("batch").isin(batchSet: _*))))
    }
    writeDfs(foldedDfs, staging, 0L)
    // high-water mark travels with the artifact: append() refuses any
    // batch id a future re-delivery might duplicate
    val hwm = math.max(committed.max, compactedThrough(s, root))
    val out = fs.create(new org.apache.hadoop.fs.Path(
      s"$staging/compacted_through"), true)
    try out.write(hwm.toString.getBytes("UTF-8")) finally out.close()
    graft.util.AtomicSwap.promote(fs, rootPath)
  }

  /** Quantized-BM25 contribution of one (doc, term) posting as an exact
    * INT64 millionth: round(idf · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) · 1e6).
    * `idf`/`avgdl` are column expressions so the same formula serves the
    * stored-index path (joined stats) and the full-scan twin (literal
    * stats from one agg row). */
  def contribMicros(tf: org.apache.spark.sql.Column,
                    dl: org.apache.spark.sql.Column,
                    idf: org.apache.spark.sql.Column,
                    avgdl: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val sat = (tf * (K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0) - B + lit(B) * dl / avgdl))
    round(idf * sat * 1e6).cast("long")
  }

  /** Robertson idf = ln(1 + (N − df + ½)/(df + ½)) — positive for every
    * df ≤ N, so quantized contributions never cancel. */
  def idf(df: org.apache.spark.sql.Column,
          nDocs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    log(lit(1.0) + (nDocs.cast("double") - df + 0.5) / (df + 0.5))

  /** Top-`k` BM25 matches for `terms`, answered ONLY from the stored
    * artifacts — the corpus is never scanned. Returns
    * (doc_id, score) with score = Σ contributions / 1e6 rounded to 6 dp,
    * ties broken by doc_id.
    *
    * The probe: the query terms' hash buckets are computed with the SAME
    * xxhash64 expression the writer used (on a terms-sized local frame —
    * a model-sized driver collect, not a data pull), then the postings
    * scan filters `tb IN (…)` (static partition pruning at file-listing
    * level) and `term IN (…)` (row-group pushdown inside the pruned
    * buckets). Per-term df is counted from the pruned postings
    * themselves — exact because (term, doc) is unique across batches by
    * the append contract — and broadcasts back as a terms-sized idf
    * table. One shuffle on doc_id for the score sum; every other input
    * is model-sized. Repeated query terms are DISTINCT'd (each distinct
    * term scores once — the same semantics as the full-scan twin's
    * fixed-term columns); both tables read only the batch ids committed
    * on BOTH sides (torn appends invisible until replayed), and the
    * stored `nb` must match this build's NumBuckets or the probe fails
    * loudly instead of pruning to the wrong partitions. */
  def query(s: SparkSession, root: String, terms0: Seq[String], k: Int = 20)
      : DataFrame = {
    val (pruned, idfTab) = probe(s, root, terms0.distinct)
    pruned.join(broadcast(idfTab), Seq("term"))
      .select(col("doc_id"),
        contribMicros(col("tf"), col("dl"), col("idf"), col("avgdl"))
          .as("cq"))
      .groupBy("doc_id")
      .agg(round(sum("cq").cast("double") / 1e6, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** The shared probe preamble of [[query]] and [[queryMulti]]: validate
    * the artifact, prune the postings to the query terms' buckets and
    * committed batches, and derive the terms-sized idf/avgdl table. */
  private def probe(s: SparkSession, root: String, terms: Seq[String])
      : (DataFrame, DataFrame) = {
    require(exists(s, root), s"no inverted index under $root")
    import s.implicits._
    val committed = committedBatches(s, root).toSeq.sorted
      .map(java.lang.Long.valueOf)
    val qterms = terms.toDF("term")
      .withColumn("tb", pmod(xxhash64(col("term")), lit(NumBuckets.toLong)))
    val buckets = graft.util.Local.model(qterms.select("tb"))
      .collect().map(_.getLong(0)).distinct.toSeq
    val statsRaw = s.read.parquet(statsDir(root))
      .filter(col("batch").isin(committed: _*))
    // artifacts written before the nb column existed skip the check; an
    // AGGREGATE (max over non-null rows) rather than limit(1) — a
    // mixed-schema index (pre-nb backfill + nb-carrying appends) would
    // make limit(1)'s answer depend on which batch's row it sampled
    // (null → NPE or a silently skipped check)
    // ONE driver job folds the nb check and the corpus constants: the
    // stats table is batches-sized, and running nb-check + st-broadcast
    // as separate jobs charged two fixed scheduling rounds to every
    // probe. n_docs/total_tokens are exact INT64 sums, so shipping them
    // as literals is bit-identical to the former broadcast crossJoin
    // (avgdl: cast-to-double then divide, same IEEE op either way).
    val hasNb = statsRaw.columns.contains("nb")
    val stRow = graft.util.Local.model(
      if (hasNb)
        statsRaw.agg(sum("n_docs").as("n_docs"),
          sum("total_tokens").as("total_tokens"), max("nb").as("nb"))
      else
        statsRaw.agg(sum("n_docs").as("n_docs"),
          sum("total_tokens").as("total_tokens"))
    ).collect().head
    val storedNb =
      if (hasNb && !stRow.isNullAt(2)) Some(stRow.getLong(2)) else None
    require(storedNb.forall(_ == NumBuckets.toLong),
      s"index at $root was bucketed with nb=${storedNb.get}, this build " +
        s"probes with $NumBuckets — rebuild or match the constant")
    val nDocs = if (stRow.isNullAt(0)) 0L else stRow.getLong(0)
    val totTok = if (stRow.isNullAt(1)) 0L else stRow.getLong(1)
    val avgdl = if (nDocs == 0L) 0.0 else totTok.toDouble / nDocs
    val pruned = s.read.parquet(postingsDir(root))
      .filter(col("batch").isin(committed: _*))
      .filter(col("tb").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
    val idfTab = dfTable(s, root, terms, buckets, committed)
      .getOrElse(pruned.groupBy("term").agg(count(lit(1)).as("df")))
      .select(col("term"),
        idf(col("df"), lit(nDocs)).as("idf"),
        lit(avgdl).as("avgdl"))
    (pruned, idfTab)
  }

  /** BATCHED retrieval — the production serving shape (queries arrive in
    * micro-batches, not one at a time): top-`k` per query id for a whole
    * query SET against one pruned probe. All queries' terms prune
    * together (union of their buckets), the (qid, term) frame broadcasts
    * onto the pruned postings, and per-(qid, doc) scores partial-reduce
    * through [[graft.functions.TopKByScore]] — each map task emits at
    * most k rows per qid BEFORE the exchange, so the shuffle carries
    * k·maps·|queries| rows however many documents match (the q_knn_join
    * discipline; a rank window here would shuffle and sort every scored
    * (qid, doc) pair). Scores are the exact INT64 micros (< 2^53, so the
    * double-typed buffer is exact); ties break by doc_id asc inside the
    * buffer's total order. Returns (qid, rank, doc_id, score) ordered by
    * (qid, rank) — per-qid results identical to [[query]] one at a time
    * (law pinned in RetrievalSpec). */
  def queryMulti(s: SparkSession, root: String,
                 queries: Seq[(Long, Seq[String])], k: Int = 5)
      : DataFrame = {
    import s.implicits._
    graft.util.Confs.ensureObjectHashHeadroom(s)
    val (pruned, idfTab) = probe(s, root, queries.flatMap(_._2).distinct)
    val qdf = queries.flatMap { case (q, ts) => ts.distinct.map(t => (q, t)) }
      .toDF("qid", "term")
    pruned.join(broadcast(qdf), Seq("term"))
      .join(broadcast(idfTab), Seq("term"))
      .select(col("qid"), col("doc_id"),
        contribMicros(col("tf"), col("dl"), col("idf"), col("avgdl"))
          .as("cq"))
      .groupBy("qid", "doc_id").agg(sum("cq").as("sq"))
      .groupBy("qid")
      .agg(graft.functions.TopKByScore
        .topk(col("sq").cast("double"), col("doc_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("qid"), (col("i") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"),
        round(col("t.score") / 1e6, 6).as("score"))
      .orderBy("qid", "rank")
  }
}
