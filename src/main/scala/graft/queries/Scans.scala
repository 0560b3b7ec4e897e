package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables
import graft.util.Det._

/** Scans, projection/filter, sinks — SURVEY.md §2.1–2.2.
  *
  * All of these compile to a single vectorized parquet scan with Catalyst
  * column pruning + predicate pushdown; at cluster scale they read only the
  * row groups and columns the query needs (verified by plan-shape tests).
  */
object Scans {

  /** Scratch root for the sink round-trip queries and every at-rest
    * artifact (indexes, models): `SPARK_GRAFT_SCRATCH` if set (on a
    * real cluster: a job-scoped staging dir on SHARED storage — local
    * tmp is driver-only), else java.io.tmpdir. The leaf is derived
    * from (code fingerprint, sfDir, session): the session hash keeps
    * concurrent runs at different scale factors from clobbering each
    * other, and the CODE fingerprint keeps a FRESH JVM from silently
    * reusing an artifact a PREVIOUS build of the code wrote —
    * `s.hashCode` is an identity hash that repeats across identical
    * launch sequences, and before the fingerprint a format change
    * (e.g. the r16 inverted-index dictionary) could leave three bench
    * sessions verifying an index layout the running code never wrote.
    * Any recompile moves every leaf; same-code same-session reuse is
    * untouched (the fingerprint is a stable lazy val). */
  private[graft] def scratch(kind: String,
                               s: org.apache.spark.sql.SparkSession,
                               d: String): String = {
    sweepStale(kind, s)
    scratchAt(kind, codeFingerprint, s, d)
  }

  private val sweptKinds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Janitor for the fingerprint scheme's one cost: every recompile
    * moves every leaf, stranding the previous build's artifacts, so
    * without this the scratch root grows by one full artifact set per
    * build forever. On the FIRST scratch() call for each kind per JVM,
    * best-effort delete sibling `graft_<kind>_<fp>_<hash>` leaves whose
    * fingerprint differs from the running code's (kinds contain no
    * underscores, so the leaf name splits unambiguously). Same-
    * fingerprint leaves — including other sessions of the SAME build
    * running concurrently — are never touched; a concurrent run of a
    * DIFFERENT build would lose its cache and rebuild, which is the
    * safe direction (exists() reads false, never stale bytes). */
  private def sweepStale(kind: String,
                         s: org.apache.spark.sql.SparkSession): Unit =
    if (sweptKinds.add(kind)) {
      try {
        val root = new org.apache.hadoop.fs.Path(scratchRoot)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val sibs = Option(fs.globStatus(
          new org.apache.hadoop.fs.Path(root, s"graft_${kind}_*")))
          .getOrElse(Array.empty)
        for (st <- sibs) {
          val parts = st.getPath.getName.split("_")
          if (parts.length == 4 && parts(1) == kind &&
              parts(2) != codeFingerprint)
            fs.delete(st.getPath, true)
        }
      } catch { case _: Exception => () } // janitor must never fail a query
    }

  private[graft] def scratchRoot: String =
    sys.env.getOrElse("SPARK_GRAFT_SCRATCH",
      System.getProperty("java.io.tmpdir"))

  /** [[scratch]] with the fingerprint explicit — the seam the
    * invalidation spec drives: a fingerprint change MUST move the
    * path (so exists() reads false and the artifact rebuilds), equal
    * fingerprints MUST reuse it. */
  private[graft] def scratchAt(kind: String, fingerprint: String,
                               s: org.apache.spark.sql.SparkSession,
                               d: String): String = {
    val root = scratchRoot
    s"$root/graft_${kind}_${fingerprint}_" +
      java.lang.Integer.toHexString(d.hashCode ^ s.hashCode)
  }

  /** Fingerprint of the compiled graft classes — and therefore of
    * every at-rest artifact format they can write. Hashes (relative
    * path, size, mtime) of each .class file under this class's code
    * source (a directory under sbt, one jar stat when deployed
    * assembled), so ANY recompile — format change or not — yields a
    * new value; over-invalidation costs one rebuild of fixture-sized
    * artifacts, under-invalidation silently serves stale bytes.
    * Computed once per JVM (file metadata only, no content reads). */
  private[graft] lazy val codeFingerprint: String = {
    import java.nio.file.{Files, Paths, Path}
    import scala.jdk.CollectionConverters._
    val md = java.security.MessageDigest.getInstance("MD5")
    def mix(str: String): Unit = md.update(str.getBytes("UTF-8"))
    try {
      val loc = Paths.get(
        Scans.getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
      if (Files.isDirectory(loc)) {
        val walk = Files.walk(loc)
        try {
          walk.iterator().asScala
            .filter(p => p.toString.endsWith(".class"))
            .map(p => s"${loc.relativize(p)}:${Files.size(p)}:" +
              s"${Files.getLastModifiedTime(p).toMillis}")
            .toSeq.sorted.foreach(mix)
        } finally walk.close()
      } else mix(s"${loc.getFileName}:${Files.size(loc)}:" +
        s"${Files.getLastModifiedTime(loc).toMillis}")
    } catch {
      case e: Exception =>
        // Degrading to a constant fingerprint silently reinstates the
        // stale-artifact trap for THIS deployment (null code source
        // under exotic classloaders) — make it visible, don't hide it.
        org.slf4j.LoggerFactory.getLogger(Scans.getClass).warn(
          "graft codeFingerprint unavailable ({}); scratch artifacts " +
          "will NOT auto-invalidate across recompiles in this " +
          "deployment", e.toString)
        mix("dev")
    }
    md.digest().take(4).map(b => f"$b%02x").mkString
  }

  val queries: Map[String, Q] = Map(
    // NOTE on ordering: (l_orderkey, l_linenumber) is NOT unique in the
    // synthetic fixtures (11,785 dupes at sf0.01), so every lineitem-level
    // query totalizes its sort over ALL output columns — engines break ties
    // differently otherwise. No full-row dupes exist, so this is total.
    "q_scan_full" -> ((s, d) => {
      val df = Tables.lineitem(s, d)
        .withColumn("l_shipdate_ms", epochMs(col("l_shipdate")))
        .drop("l_shipdate")
      df.orderBy(df.columns.map(col).toIndexedSeq: _*)
    }),

    "q_scan_prune" -> ((s, d) => {
      // 3 of 11 columns — ColumnPruning pushes the projection into the
      // parquet reader (ReadSchema shows only these three).
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    }),

    "q_scan_filter_pushdown" -> ((s, d) => {
      // Timestamp range predicate reaches the scan (PushedFilters) and
      // skips row groups via parquet min/max stats.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
                col("l_shipdate") <  lit("1998-07-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
                epochMs(col("l_shipdate")).as("l_shipdate_ms"))
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate_ms")
    }),

    "q_project_arith" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      // Per-row IEEE double arithmetic — bit-identical across engines, no
      // rounding needed (Det contract).
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"),
          ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            * (lit(1.0) + col("l_tax"))).as("charge"))
        .orderBy("l_orderkey", "l_linenumber", "revenue", "charge")
        .limit(1000)
    }),

    "q_filter_pred" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(
          (col("l_returnflag").isin("A", "R") || col("l_linestatus") === "O")
            && col("l_quantity").between(5.0, 30.0)
            && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") <  lit("2000-01-01").cast("timestamp")
            && col("l_orderkey").cast("string").like("%7"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    }),

    "q_filter_null" -> ((s, d) => {
      // Fixtures contain no NULLs — derive them with nullif, then exercise
      // three-valued logic + coalesce.
      Tables.lineitem(s, d)
        .withColumn("d", nullif(col("l_discount"), lit(0.0)))
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("d")).as("n_discounted"),
          sum(when(col("d").isNull, 1L).otherwise(0L)).as("n_zero_disc"),
          dsum(coalesce(col("d"), lit(0.0))).as("sum_disc"))
        .orderBy("l_returnflag")
    }),

    "q_case_when" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("band",
          when(col("o_totalprice") < 50000.0, "small")
            .when(col("o_totalprice") < 150000.0, "medium")
            .when(col("o_totalprice") < 300000.0, "large")
            .otherwise("jumbo"))
        .groupBy("band")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("band")
    }),

    // Partitioned sink + partition-pruned re-read: write lineitem
    // partitioned by l_returnflag, read back ONLY the 'R' partition (the
    // scan shows PartitionFilters, not a data filter — directory-level
    // pruning, the layout a 100-TB table would use). Oracle runs the
    // equivalent WHERE over the original table.
    // Bench note (profiled r4): ~0.5 s of this key's ~0.9 s IS the full
    // 600 K-row write — codec choice moves nothing (snappy≈lz4≈zstd ±10%)
    // and a repartition(32) before the write is 2× WORSE at this scale
    // (shuffle + 96 tiny files vs 3 scan-task writers). The per-scan-task
    // dynamic write below is also the scalable shape: writers track input
    // splits, no shuffle, no single-task-per-partition-value bottleneck.
    "q_sink_partitioned" -> ((s, d) => {
      val tmp = scratch("part", s, d)
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // JSON and CSV source/sink roundtrips — the reference's records are
    // serde-encoded (JSON/Avro) Kafka messages; these exercise the same
    // encode→decode boundary on files. Schemas are EXPLICIT on re-read
    // (inference on JSON/CSV demotes timestamps to strings and is a
    // full extra pass at 100 TB).
    "q_sink_json" -> ((s, d) => {
      val tmp = scratch("json", s, d)
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .filter(col("o_totalprice") > 200000.0)
        .write.mode("overwrite").json(tmp)
      s.read.schema(
          "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double")
        .json(tmp)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderstatus")
    }),

    "q_sink_csv" -> ((s, d) => {
      val tmp = scratch("csv", s, d)
      Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.schema("c_custkey long, c_mktsegment string, c_acctbal double")
        .option("header", "true").csv(tmp)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_acctbal"))
        .orderBy("c_mktsegment")
    }),

    // ORC sink→source roundtrip (Spark's second built-in columnar
    // format): write a projection, re-read with an explicit schema,
    // aggregate; oracle runs the same agg on the ORIGINAL parquet.
    "q_sink_orc" -> ((s, d) => {
      val tmp = scratch("orc", s, d)
      Tables.part(s, d)
        .select("p_partkey", "p_brand", "p_retailprice")
        .write.mode("overwrite").orc(tmp)
      s.read.schema("p_partkey long, p_brand string, p_retailprice double")
        .orc(tmp)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sum_price"))
        .orderBy("p_brand")
    }),

    // Binary-file ingestion (the multimodal entry path: image/audio
    // payloads land as files and are scanned into binary columns): dump
    // the documents' text as ONE deterministic text file, scan it back
    // with the binaryFile source, aggregate file count + byte size.
    // Latin-only fixture text ⟹ utf-8 bytes == chars, so the oracle can
    // reproduce total_bytes as Σ(octet_length + newline) over documents.
    "q_source_binary" -> ((s, d) => {
      val tmp = scratch("bin", s, d)
      Tables.documents(s, d).orderBy("doc_id").select("text")
        .coalesce(1).write.mode("overwrite").text(tmp)
      s.read.format("binaryFile").option("pathGlobFilter", "part-*")
        .load(tmp)
        .agg(count(lit(1)).as("n_files"),
             sum(col("length")).as("total_bytes"))
    }),

    "q_sink_roundtrip" -> ((s, d) => {
      // Write a filtered slice to parquet, re-read it, aggregate. Oracle
      // runs the equivalent SQL over the ORIGINAL table — the round-trip
      // must be lossless. Path contract: see `scratch` above
      // (SPARK_GRAFT_SCRATCH env, tmpdir fallback).
      val tmp = scratch("roundtrip", s, d)
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_linestatus")
    }),

    // Bucketed sink + co-located join: both join sides written as
    // 8-bucket tables ON THE JOIN KEY (external tables under the scratch
    // dir), then joined reading the bucket layout back — the join runs
    // with NO shuffle exchange on either side (asserted in
    // PlanShapeSpec). This is the 100-TB answer for a fact table joined
    // repeatedly on the same key: pay the partitioning once at write
    // time, never again per query. Oracle runs the plain join on the
    // original parquet — bucketing is result-neutral.
    "q_sink_bucketed" -> ((s, d) => {
      val tmp = scratch("bucket", s, d)
      val tag = java.lang.Integer.toHexString(d.hashCode ^ s.hashCode)
      val (tl, to) = (s"graft_bkt_l_$tag", s"graft_bkt_o_$tag")
      for (t <- Seq(tl, to)) s.sql(s"DROP TABLE IF EXISTS $t")
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/l").saveAsTable(tl)
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/o").saveAsTable(to)
      // hint("merge"): at THIS tier AQE would broadcast the 2-column
      // lineitem side and never touch the bucket layout; at 100 TB
      // neither side broadcasts and SMJ is the only option — the hint
      // pins the plan the surface exists to demonstrate: a merge join
      // with ZERO exchange on either side. (Local sorts remain in the
      // plan, but over the pre-sorted single-file buckets they are
      // linear detect-sorted-run passes, not spills.)
      s.table(tl).hint("merge")
        .join(s.table(to), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    }),

    // Bad-record-tolerant ingestion: at 100 TB some fraction of any JSON
    // feed IS malformed, and the pipeline must count + quarantine it,
    // not die (or worse, silently drop it). Stage a JSONL file where a
    // deterministic 1/37 slice of lines is corrupted, read PERMISSIVE
    // with an explicit schema + _corrupt_record, and account for every
    // line: bad count, good count, and a checksum (doc_id sum) proving
    // the good rows parsed with values intact. Oracle reproduces the
    // same accounting from the corruption rule.
    "q_source_badrecords" -> ((s, d) => {
      val tmp = scratch("badrec", s, d)
      val doc = Tables.documents(s, d)
      val line = to_json(struct(col("doc_id"), col("lang"), col("n_chars")))
      doc.select(
          when(pmod(col("doc_id"), lit(37L)) === 5L,
               concat(lit("{corrupt "), line)).otherwise(line).as("value"))
        .write.mode("overwrite").text(tmp)
      s.read
        .schema("doc_id long, lang string, n_chars long, _corrupt_record string")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(tmp)
        .agg(
          sum(col("_corrupt_record").isNotNull.cast("long")).as("n_bad"),
          sum(col("_corrupt_record").isNull.cast("long")).as("n_good"),
          sum(when(col("_corrupt_record").isNull, col("doc_id"))).as("good_id_sum"))
    }),

    // Small-files compaction — the table-maintenance op every long-lived
    // 100-TB table needs: a fragmented write (64 shuffle files) is
    // rewritten to a handful of scan-sized files; the data must survive
    // byte-identical (agg checksum) and the file counts prove the
    // layout change. repartition by a key (not coalesce) so the rewrite
    // also CLUSTERS — coalesce would just glue neighbors and keep the
    // row scatter.
    "q_sink_compact" -> ((s, d) => {
      val frag = scratch("frag", s, d)
      val comp = scratch("compact", s, d)
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
      li.repartition(64).write.mode("overwrite").parquet(frag)
      s.read.parquet(frag).repartition(4, col("l_orderkey"))
        .write.mode("overwrite").parquet(comp)
      val nFrag = s.read.format("binaryFile")
        .option("pathGlobFilter", "part-*").load(frag).count()
      val nComp = s.read.format("binaryFile")
        .option("pathGlobFilter", "part-*").load(comp).count()
      s.read.parquet(comp)
        .agg(count(lit(1)).as("n_rows"),
             dsum(col("l_quantity")).as("sum_qty"))
        .select(lit(nFrag).as("n_files_frag"), lit(nComp).as("n_files_compact"),
                col("n_rows"), col("sum_qty"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_scan_full" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         epoch_ms(l_shipdate) AS l_shipdate_ms
         FROM lineitem
         ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                  l_extendedprice, l_discount, l_tax, l_returnflag,
                  l_linestatus, l_shipdate_ms""",
    "q_scan_prune" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
         FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, epoch_ms(l_shipdate) AS l_shipdate_ms
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01'
           AND l_shipdate <  TIMESTAMP '1998-07-01'
         ORDER BY l_orderkey, l_linenumber, l_shipdate_ms""",
    "q_project_arith" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS revenue,
         (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, revenue, charge LIMIT 1000""",
    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem
         WHERE (l_returnflag IN ('A','R') OR l_linestatus = 'O')
           AND l_quantity BETWEEN 5.0 AND 30.0
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '2000-01-01'
           AND CAST(l_orderkey AS STRING) LIKE '%7'
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""",
    "q_filter_null" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_rows,
          COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
          CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero_disc,
          ${sqlDsum("COALESCE(NULLIF(l_discount, 0.0), 0.0)")} AS sum_disc
          FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_case_when" ->
      s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
                      WHEN o_totalprice < 150000.0 THEN 'medium'
                      WHEN o_totalprice < 300000.0 THEN 'large'
                      ELSE 'jumbo' END AS band,
          COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1 ORDER BY band""",
    "q_sink_roundtrip" ->
      s"""SELECT l_linestatus, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem WHERE l_returnflag = 'R'
          GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_sink_partitioned" ->
      s"""SELECT l_returnflag, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem WHERE l_returnflag = 'R'
          GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_sink_json" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n,
          ${sqlDsum("o_totalprice")} AS sum_price
          FROM orders WHERE o_totalprice > 200000.0
          GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_sink_csv" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
          ${sqlDsum("c_acctbal")} AS sum_acctbal
          FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_sink_orc" ->
      s"""SELECT p_brand, COUNT(*) AS n,
          ${sqlDsum("p_retailprice")} AS sum_price
          FROM part GROUP BY p_brand ORDER BY p_brand""",
    "q_source_binary" ->
      """SELECT CAST(1 AS BIGINT) AS n_files,
         CAST(SUM(octet_length(encode(text)) + 1) AS BIGINT) AS total_bytes
         FROM documents""",
    "q_sink_bucketed" ->  // plain join oracle: bucketing is result-neutral
      s"""SELECT o_orderpriority, COUNT(*) AS n,
          ${sqlDsum("l_quantity")} AS sum_qty,
          ${sqlDsum("o_totalprice")} AS sum_price
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_source_badrecords" ->  // the corruption rule, replayed directly
      """SELECT
           CAST(COUNT(CASE WHEN doc_id % 37 = 5 THEN 1 END) AS BIGINT)
             AS n_bad,
           CAST(COUNT(CASE WHEN doc_id % 37 <> 5 THEN 1 END) AS BIGINT)
             AS n_good,
           CAST(SUM(CASE WHEN doc_id % 37 <> 5 THEN doc_id END) AS BIGINT)
             AS good_id_sum
         FROM documents""",
    "q_sink_compact" ->  // file counts are deterministic by construction
      s"""SELECT CAST(64 AS BIGINT) AS n_files_frag,
          CAST(4 AS BIGINT) AS n_files_compact,
          COUNT(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem"""
  )
}
