package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.operators.{DedupCluster, PrefixFilter}
import graft.sources.Tables

/** Training-pipeline operators beyond the pair-finding family: dedup
  * CLUSTERING (pairs → canonical keeper decision) and deterministic
  * hash-based sampling / train-test splitting — the row-level plumbing a
  * 100-TB corpus pipeline runs between ingestion and training.
  *
  * Scale design:
  *  - q_dedup_cluster: connected components via min-label propagation
  *    over the PAIR-GRAPH vertices only (operators.DedupCluster) — the
  *    iteration count tracks component diameter (near-dup clusters are
  *    near-cliques), never corpus size; the corpus rejoins once as
  *    singletons through one anti-join.
  *  - q_sample_stratified / q_split_train: stateless per-row arithmetic
  *    on the id — no shuffle at all until the split AGGREGATION, and a
  *    sample is reproducible forever from the id alone (no RNG state, no
  *    seed files). Per-stratum rates are a CASE expression, so the scan
  *    filter pushes to parquet row groups where stats allow.
  */
object PipelineOps {

  val queries: Map[String, Q] = Map(
    // ---- near-dup pairs → dedup decision: cluster_id = min reachable
    // doc_id through the exact (prefix-filtered) J >= 0.8 pair graph;
    // the cluster_id row is the keeper, the rest are drops.
    "q_dedup_cluster" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sh = LlmOps.shingles(docs)
      val cands = PrefixFilter.candidatePairs(sh, 0.8)
      val pairs = DedupOps.jaccardPairs(sh, Some(cands))
        .filter(col("jaccard") >= 0.8)
        .select("doc_a", "doc_b")
      DedupCluster.clusters(docs.select("doc_id"), pairs)
        .withColumn("is_keeper",
          (col("doc_id") === col("cluster_id")).cast("long"))
        .orderBy("doc_id")
    }),

    // ---- deterministic stratified sampling: per-lang keep rates (per
    // mille) applied via pure id arithmetic — the same row is sampled on
    // every run, every engine, every rerun of a failed 100-TB stage.
    "q_sample_stratified" -> ((s, d) => {
      val rate = when(col("lang") === "en", 500L)
        .when(col("lang") === "de", 300L)
        .otherwise(200L)
      Tables.documents(s, d)
        .filter(pmod(col("doc_id") * 48271L + 11L, lit(1000L)) < rate)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // ---- text normalization — the step BEFORE exact dedup in every
    // corpus pipeline: lowercase, strip non-alphanumerics, squeeze
    // whitespace; emits the normalized-content hash so near-identical
    // punctuation/case variants collapse under q_dedup_exact's groupBy.
    "q_text_norm" -> ((s, d) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
      Tables.documents(s, d)
        .select(col("doc_id"),
          sha2(norm, 256).as("norm_hash"),
          length(norm).cast("long").as("norm_len"),
          (length(col("text")) - length(norm)).cast("long").as("n_stripped"))
        .orderBy("doc_id")
    }),

    // ---- deterministic train/valid/test split (80/10/10 by id hash),
    // reported as per-(lang, split) counts — the lineage-free split
    // assignment a reproducible data pipeline wants.
    "q_split_train" -> ((s, d) => {
      val h = pmod(col("doc_id") * 69621L + 7L, lit(100L))
      Tables.documents(s, d)
        .withColumn("split",
          when(h < 80, "train").when(h < 90, "valid").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE np AS (
            SELECT doc_a, doc_b FROM (${DedupOps.exactJaccardOracleSql}) t),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM np
            UNION ALL
            SELECT doc_b AS src, doc_a AS dst FROM np),
          reach AS (
            SELECT doc_id AS src, doc_id AS dst FROM documents
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
          SELECT src AS doc_id, MIN(dst) AS cluster_id,
                 CAST(src = MIN(dst) AS BIGINT) AS is_keeper
          FROM reach GROUP BY src ORDER BY doc_id""",
    "q_sample_stratified" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE (doc_id * 48271 + 11) % 1000 <
           CASE WHEN lang = 'en' THEN 500
                WHEN lang = 'de' THEN 300 ELSE 200 END
         ORDER BY doc_id""",
    "q_text_norm" ->
      """SELECT doc_id,
           sha256(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
           CAST(length(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len,
           CAST(length(text) - length(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT)
             AS n_stripped
         FROM documents ORDER BY doc_id""",
    "q_split_train" ->
      """SELECT lang,
           CASE WHEN (doc_id * 69621 + 7) % 100 < 80 THEN 'train'
                WHEN (doc_id * 69621 + 7) % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs
         FROM documents GROUP BY 1, 2 ORDER BY lang, split"""
  )
}
