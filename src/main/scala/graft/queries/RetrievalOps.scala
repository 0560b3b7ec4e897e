package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables
import graft.operators.InvertedIndex

/** Lexical + hybrid retrieval over the documents corpus — the search
  * half of a training-data / RAG pipeline, complementing the ANN stack
  * (q_knn_* / AnnIndex):
  *
  *  - q_text_bm25: quantized-BM25 scoring as a MAP-ONLY full scan — per-
  *    doc tf via array filters (no explode, no shuffle except one stats
  *    agg + final top-k), the correctness twin.
  *  - q_text_index_query: the SAME scores answered from the stored
  *    inverted index (operators.InvertedIndex) — hash-bucket partition
  *    pruning + model-sized broadcasts, the 100-TB serving shape. Both
  *    keys share one DuckDB oracle: a full-scan recompute must hash-match
  *    the stored-index answer bit-for-bit.
  *  - q_retrieval_hybrid: reciprocal-rank fusion (RRF, Cormack et al.
  *    SIGIR'09) of the lexical BM25 ranking and the embedding-cosine
  *    ranking for one query document — the standard hybrid-retrieval
  *    shape. Both legs are top-20 TakeOrdered probes (never a global
  *    window over the corpus; rank assignment happens on the 20-row
  *    result), fused through a full-outer join on doc id with
  *    1/(60+rank) contributions summed in a fixed expression order.
  *
  * Determinism discipline: every BM25 contribution is quantized to an
  * exact INT64 millionth before summing (integer addition commutes →
  * partition-order-independent), ranks are integers from totally-ordered
  * sorts (score desc, id asc), and the only float comparisons cross
  * engines are the same round-to-6dp/4dp boundaries the tfidf and
  * knn_cosine families already pin.
  */
object RetrievalOps {

  /** Fixed query-term list for the BM25 pair — a df spread from ~25/500
    * ("dup", idf ≈ 3.0) to ~390/500 (common markers, idf ≈ 0.26) so the
    * ranking exercises both idf extremes. Literal on BOTH engine sides
    * (SURVEY §7.5 #6). */
  private val bmTerms = Seq("spark", "window", "dup", "merge")

  /** The batched-serving query set (disjoint and overlapping term mixes,
    * the rare "dup" included) — literal on BOTH engine sides. */
  private[graft] val bmMulti: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark", "window"),
    1L -> Seq("dup", "merge"),
    2L -> Seq("batch", "key", "slow"))

  /** One shared full-scan implementation of quantized BM25 for the fixed
    * `bmTerms` — per-doc tf/dl from array expressions (map-only), corpus
    * stats from ONE agg row broadcast back, contributions summed in fixed
    * expression order. Exactly the arithmetic InvertedIndex.query runs,
    * so the two paths hash-match. */
  private def bm25FullScan(docs: DataFrame): DataFrame = {
    val toks = InvertedIndex.tokens(col("text"))
    val base = docs.select(
      Seq(col("doc_id"), size(toks).cast("long").as("dl")) ++
        bmTerms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === t)).cast("long").as(s"tf$i")
        }: _*)
    val statCols =
      Seq(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens")) ++
        bmTerms.indices.map(i =>
          sum((col(s"tf$i") > 0).cast("long")).as(s"df$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    base.crossJoin(broadcast(stats))
      .filter(bmTerms.indices.map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n_docs"))
      .select(col("doc_id"),
        round(bmTerms.indices.map(i =>
            InvertedIndex.contribMicros(col(s"tf$i"), col("dl"),
              InvertedIndex.idf(col(s"df$i"), col("n_docs")),
              col("avgdl")))
          .reduce(_ + _).cast("double") / 1e6, 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    // ---- Quantized-BM25 top-20, full-scan form. At 100 TB this is the
    // one-off ad-hoc query shape (one linear scan, no index); the
    // standing-corpus shape is q_text_index_query below.
    "q_text_bm25" -> ((s, d) => bm25FullScan(Tables.documents(s, d))),

    // ---- The SAME BM25 answer from the inverted index AT REST: first
    // call per (session, sf) builds the artifact (the offline backfill);
    // every later call — and any real deployment — answers purely from
    // storage: the probe's term buckets prune the postings partitions at
    // file-listing level, df/idf come from the pruned rows themselves,
    // and the only corpus-sized work is one doc_id shuffle over the
    // matched postings. Oracled by the full-scan SQL — index and scan
    // must agree bit-for-bit.
    "q_text_index_query" -> ((s, d) => {
      val root = Scans.scratch("textindex", s, d)
      if (!InvertedIndex.exists(s, root))
        InvertedIndex.build(Tables.documents(s, d), root)
      InvertedIndex.query(s, root, bmTerms, k = 20)
    }),

    // ---- BATCHED retrieval over the stored index — the production
    // serving shape (queries arrive in micro-batches): three queries
    // answered from ONE pruned probe, per-(qid, doc) scores
    // partial-reduced through graft_topk so the exchange carries
    // k·maps·|queries| rows however many documents match. Per-qid
    // output ≡ the single-query path (law pinned in RetrievalSpec);
    // DuckDB-oracled by a full-scan recompute over a VALUES query set.
    "q_text_index_multi" -> ((s, d) => {
      val root = Scans.scratch("textindex", s, d)
      if (!InvertedIndex.exists(s, root))
        InvertedIndex.build(Tables.documents(s, d), root)
      InvertedIndex.queryMulti(s, root, bmMulti, k = 5)
    }),

    // ---- Index-maintenance COMPACTION (the q_sink_compact discipline
    // applied to the index artifact): continuous ingest leaves one small
    // file set per (bucket, batch) — probe cost degrades with file count
    // even under perfect pruning — so a deployment periodically folds
    // all batches into batch 0. This key builds a 3/4 backfill, appends
    // the remaining 1/4 as an ingest batch, compacts, and answers the
    // standard probe: postings rows and summed stats are preserved
    // exactly, so the SAME full-scan SQL oracle must hash-match the
    // post-compaction answer (physical-layout change, zero semantic
    // change; the file-count reduction itself is pinned in
    // RetrievalSpec).
    "q_text_index_compact" -> ((s, d) => {
      val root = Scans.scratch("textindexc", s, d)
      if (!InvertedIndex.exists(s, root)) {
        val docs = Tables.documents(s, d)
        InvertedIndex.build(docs.filter(pmod(col("doc_id"), lit(4)) =!= 0),
          root)
        InvertedIndex.append(docs.filter(pmod(col("doc_id"), lit(4)) === 0),
          root, batchId = 1)
        InvertedIndex.compact(s, root)
      }
      InvertedIndex.query(s, root, bmTerms, k = 20)
    }),

    // ---- Hybrid retrieval via reciprocal-rank fusion: query = document
    // 0 (its text for the lexical leg, its embedding for the semantic
    // leg — the fixture's doc_id/vec_id spaces coincide), corpus = all
    // other docs. rrf = Σ_present 1/(60 + rank) over the two top-20
    // legs, k=60 per the RRF paper. Each leg is a TakeOrdered top-20
    // (corpus-scale-safe); the 20-row window that numbers the ranks is
    // result-sized, not corpus-sized.
    "q_retrieval_hybrid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // lexical leg: dynamic query terms (doc 0's distinct tokens),
      // explode + broadcast-semi-join prunes the token stream map-side
      val qterms = docs.filter(col("doc_id") === 0)
        .select(explode(array_distinct(InvertedIndex.tokens(col("text"))))
          .as("term"))
      val corpus = docs.filter(col("doc_id") =!= 0)
        .select(col("doc_id"), InvertedIndex.tokens(col("text")).as("toks"))
      val base = corpus.select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      val tf = base.join(broadcast(qterms), Seq("term"))
        .groupBy("doc_id", "term", "dl").agg(count(lit(1)).as("tf"))
      val stats = corpus.select(size(col("toks")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
      val idfTab = tf.groupBy("term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(stats))
        .select(col("term"),
          InvertedIndex.idf(col("df"), col("n_docs")).as("idf"),
          (col("total_tokens").cast("double") / col("n_docs")).as("avgdl"))
      val lexScores = tf.join(broadcast(idfTab), Seq("term"))
        .select(col("doc_id"),
          InvertedIndex.contribMicros(col("tf"), col("dl"), col("idf"),
            col("avgdl")).as("cq"))
        .groupBy("doc_id").agg(sum("cq").as("sq"))
      val lexRank = lexScores
        .orderBy(col("sq").desc, col("doc_id").asc).limit(20)
        .withColumn("lex_rank", row_number()
          .over(Window.orderBy(col("sq").desc, col("doc_id").asc))
          .cast("long"))
        .select("doc_id", "lex_rank")
      // semantic leg: q_knn_cosine's exact probe shape, top-20
      val emb = LlmOps.embDouble(Tables.embeddings(s, d))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("nrm").as("qn"))
      val semRank = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.functions.VectorExprs.dot(col("v"), col("qv")) /
            (col("nrm") * col("qn")), 4).as("cos"))
        .orderBy(col("cos").desc, col("vec_id").asc).limit(20)
        .withColumn("sem_rank", row_number()
          .over(Window.orderBy(col("cos").desc, col("vec_id").asc))
          .cast("long"))
        .select(col("vec_id").as("doc_id"), col("sem_rank"))
      lexRank.join(semRank, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("lex_rank"), col("sem_rank"),
          round(
            coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)), 6)
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id").asc)
        .limit(10)
    })
  )

  /** The shared BM25 oracle: a DuckDB full-scan recompute of the exact
    * quantized arithmetic (same literals, same operand order — ln aside,
    * every op is IEEE-exact, and the INT64 quantization makes the sum
    * order-free). Serves BOTH q_text_bm25 and q_text_index_query. */
  private val bm25OracleSql: String = {
    val tfCols = bmTerms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(",\n           ")
    val dfCols = bmTerms.indices.map(i =>
      s"SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i")
      .mkString(",\n           ")
    val contribs = bmTerms.indices.map(i =>
      s"""CAST(round((ln(1.0 + ((CAST(n_docs AS DOUBLE) - df$i) + 0.5) / (df$i + 0.5))
         * ((tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * (0.25 + (0.75 * dl) / (CAST(total_tokens AS DOUBLE) / n_docs)))))
         * 1000000.0) AS BIGINT)""").mkString("\n         + ")
    s"""WITH t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
           FROM documents),
         d AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
           $tfCols
           FROM t),
         st AS (
           SELECT COUNT(*) AS n_docs, SUM(dl) AS total_tokens,
           $dfCols
           FROM d)
         SELECT doc_id,
           round(CAST(
         $contribs
           AS DOUBLE) / 1000000.0, 6) AS score
         FROM d, st
         WHERE ${bmTerms.indices.map(i => s"tf$i").mkString(" + ")} > 0
         ORDER BY score DESC, doc_id ASC LIMIT 20"""
  }

  val oracle: Map[String, String] = Map(
    "q_text_index_multi" ->
      """WITH q(qid, term) AS (VALUES (0, 'spark'), (0, 'window'), (1, 'dup'),
           (1, 'merge'), (2, 'batch'), (2, 'key'), (2, 'slow')),
         t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
           FROM documents),
         base AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, u.term
           FROM t, UNNEST(toks) AS u(term)),
         tf AS (
           SELECT doc_id, term, dl, COUNT(*) AS tf FROM base
           WHERE term IN (SELECT term FROM q) GROUP BY 1, 2, 3),
         st AS (
           SELECT COUNT(*) AS n_docs,
                  SUM(CAST(len(toks) AS BIGINT)) AS total_tokens FROM t),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         sc AS (
           SELECT q.qid, tf.doc_id,
             SUM(CAST(round((ln(1.0 + ((CAST(n_docs AS DOUBLE) - df) + 0.5) / (df + 0.5))
               * ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + (0.75 * dl) / (CAST(total_tokens AS DOUBLE) / n_docs)))))
               * 1000000.0) AS BIGINT)) AS sq
           FROM tf JOIN q USING (term) JOIN df USING (term), st GROUP BY 1, 2),
         r AS (
           SELECT *, ROW_NUMBER() OVER
             (PARTITION BY qid ORDER BY sq DESC, doc_id ASC) AS rn
           FROM sc)
         SELECT CAST(qid AS BIGINT) AS qid, CAST(rn AS BIGINT) AS "rank",
           doc_id, round(CAST(sq AS DOUBLE) / 1000000.0, 6) AS score
         FROM r WHERE rn <= 5 ORDER BY qid, "rank"""",
    "q_text_bm25" -> bm25OracleSql,
    "q_text_index_query" -> bm25OracleSql,
    "q_text_index_compact" -> bm25OracleSql,
    "q_retrieval_hybrid" ->
      """WITH qt AS (
           SELECT DISTINCT u.term FROM documents,
           UNNEST(list_filter(string_split(text, ' '), x -> length(x) > 0))
             AS u(term)
           WHERE doc_id = 0),
         t AS (
           SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 0) AS toks
           FROM documents WHERE doc_id <> 0),
         base AS (
           SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, u.term
           FROM t, UNNEST(toks) AS u(term)),
         tf AS (
           SELECT doc_id, term, dl, COUNT(*) AS tf
           FROM base JOIN qt USING (term) GROUP BY 1, 2, 3),
         st AS (
           SELECT COUNT(*) AS n_docs,
                  SUM(CAST(len(toks) AS BIGINT)) AS total_tokens FROM t),
         df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         sc AS (
           SELECT tf.doc_id,
             SUM(CAST(round((ln(1.0 + ((CAST(n_docs AS DOUBLE) - df) + 0.5) / (df + 0.5))
               * ((tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + (0.75 * dl) / (CAST(total_tokens AS DOUBLE) / n_docs)))))
               * 1000000.0) AS BIGINT)) AS sq
           FROM tf JOIN df USING (term), st GROUP BY 1),
         lex AS (
           SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY sq DESC, doc_id ASC) AS lex_rank
           FROM sc QUALIFY lex_rank <= 20),
         cos AS (
           SELECT b.vec_id,
             round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])), 4)
               AS cos
           FROM embeddings a JOIN embeddings b ON b.vec_id <> 0
           WHERE a.vec_id = 0),
         sem AS (
           SELECT vec_id,
             ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id ASC) AS sem_rank
           FROM cos QUALIFY sem_rank <= 20)
         SELECT COALESCE(l.doc_id, s.vec_id) AS doc_id,
           l.lex_rank, s.sem_rank,
           round(COALESCE(1.0 / (60 + l.lex_rank), 0.0)
               + COALESCE(1.0 / (60 + s.sem_rank), 0.0), 6) AS rrf
         FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.vec_id
         ORDER BY rrf DESC, doc_id ASC LIMIT 10"""
  )
}
