package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables
import graft.util.Det._

/** Text-analysis operators for a training-data pipeline (north-star
  * first-class family): language-ID heuristic, quality scoring, token
  * counting (whitespace + BPE-ish regex), and document fingerprinting
  * (rolling hash). All four are pure per-row/agg expressions — map-only or
  * map-side-combine plans that scale linearly.
  */
object TextOps {

  /** Marker-word lists per language (disjoint subsets of the corpus
    * vocabulary; literals on BOTH engine sides — SURVEY §7.5 #6). */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("agg", "hash", "sort", "merge"),
    "en" -> Seq("key", "row", "scan", "table"),
    "es" -> Seq("data", "query", "small", "slow"),
    "fr" -> Seq("window", "order", "value", "join"),
    "zh" -> Seq("spark", "batch", "stream", "vector"))

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** The cascade's per-doc DECISION: first failing rule index (1..5 in
    * the fixed count → meanlen → stopwords → singles → distinct order),
    * 0 = passes all. Pure stateless expression over `text` — shared by
    * q_quality_cascade's funnel and the s_quality_cascade streaming
    * twin (same bits per doc in both execution modes). */
  private[graft] def cascadeFirstFail: org.apache.spark.sql.Column = {
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val charsEx = length(col("text")).cast("long") - nTok + lit(1L)
    val nStop = size(filter(toks, t => t.isin("a", "the"))).cast("long")
    val nSingle = size(filter(toks, t => length(t) === 1)).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    when(!(nTok >= 15L && nTok <= 90L), 1L)
      .when(!(charsEx >= nTok * 3L && charsEx <= nTok * 7L), 2L)
      .when(!(nStop >= 2L), 3L)
      .when(!(nSingle * 5L <= nTok), 4L)
      .when(!(nDistinct * 10L > nTok * 3L), 5L)
      .otherwise(0L)
  }

  val queries: Map[String, Q] = Map(
    // Language-ID heuristic: score = |distinct tokens ∩ markers(lang)|,
    // predicted = argmax with deterministic de<en<es<fr<zh tie-break.
    "q_text_langid" -> ((s, d) => {
      val withToks = Tables.documents(s, d)
        .withColumn("toks", array_distinct(split(col("text"), " ")))
      val scored = markers.foldLeft(withToks) { case (df, (lang, words)) =>
        df.withColumn(s"s_$lang",
          size(array_intersect(col("toks"),
            array(words.map(lit): _*))).cast("long"))
      }
      val best = markers.map(_._1).map(l => col(s"s_$l"))
      scored.select(
          (Seq(col("doc_id")) ++
            markers.map { case (l, _) => col(s"s_$l") } ++ Seq(
            when(col("s_de") >= greatest(best.tail: _*), "de")
              .when(col("s_en") >= greatest(col("s_es"), col("s_fr"), col("s_zh")), "en")
              .when(col("s_es") >= greatest(col("s_fr"), col("s_zh")), "es")
              .when(col("s_fr") >= col("s_zh"), "fr")
              .otherwise("zh").as("predicted"),
            col("lang").as("actual"))): _*)
        .orderBy("doc_id")
    }),

    // Quality scoring: char length, token count, mean token length,
    // stopword ratio, single-char ratio — the length/punct/stopword family.
    "q_text_quality" -> ((s, d) => {
      val stop = Seq("a", "the")
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("len_chars"),
          size(col("toks")).cast("long").as("n_tokens"),
          round(length(col("text")).cast("double") / size(col("toks")), 6)
            .as("chars_per_token"),
          round(size(filter(col("toks"),
              t => t.isin(stop.map(lit(_).cast("string")): _*)))
            .cast("double") / size(col("toks")), 6).as("stopword_ratio"),
          round(size(filter(col("toks"), t => length(t) === 1))
            .cast("double") / size(col("toks")), 6).as("short_tok_ratio"))
        .orderBy("doc_id")
    }),

    // Overlapping token-window chunking — the retrieval-corpus prep step
    // (RAG indexing, context-window packing): 64-token chunks on a
    // 48-token stride (16-token overlap keeps boundary sentences intact
    // in both neighbors). Chunk starts are sequence(1, max(1, n−16), 48):
    // every token is covered, a short doc yields exactly one chunk, and
    // no trailing chunk duplicates its predecessor (each start past the
    // first contributes ≥ 1 token beyond the overlap). Pure per-row HOF
    // fan-out — no shuffle at all until the final presentation sort; at
    // 100 TB this is a map-only stage whose output feeds q_pack_sequences
    // or the ANN index build.
    "q_text_chunk" -> ((s, d) => {
      val W = 64; val S = 48
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(sequence(lit(1),
            greatest(lit(1), size(col("toks")) - 16), lit(S)))
            .as("start_tok"))
        .select(col("doc_id"),
          expr(s"CAST((start_tok - 1) div $S AS BIGINT)").as("chunk_id"),
          col("start_tok").cast("long").as("start_tok"),
          size(slice(col("toks"), col("start_tok"), lit(W))).cast("long")
            .as("n_tok"),
          array_join(slice(col("toks"), col("start_tok"), lit(W)), " ")
            .as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    }),

    // Token counting: whitespace tokens vs BPE-ish regex pieces (runs of
    // letters, digits, or single non-alnum chars).
    "q_text_tokens" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
          size(regexp_extract_all(col("text"),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
            .as("n_bpe_pieces"))
        .orderBy("doc_id")
    }),

    // Gopher-style quality-rule GATE (Rae et al. 2021 §A1.1, adapted to
    // the fixture's synthetic prose): where q_text_quality reports raw
    // per-doc metrics, this is the downstream keep/drop decision a
    // pipeline actually filters on — token-count bounds, mean-token-
    // length bounds, ≥2 stopword hits, single-char-token fraction ≤ 20%,
    // distinct-token fraction > 30%. Every rule is INTEGER cross-
    // multiplication (mean length as chars·1 vs tokens·[3,7], fractions
    // as n·k vs total·m) — no float quotient anywhere, so three engines
    // agree on every boundary document bit-for-bit. Map-only plan.
    "q_quality_gopher" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("long")
      val charsEx = length(col("text")).cast("long") - nTok + lit(1L)
      val nStop = size(filter(toks, t => t.isin("a", "the"))).cast("long")
      val nSingle = size(filter(toks, t => length(t) === 1)).cast("long")
      val nDistinct = size(array_distinct(toks)).cast("long")
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          nTok.as("n_tokens"),
          (nTok >= 15L && nTok <= 90L).cast("int").as("r_count"),
          (charsEx >= nTok * 3L && charsEx <= nTok * 7L).cast("int")
            .as("r_meanlen"),
          (nStop >= 2L).cast("int").as("r_stopwords"),
          (nSingle * 5L <= nTok).cast("int").as("r_singles"),
          (nDistinct * 10L > nTok * 3L).cast("int").as("r_distinct"))
        .withColumn("keep",
          (col("r_count") + col("r_meanlen") + col("r_stopwords") +
            col("r_singles") + col("r_distinct") === 5).cast("int"))
        .orderBy("doc_id")
    }),

    // Filter-cascade ATTRITION funnel: where q_quality_gopher emits the
    // per-doc rule bits, this is the report a pipeline owner reads —
    // rules applied in a FIXED order (count → meanlen → stopwords →
    // singles → distinct, the cheap-to-expensive discipline of a real
    // cascade), each doc attributed to its FIRST failing rule, then per
    // stage: docs reaching it, dropped at it, surviving it. One map-only
    // corpus pass folds to a ≤6-row first_fail histogram (map-side
    // combinable); the funnel itself is window arithmetic on a 5-row
    // literal frame — at 100 TB the corpus is touched exactly once and
    // everything downstream is model-sized. Same integer-only rule
    // arithmetic as the gopher gate, so three engines agree on every
    // boundary document.
    "q_quality_cascade" -> ((s, d) => {
      import s.implicits._
      val counts = Tables.documents(s, d)
        .select(cascadeFirstFail.as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n"))
      val stages = Seq(
          (0L, "pass"), (1L, "count"), (2L, "meanlen"),
          (3L, "stopwords"), (4L, "singles"), (5L, "distinct"))
        .toDF("stage", "rule")
      // 6-row frame: SinglePartition windows here are model-sized by
      // construction, not a corpus serialization point
      import org.apache.spark.sql.expressions.Window
      val wAll = Window.partitionBy()
      val wBefore = Window.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, -1)
      stages.join(counts, Seq("stage"), "left")
        .withColumn("n_dropped", coalesce(col("n"), lit(0L)))
        .withColumn("t", sum("n_dropped").over(wAll))
        // the stage-0 (pass) row carries survivors, not a rule drop — it
        // must not enter the cumulative-drops-before-this-stage sum
        .withColumn("nd_rule",
          when(col("stage") >= 1L, col("n_dropped")).otherwise(lit(0L)))
        .withColumn("n_reached",
          col("t") - coalesce(sum("nd_rule").over(wBefore), lit(0L)))
        .filter(col("stage") >= 1L)
        .select(col("stage"), col("rule"), col("n_reached"),
          col("n_dropped"),
          (col("n_reached") - col("n_dropped")).as("n_survived"))
        .orderBy("stage")
    }),

    // Document fingerprinting: order-sensitive rolling hash over the token
    // stream — h = fold(h*31 + code(tok)) mod 1e9+7, code = 131*len +
    // first-codepoint. Exact int64 arithmetic on both engines (values stay
    // < 2^35, no overflow), so this IS SQL-oracle-able.
    "q_text_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("codes", expr(
          "transform(split(text, ' '), t -> 131L * length(t) + ascii(substring(t, 1, 1)))"))
        .select(
          col("doc_id"),
          expr("aggregate(codes, 0L, (acc, x) -> (acc * 31 + x) % 1000000007)")
            .as("fingerprint"),
          size(col("codes")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // Corpus heavy hitters EXACTLY, at sketch cost: terms appearing in
    // ≥ 0.5% of all tokens. One pass builds a 256-counter Misra–Gries
    // sketch (functions.FreqSketch — map-side m-sized partials, merge
    // never materializes the vocabulary) plus the exact token total; the
    // MG bound guarantees every term with count > n/257 survives as a
    // candidate, so the ≤ 256 candidates broadcast back for one exact
    // re-count and NOTHING above the n/200 threshold can be missed.
    // Exact output from a sketch-pruned plan — the same candidate-first
    // pattern as q_dedup_minhash; at 100 TB the first pass shuffles 256
    // rows per map task instead of the term dictionary.
    "q_text_heavyhitters" -> ((s, d) => {
      // foreign-session guard: the Misra–Gries partial merge needs
      // ObjectHashAggregate headroom (util.Confs Scaladoc)
      graft.util.Confs.ensureObjectHashHeadroom(s)
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .filter(length(col("term")) > 0)
      val sk = toks.agg(count(lit(1)).as("n_total"),
          graft.functions.FreqSketch.freq(col("term"), 256).as("sk"))
      val cands = sk.select(col("n_total"), explode(col("sk")).as("c"))
        .select(col("n_total"), col("c.term").as("term"))
      toks.join(broadcast(cands), Seq("term"))
        .groupBy("term", "n_total").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 200L >= col("n_total"))
        .select(col("term"), col("cnt"),
          round(col("cnt").cast("double") / col("n_total").cast("double"), 6)
            .as("share"))
        .orderBy(col("cnt").desc, col("term").asc)
    }),

    // Distributed BPE merge training (operators.BpeTrain): 10 merges
    // learned from the word-frequency table — the corpus is scanned
    // once, every iteration runs over the Heaps-law-sized vocabulary.
    // Deterministic by total-ordered argmax (count desc, pair lex asc);
    // test-oracled (TokBpeSpec) against an independent local reference —
    // the merge table is not expressible as one SQL statement.
    "q_tok_bpe_train" -> ((s, d) => {
      graft.operators.BpeTrain.merges(Tables.documents(s, d), nMerges = 10)
        .orderBy("step")
    }),

    // TRAINED document classifier (multinomial Naive Bayes with +1
    // smoothing, labels = the lang column): the quality/domain-classifier
    // shape of a training-data pipeline (fastText-style filtering) as a
    // fully SQL-oracled surface — unlike the heuristic q_text_langid,
    // the model here is LEARNED from the data. Training is two
    // model-sized aggregates (class×term counts pivoted to one row per
    // vocab term; one stats row of class totals/priors/|V|); scoring is
    // one broadcast join + per-class INT64 sums — every log-likelihood
    // quantizes to an exact millionth before summing, so class scores
    // are partition-order-free and the DuckDB recompute hash-matches
    // (the q_text_bm25 determinism discipline). Argmax ties break to
    // the lexicographically-first class on both engines. At 100 TB:
    // train = one token-count shuffle into a Heaps-law-sized model,
    // score = one doc_id shuffle — both map-side combinable.
    "q_text_classify_nb" -> ((s, d) => {
      import graft.operators.NbClassifier
      val docs = Tables.documents(s, d)
      val classes = NbClassifier.classesOf(docs)
      val (grid, priors) = NbClassifier.train(docs, classes)
      NbClassifier.score(docs, grid, priors, classes)
    }),

    // The classifier AT REST — the train-once/score-forever twin of
    // q_text_classify_nb (the cluster_assign discipline applied to the
    // NB model): first call persists the vocab-sized llk grid + priors
    // row; every later call — and any real deployment, where training is
    // an offline job and scoring runs over every incoming batch — reads
    // the model back and runs ONLY the broadcast-join scoring pass. One
    // shared train()/score() implementation makes the stored answer
    // bit-identical to the in-flight one, so this key SHARES the
    // in-flight key's full DuckDB train+apply oracle.
    "q_text_classify_at_rest" -> ((s, d) => {
      import graft.operators.NbClassifier
      val root = Scans.scratch("nbmodel", s, d)
      if (!NbClassifier.exists(s, root))
        NbClassifier.store(Tables.documents(s, d), root)
      NbClassifier.scoreStored(s, root, Tables.documents(s, d))
    }),

    // Tokenize-the-corpus with the STORED merge table — the at-rest
    // twin of q_tok_bpe_train (the cluster_assign discipline applied to
    // the tokenizer): first call per (session, sf) trains and persists
    // the merges; every later call — and any real deployment, where
    // training is an offline job — reads the model-sized table back and
    // runs a PURE MAP: each word char-splits and folds through the 10
    // merges baked in as expression literals. No join, no shuffle, no
    // state — at 100 TB this is a map-only pass whose cost is the scan.
    // Test-oracled (TokBpeSpec: per-doc piece counts ≡ local reference
    // encode with the reference-trained merges).
    "q_text_bpe_apply" -> ((s, d) => {
      import graft.operators.BpeTrain
      val root = Scans.scratch("bpemerges", s, d)
      if (!BpeTrain.exists(s, root))
        BpeTrain.store(Tables.documents(s, d), root, nMerges = 10)
      BpeTrain.encodeStats(Tables.documents(s, d),
          BpeTrain.loadMerges(s, root))
        .orderBy("doc_id")
    }),

    // Gopher-style repetition quality signals: per-doc top-bigram share
    // and distinct-bigram (type/token) ratio — the filters that catch
    // boilerplate/spam docs whose length and stopword stats look fine.
    // Bigrams explode → (doc, bigram) count → per-doc max/sum: two
    // map-side-combinable aggregates keyed by doc, linear at any corpus
    // size (the bigram space is bounded by total token count, never a
    // cross product). Docs under 2 tokens have no bigrams and drop out —
    // same on both engines.
    "q_quality_repetition" -> ((s, d) => {
      val l = split(col("text"), " ")
      val bigrams = zip_with(
        slice(l, lit(1), size(l) - 1), slice(l, lit(2), size(l) - 1),
        (a, b) => concat(a, lit(" "), b))
      val counts = Tables.documents(s, d)
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("cnt"))
      counts.groupBy("doc_id")
        .agg(sum("cnt").as("n_bigrams"),
             count(lit(1)).as("n_distinct"),
             max("cnt").as("top_n"))
        .select(col("doc_id"), col("n_bigrams"), col("n_distinct"),
          col("top_n"),
          round(col("top_n").cast("double") / col("n_bigrams"), 4)
            .as("top_frac"),
          round(col("n_distinct").cast("double") / col("n_bigrams"), 4)
            .as("ttr"))
        .orderBy("doc_id")
    })
  )

  /** Full NB train+apply recompute — shared by the in-flight key and its
    * at-rest twin (one score implementation ⇒ one oracle). */
  private val nbOracleSql =
      """WITH toks AS (
           SELECT doc_id, lang, u.term FROM documents,
           UNNEST(list_filter(string_split(text, ' '), x -> length(x) > 0))
             AS u(term)),
         cnt AS (SELECT lang, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
         tot AS (SELECT lang, COUNT(*) AS t FROM toks GROUP BY 1),
         v AS (SELECT COUNT(DISTINCT term) AS v FROM toks),
         nd AS (SELECT COUNT(*) AS n FROM documents),
         pri AS (
           SELECT lang,
             CAST(round(ln(CAST(COUNT(*) AS DOUBLE) / nd.n) * 1000000.0)
               AS BIGINT) AS p
           FROM documents, nd GROUP BY lang, nd.n),
         grid AS (
           SELECT tm.term, l.lang,
             CAST(round(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                           / CAST(t.t + v.v AS DOUBLE)) * 1000000.0)
               AS BIGINT) AS llk
           FROM (SELECT DISTINCT term FROM toks) tm
           CROSS JOIN (SELECT DISTINCT lang FROM documents) l
           JOIN tot t ON t.lang = l.lang
           CROSS JOIN v
           LEFT JOIN cnt c ON c.term = tm.term AND c.lang = l.lang),
         sc AS (
           SELECT tk.doc_id, g.lang, CAST(SUM(g.llk) AS BIGINT) AS s
           FROM toks tk JOIN grid g ON g.term = tk.term
           GROUP BY 1, 2),
         best AS (
           -- one row per INPUT doc: a doc with no in-vocab token keeps
           -- the prior-argmax prediction (COALESCE 0 token sum) — the
           -- engine's left-join contract, mirrored
           SELECT d.doc_id, p.lang,
             ROW_NUMBER() OVER (PARTITION BY d.doc_id
               ORDER BY COALESCE(sc.s, 0) + p.p DESC, p.lang ASC) AS rn
           FROM documents d CROSS JOIN pri p
           LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.lang = p.lang)
         SELECT b.doc_id, b.lang AS predicted, d.lang AS actual
         FROM best b JOIN documents d ON d.doc_id = b.doc_id
         WHERE b.rn = 1 ORDER BY b.doc_id"""

  val oracle: Map[String, String] = Map(
    "q_text_classify_at_rest" -> nbOracleSql,
    "q_text_langid" -> {
      val score = markers.map { case (l, ws) =>
        s"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList(ws)})) AS BIGINT) AS s_$l"
      }.mkString(",\n         ")
      """SELECT doc_id,
         """ + score + """,
         CASE WHEN s_de >= greatest(s_en, s_es, s_fr, s_zh) THEN 'de'
              WHEN s_en >= greatest(s_es, s_fr, s_zh) THEN 'en'
              WHEN s_es >= greatest(s_fr, s_zh) THEN 'es'
              WHEN s_fr >= s_zh THEN 'fr'
              ELSE 'zh' END AS predicted,
         lang AS actual
         FROM documents ORDER BY doc_id"""
    },
    "q_quality_gopher" ->
      """WITH t AS (
           SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         k AS (
           SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n_tok,
             CAST(length(text) AS BIGINT) - CAST(len(l) AS BIGINT) + 1
               AS chars_ex,
             CAST(len(list_filter(l, x -> x IN ('a', 'the'))) AS BIGINT)
               AS n_stop,
             CAST(len(list_filter(l, x -> length(x) = 1)) AS BIGINT)
               AS n_single,
             CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct
           FROM t)
         SELECT doc_id, n_tok AS n_tokens,
           CAST(n_tok >= 15 AND n_tok <= 90 AS INT) AS r_count,
           CAST(chars_ex >= n_tok * 3 AND chars_ex <= n_tok * 7 AS INT)
             AS r_meanlen,
           CAST(n_stop >= 2 AS INT) AS r_stopwords,
           CAST(n_single * 5 <= n_tok AS INT) AS r_singles,
           CAST(n_distinct * 10 > n_tok * 3 AS INT) AS r_distinct,
           CAST(n_tok >= 15 AND n_tok <= 90
                AND chars_ex >= n_tok * 3 AND chars_ex <= n_tok * 7
                AND n_stop >= 2 AND n_single * 5 <= n_tok
                AND n_distinct * 10 > n_tok * 3 AS INT) AS keep
         FROM k ORDER BY doc_id""",
    "q_quality_cascade" ->
      """WITH t AS (
           SELECT doc_id, text, string_split(text, ' ') AS l FROM documents),
         k AS (
           SELECT doc_id,
             CAST(len(l) AS BIGINT) AS n_tok,
             CAST(length(text) AS BIGINT) - CAST(len(l) AS BIGINT) + 1
               AS chars_ex,
             CAST(len(list_filter(l, x -> x IN ('a', 'the'))) AS BIGINT)
               AS n_stop,
             CAST(len(list_filter(l, x -> length(x) = 1)) AS BIGINT)
               AS n_single,
             CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct
           FROM t),
         f AS (
           SELECT CASE
             WHEN NOT (n_tok >= 15 AND n_tok <= 90) THEN 1
             WHEN NOT (chars_ex >= n_tok * 3 AND chars_ex <= n_tok * 7)
               THEN 2
             WHEN NOT (n_stop >= 2) THEN 3
             WHEN NOT (n_single * 5 <= n_tok) THEN 4
             WHEN NOT (n_distinct * 10 > n_tok * 3) THEN 5
             ELSE 0 END AS stage
           FROM k),
         c AS (SELECT stage, COUNT(*) AS n FROM f GROUP BY 1),
         s AS (SELECT * FROM (VALUES
             (0, 'pass'), (1, 'count'), (2, 'meanlen'), (3, 'stopwords'),
             (4, 'singles'), (5, 'distinct')) v(stage, rule)),
         j AS (
           SELECT s.stage, s.rule, COALESCE(c.n, 0) AS n_dropped
           FROM s LEFT JOIN c ON c.stage = s.stage),
         w AS (
           SELECT stage, rule, n_dropped,
             SUM(n_dropped) OVER () AS t,
             COALESCE(SUM(CASE WHEN stage >= 1 THEN n_dropped ELSE 0 END)
               OVER (ORDER BY stage
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum
           FROM j)
         SELECT CAST(stage AS BIGINT) AS stage, rule,
           CAST(t - cum AS BIGINT) AS n_reached,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           CAST(t - cum - n_dropped AS BIGINT) AS n_survived
         FROM w WHERE stage >= 1 ORDER BY stage""",
    "q_text_classify_nb" -> nbOracleSql,
    "q_text_quality" ->
      """SELECT doc_id,
         CAST(length(text) AS BIGINT) AS len_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         round(CAST(length(text) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS chars_per_token,
         round(CAST(len(list_filter(string_split(text, ' '),
                 t -> t IN ('a', 'the'))) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS stopword_ratio,
         round(CAST(len(list_filter(string_split(text, ' '),
                 t -> length(t) = 1)) AS DOUBLE)
               / len(string_split(text, ' ')), 6) AS short_tok_ratio
         FROM documents ORDER BY doc_id""",
    "q_text_chunk" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         c AS (
           SELECT doc_id, CAST(i AS BIGINT) AS start_tok,
                  list_slice(toks, CAST(i AS INTEGER),
                             CAST(i + 63 AS INTEGER)) AS ch
           FROM t, unnest(generate_series(1,
                  greatest(1, len(toks) - 16), 48)) AS u(i))
         SELECT doc_id, CAST((start_tok - 1) // 48 AS BIGINT) AS chunk_id,
                start_tok, CAST(len(ch) AS BIGINT) AS n_tok,
                array_to_string(ch, ' ') AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",
    "q_text_tokens" ->
      """SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
              AS BIGINT) AS n_bpe_pieces
         FROM documents ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
               t -> CAST(131 * length(t) + ascii(substring(t, 1, 1)) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents ORDER BY doc_id""",
    "q_text_heavyhitters" ->  // pure-exact oracle: the sketch only PRUNES
      """WITH toks AS (
           SELECT t.term FROM documents,
           UNNEST(string_split(text, ' ')) AS t(term)
           WHERE length(t.term) > 0),
         tot AS (SELECT COUNT(*) AS n_total FROM toks),
         c AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1)
         SELECT term, cnt,
           ROUND(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share
         FROM c, tot WHERE cnt * 200 >= n_total
         ORDER BY cnt DESC, term""",
    "q_quality_repetition" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents),
         b AS (
           SELECT doc_id, u.bg FROM t,
           UNNEST(list_transform(range(1, len(l)),
                                 i -> l[i] || ' ' || l[i+1])) AS u(bg)),
         c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY 1, 2)
         SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
                COUNT(*) AS n_distinct, CAST(MAX(cnt) AS BIGINT) AS top_n,
                ROUND(CAST(MAX(cnt) AS DOUBLE)
                      / CAST(SUM(cnt) AS DOUBLE), 4) AS top_frac,
                ROUND(CAST(COUNT(*) AS DOUBLE)
                      / CAST(SUM(cnt) AS DOUBLE), 4) AS ttr
         FROM c GROUP BY doc_id ORDER BY doc_id"""
  )
}
