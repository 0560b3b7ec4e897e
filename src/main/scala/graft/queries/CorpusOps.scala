package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.operators.{PrefixFilter, ZOrder}
import graft.sources.Tables
import graft.util.Det._

/** Round-6 second batch: corpus/product analytics and data-layout
  * machinery a 100-TB pipeline runs on top of the relational core.
  *
  *  - q_events_retention / q_events_transitions: the two canonical
  *    product-analytics shapes over an event stream (cohort retention
  *    matrix, Markov transition counts) — both reduce to keyed
  *    aggregates and one window lag, no per-user collect.
  *  - q_sample_reservoir: deterministic fixed-SIZE per-group sample
  *    (the reservoir-sampling contract) via hash-priority top-k — the
  *    same rows on every run/engine, no RNG state.
  *  - q_text_ngram_lm: corpus bigram language-model scoring (the
  *    CCNet/Gopher quality-filter shape) with exact integer counts and
  *    decimal-exact score summation.
  *  - q_dedup_containment: DIRECTED near-dup (sub-document
  *    duplication), prefix-filtered on the contained side only.
  *  - q_embed_quantize: int8 symmetric quantization of the embedding
  *    column — the storage/ANN scale path (4× smaller vectors, exact
  *    int64 dot products).
  *  - q_sink_zorder: Morton-interleaved data layout so 2-d box
  *    predicates hit few row groups (Delta/Iceberg OPTIMIZE ZORDER
  *    analog); locality is asserted in CorpusOpsSpec, the declared
  *    result is layout-independent and hash-oracled.
  */
object CorpusOps {

  /** Deterministic per-doc hash priority in [0, 1e6) — same reduction
    * discipline as PipelineOps' samplers (overflow-safe for any id). */
  private def hashPriority(id: org.apache.spark.sql.Column) =
    pmod(pmod(id, lit(1000000007L)) * 69621L + 13L, lit(1000000L))

  private val usPerWeek = 604800000000L

  /** Directed containment pairs C(a→b) = |A∩B|/|A| >= tau over shingle
    * rows (doc_id, shingle): candidates from the contained-side prefix
    * filter, verified candidate-first with integer threshold
    * arithmetic. Factored out so the spec can run the identical path
    * on synthetic sub-document corpora. tau must be a small rational
    * p/q given as (p, q) to keep the predicate float-free. */
  /** Callers pass an already-materialized shingle frame (LlmOps.shingles
    * localCheckpoints — five consumers read it here: df ranking, prefix
    * join side, full b side, both verify sides). */
  private[graft] def containmentPairs(sh: org.apache.spark.sql.DataFrame,
                                      tauNum: Int, tauDen: Int) = {
    // per-doc shingle PROFILE: the sorted shingle array + its size. Row
    // width is bounded by doc length (the same bytes the shingle rows
    // hold), so the profile table scales like the corpus and joins
    // shuffle-partitioned on doc id.
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("ss"),
           count(lit(1)).as("n_sh"))
    // LENGTH prefilter (sound): |A∩B| <= |B|, so C(a→b) >= t forces
    // t·|A| <= |B| — joined on the NARROW size projection first, so a
    // failing candidate never pulls either side's shingle array (the
    // directed analog of the All-Pairs length filter)
    val cands = PrefixFilter.containmentCandidates(sh, tauNum, tauDen)
      .join(sets.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
            Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
            Seq("doc_b"))
      .filter(col("n_b") * tauDen >= col("n_a") * tauNum)
      .join(sets.select(col("doc_id").as("doc_a"), col("ss").as("sa")),
            Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("ss").as("sb")),
            Seq("doc_b"))
    // verify per PAIR with one codegen'd array_intersect over the two
    // profiles — no candidate×shingle explode, no re-aggregation shuffle
    // (measured 3.3 → 2.4 s at sf0.1 vs the exploded-join verify)
    cands
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .filter(col("n_inter") * tauDen >= col("n_a") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        round(col("n_inter").cast("double") / col("n_a").cast("double"), 6)
          .as("containment"))
  }

  val queries: Map[String, Q] = Map(
    // ---- cohort retention: cohort = a user's first active week; one
    // row per (cohort, week-offset) with the distinct users still
    // active. Two keyed aggregates + one equi-join — at 100 TB the
    // (user, week) dedup is the only heavy shuffle and it is map-side
    // combinable; nothing is per-user state.
    "q_events_retention" -> ((s, d) => {
      val wk = Tables.events(s, d)
        .withColumn("us", epochUs(col("ts")))
        .select(col("user_id"), expr(s"us div $usPerWeek").as("wk"))
        .distinct()
      val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      wk.join(cohort, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_wk", "wk_offset")
    }),

    // ---- event-type transition matrix: per-user consecutive pairs via
    // one window lag (partitioned by user — parallel across users),
    // counted globally. The per-user sort is the only comparison-work;
    // state never exceeds one previous row per user.
    "q_events_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      Tables.events(s, d)
        .withColumn("us", epochUs(col("ts")))
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy("prev_type", "event_type")
        .agg(count(lit(1)).as("n_trans"),
             countDistinct("user_id").as("n_users"))
        .orderBy("prev_type", "event_type")
    }),

    // ---- deterministic fixed-size sample: exactly min(k, |group|)
    // rows per lang, chosen by hash priority — the reservoir-sampling
    // contract without RNG state, reproducible on any engine forever.
    // One window top-k per group; at scale the rank exchange carries
    // k rows per group per partition after partial ranking.
    "q_sample_reservoir" -> ((s, d) => {
      val w = Window.partitionBy("lang")
        .orderBy(col("pri").asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("pri", hashPriority(col("doc_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("rn").cast("long").as("rn"),
                col("doc_id"), col("n_chars"))
        .orderBy("lang", "rn")
    }),

    // ---- WEIGHTED sampling without replacement (Efraimidis–Spirakis
    // exponential clocks): key_i = −ln(u_i)/w_i with w = n_chars — the
    // importance-weighted data-selection primitive (longer docs
    // proportionally likelier, one pass, no RNG state). u is a
    // deterministic integer LCG on doc_id, REDUCED mod 1000003 FIRST so
    // the product fits int64 at any replica tier (doc_id reaches 1e10 at
    // the 100× probe — a raw multiply would overflow under ANSI). The
    // smallest-k keys are the sample: map-only + TakeOrdered top-k, the
    // same partial-reduce shape as q_topk — at 100 TB one scan, k rows
    // per partition shuffled. Keys round to 9 dp before ordering so both
    // engines sort the same totals.
    "q_sample_weighted" -> ((s, d) =>
      graft.Graft
        .weightedSample(Tables.documents(s, d), "doc_id", "n_chars", k = 20)
        .select("doc_id", "n_chars", "es_key")),

    // ---- bigram-LM quality scoring: score each doc by the mean MLE
    // probability of its bigrams under the corpus bigram model —
    // integer counts (exact), one IEEE division per distinct bigram,
    // decimal-exact summation (order-independent across partitions).
    "q_text_ngram_lm" -> ((s, d) => {
      val bg = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("l"))
        .filter(size(col("l")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 2)," +
            " i -> struct(l[i] AS w1, l[i + 1] AS w2))")).as("bg"))
        .select(col("doc_id"), col("bg.w1"), col("bg.w2"))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
      val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
      // fold the counts into a probability table at DISTINCT-bigram
      // grain BEFORE touching occurrences: the w1 join then shuffles
      // the ~V² count rows, not the corpus occurrence rows (measured
      // on the Zipf tier: 10.6M vs 24M rows through that exchange —
      // the occurrence frame crosses exactly one exchange, on the
      // (w1, w2) join, before its doc_id partial agg). p is the same
      // IEEE division per distinct bigram and the decimal sum is
      // order-exact, so the result is bit-identical.
      val p2 = c2.join(c1, Seq("w1"))
        .select(col("w1"), col("w2"),
          (col("n2").cast("double") / col("n1").cast("double")).as("p"))
      bg.join(p2, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
             round(sum(col("p").cast(DecimalType(28, 12))).cast("double")
                     / count(lit(1)), 6).as("lm_score"))
        .orderBy("doc_id")
    }),

    // ---- directed containment dedup: C(a→b) = |A∩B|/|A| >= 0.8 — the
    // sub-document duplication predicate symmetric Jaccard misses (a
    // paragraph quoted inside a bigger doc). Candidates via the
    // contained-side prefix filter (operators.PrefixFilter), verified
    // candidate-first with exact integer threshold arithmetic
    // (5*n_inter >= 4*n_a — no float in the predicate). Runs at CONTENT
    // grain (the DedupOps.grainedNearDup discipline): shingling, the
    // prefix filter, and the verify once per distinct text; ordered doc
    // pairs expand from membership — intra-group pairs are C = 1.0 with
    // n_a = n_b = n_inter = the group's shingle count, inter pairs
    // inherit their rep pair's values verbatim (identical sets), and the
    // directed orientation is preserved (no least/greatest).
    "q_dedup_containment" -> ((s, d) => {
      val g = Tables.documents(s, d).groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep"),
             collect_list(col("doc_id")).as("members"))
        .localCheckpoint(true)
      val sh = LlmOps.shingles(g.select(col("rep").as("doc_id"), col("text")))
      val repPairs = containmentPairs(sh, 4, 5)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        .withColumnRenamed("doc_id", "rep")
      // narrow (rep, doc_id) membership + equi-joins — never a
      // double-explode carrying the member array per intermediate row
      // (quadratic memory on a hot group; see DedupOps.grainedNearDup)
      val m = g.select(col("rep"), explode(col("members")).as("doc_id"))
      val intra = m.join(sizes, Seq("rep"))
        .select(col("rep"), col("n_sh"), col("doc_id").as("doc_a"))
        .join(m.select(col("rep"), col("doc_id").as("doc_b")), Seq("rep"))
        .filter(col("doc_a") =!= col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("n_sh").as("n_a"),
          col("n_sh").as("n_b"), col("n_sh").as("n_inter"),
          lit(1.0).as("containment"))
      val inter = repPairs
        .join(m.select(col("rep").as("doc_a"), col("doc_id").as("da")),
          Seq("doc_a"))
        .join(m.select(col("rep").as("doc_b"), col("doc_id").as("db")),
          Seq("doc_b"))
        .select(col("da").as("doc_a"), col("db").as("doc_b"),
          col("n_a"), col("n_b"), col("n_inter"), col("containment"))
      intra.unionByName(inter).orderBy("doc_a", "doc_b")
    }),

    // ---- int8 symmetric embedding quantization: per-vector scale =
    // 127/max|v|, exact int64 row stats, max reconstruction error.
    // Pure per-row HOF projection — no shuffle until the final sort;
    // at 100 TB this is the 4×-storage-reduction pass before ANN.
    "q_embed_quantize" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      Tables.embeddings(s, d)
        .select(col("vec_id"), v.as("v"))
        .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
        // all-zero vector guard: 0/0 would emit NaN codes; map to zero
        // codes instead (result-neutral on the fixtures — no zero
        // vectors exist — but a real corpus has padding rows)
        .withColumn("q", when(col("maxabs") === 0.0,
            transform(col("v"), _ => lit(0L)))
          .otherwise(transform(col("v"),
            x => round(x * lit(127.0) / col("maxabs"), 0).cast("long"))))
        .select(col("vec_id"),
          size(col("v")).cast("long").as("n_dims"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"),
          aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("l1_q"),
          round(array_max(zip_with(col("v"), col("q"),
            (x, qq) => abs(x - qq * col("maxabs") / lit(127.0)))), 6)
            .as("max_err"))
        .orderBy("vec_id")
    }),

    // ---- Z-ordered layout sink: write lineitem ordered by the Morton
    // interleave of (orderkey, partkey) low bits, re-read, answer a 2-d
    // box query. The declared RESULT is layout-independent (oracled
    // against the raw table); the LAYOUT win — box rows clustered into
    // few files/row-groups instead of smeared over all of them — is
    // asserted in CorpusOpsSpec against an orderkey-sorted twin.
    // ---- deterministic global corpus shuffle — training-order
    // randomization as pure arithmetic, the step between "cleaned
    // corpus" and "training shards". Each doc's shuffle key is
    // md5('shuf:<id>:<seed>') — reproducible on every engine and every
    // rerun (no RNG state, the q_sample_* discipline); the first two
    // hex chars form the SHARD (256 ways), and the position within a
    // shard is a row_number over the key. The two-level shape is the
    // 100-TB story: a corpus-GLOBAL row_number would serialize into one
    // window partition, while 256 (or 4096 — one more hex char) shard
    // windows sort independently, one per writer task, and the
    // concatenation of shards in label order IS the shuffled order
    // because the shard label is itself a key prefix.
    "q_shuffle_global" -> ((s, d) => {
      val key = md5(concat_ws(":",
        lit("shuf"), col("doc_id").cast("string"), lit("42")))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("skey"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), key.as("skey"))
        .withColumn("shard", substring(col("skey"), 1, 2))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    }),

    "q_sink_zorder" -> ((s, d) => {
      val tmp = Scans.scratch("zorder", s, d)
      val li = Tables.lineitem(s, d)
        .withColumn("zx", pmod(col("l_orderkey"), lit(65536L)))
        .withColumn("zy", pmod(col("l_partkey"), lit(65536L)))
      // one 4-value stats row, broadcast under every executor's nose —
      // the min-max scaling pass every ZORDER OPTIMIZE runs first
      val stats = li.agg(min("zx").as("mnx"), max("zx").as("mxx"),
                         min("zy").as("mny"), max("zy").as("mxy"))
      li.crossJoin(broadcast(stats))
        .withColumn("z", ZOrder.morton(
          ZOrder.scaleTo16(col("zx"), col("mnx"), col("mxx")),
          ZOrder.scaleTo16(col("zy"), col("mny"), col("mxy"))))
        .drop("mnx", "mxx", "mny", "mxy")
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions("z")
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("zx").between(1000L, 1299L) &&
                col("zy").between(500L, 799L))
        .agg(count(lit(1)).as("n_rows"),
             round(dsum(col("l_extendedprice")), 2).as("sum_price"),
             min("l_orderkey").as("min_ok"), max("l_orderkey").as("max_ok"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q_events_retention" ->
      s"""WITH wk AS (
            SELECT DISTINCT user_id, epoch_us(ts) // $usPerWeek AS wk
            FROM events),
          co AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wk GROUP BY 1)
          SELECT c.cohort_wk, w.wk - c.cohort_wk AS wk_offset,
                 COUNT(DISTINCT w.user_id) AS n_users
          FROM wk w JOIN co c ON w.user_id = c.user_id
          GROUP BY 1, 2 ORDER BY cohort_wk, wk_offset""",
    "q_events_transitions" ->
      """WITH t AS (
           SELECT user_id, event_type,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type
           FROM events)
         SELECT prev_type, event_type, COUNT(*) AS n_trans,
                COUNT(DISTINCT user_id) AS n_users
         FROM t WHERE prev_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY prev_type, event_type""",
    "q_sample_reservoir" ->
      """WITH p AS (
           SELECT lang, doc_id, n_chars,
             (((doc_id % 1000000007 + 1000000007) % 1000000007)
               * 69621 + 13) % 1000000 AS pri
           FROM documents),
         r AS (
           SELECT *, ROW_NUMBER() OVER
             (PARTITION BY lang ORDER BY pri ASC, doc_id ASC) AS rn
           FROM p)
         SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
         FROM r WHERE rn <= 20 ORDER BY lang, rn""",
    "q_sample_weighted" ->
      """SELECT doc_id, n_chars,
         round(-ln(CAST(((doc_id % 1000003) * 2654435761 + 12345)
                        % 1000000006 + 1 AS DOUBLE) / 1000000007.0)
               / n_chars, 9) AS es_key
         FROM documents
         WHERE n_chars > 0
         ORDER BY es_key ASC, doc_id ASC LIMIT 20""",
    "q_text_ngram_lm" ->
      """WITH tok AS (
           SELECT doc_id, string_split(text, ' ') AS l FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg AS (
           SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
           FROM tok, UNNEST(range(1, len(l))) AS u(i)),
         c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
         scored AS (
           SELECT bg.doc_id,
             CAST(c2.n2 AS DOUBLE) / CAST(c1.n1 AS DOUBLE) AS p
           FROM bg JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
                   JOIN c1 ON bg.w1 = c1.w1)
         SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*), 6) AS lm_score
         FROM scored GROUP BY 1 ORDER BY doc_id""",
    "q_dedup_containment" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, u.s AS shingle FROM documents,
           UNNEST(list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2]))) AS u(s)),
         sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
         inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
           FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id <> b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, sa.n_sh AS n_a, sb.n_sh AS n_b, n_inter,
           ROUND(CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6)
             AS containment
         FROM inter
         JOIN sizes sa ON doc_a = sa.doc_id
         JOIN sizes sb ON doc_b = sb.doc_id
         WHERE n_inter * 5 >= sa.n_sh * 4
         ORDER BY doc_a, doc_b""",
    "q_embed_quantize" ->
      """WITH e AS (
           SELECT vec_id, embedding AS emb,
             CAST(list_max(list_transform(embedding, x -> abs(x)))
               AS DOUBLE) AS maxabs
           FROM embeddings),
         x AS (
           SELECT vec_id, maxabs,
             CAST(emb[i] AS DOUBLE) AS v,
             CAST(ROUND(CAST(emb[i] AS DOUBLE) * 127.0 / maxabs)
               AS BIGINT) AS q
           FROM e, UNNEST(range(1, len(emb) + 1)) AS t(i))
         SELECT vec_id, COUNT(*) AS n_dims,
           CAST(SUM(q) AS BIGINT) AS sum_q,
           CAST(SUM(ABS(q)) AS BIGINT) AS l1_q,
           ROUND(MAX(ABS(v - q * maxabs / 127.0)), 6) AS max_err
         FROM x GROUP BY 1 ORDER BY vec_id""",
    "q_shuffle_global" ->
      """WITH t AS (SELECT doc_id,
             md5(concat_ws(':', 'shuf', CAST(doc_id AS VARCHAR), '42'))
               AS skey
           FROM documents)
         SELECT doc_id, substring(skey, 1, 2) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY substring(skey, 1, 2)
             ORDER BY skey, doc_id) AS BIGINT) AS pos
         FROM t ORDER BY shard, pos""",
    "q_sink_zorder" ->
      """SELECT COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4)))
             AS DOUBLE), 2) AS sum_price,
           MIN(l_orderkey) AS min_ok, MAX(l_orderkey) AS max_ok
         FROM lineitem
         WHERE l_orderkey % 65536 BETWEEN 1000 AND 1299
           AND l_partkey % 65536 BETWEEN 500 AND 799"""
  )
}
