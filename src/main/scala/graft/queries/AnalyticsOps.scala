package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.sources.Tables
import graft.util.Det._

/** Round-6 third batch: time-series repair, snapshot reconciliation and
  * corpus-statistics surfaces a production pipeline leans on between the
  * relational core and the LLM-data operators.
  *
  *  - q_timeseries_fill: gap-fill a keyed hourly series to a dense grid
  *    and forward-fill missing points (the feature-store/monitoring
  *    repair shape) — grid rows are generated, never shuffled wide.
  *  - q_table_diff: two-snapshot reconciliation (added/removed/changed/
  *    unchanged) through ONE full-outer join — the audit twin of
  *    q_merge_upsert (which APPLIES a changeset; this DERIVES one).
  *  - q_quality_dupngrams: per-doc fraction of word-3-gram shingles
  *    shared with ANY other document — the cross-document duplicated
  *    n-gram quality filter (boilerplate detector) that intra-doc
  *    repetition stats (q_quality_repetition) cannot see.
  *  - q_text_collocations: PMI-ranked bigram collocations under a
  *    minimum-support cut — the vocabulary/tokenizer-induction statistic
  *    (BPE merge candidates are exactly high-count high-PMI pairs).
  *  - q_join_lateral: the correlated LATERAL join surface (top-k rows of
  *    a subquery PER outer row) — decorrelated by Catalyst into a
  *    ranked window join, never an O(N²) nested loop.
  */
object AnalyticsOps {

  private val usPerHour = 3600000000L

  val queries: Map[String, Q] = Map(
    // ---- dense-grid gap fill + forward fill: hourly sum(value) per
    // event_type, re-gridded onto every hour between the corpus min/max
    // (sequence-explode of a 1-row broadcast bounds aggregate — the grid
    // is GENERATED next to each group, not shuffled), missing hours
    // carried forward with last-non-null over an ordered window. At
    // 100 TB the observed aggregate is the only corpus-sized shuffle;
    // the grid is |keys| × |hours| and the fill window is one
    // sequential pass per key (keys parallelize across executors).
    "q_timeseries_fill" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"${epochUsSql("ts")} div $usPerHour").as("hr"),
          col("value"))
        .groupBy("event_type", "hr")
        .agg(round(sum(col("value").cast(DecimalType(28, 6))).cast("double"), 4)
          .as("v_obs"))
      graft.Graft.gapFillForward(hourly, "event_type", "hr", "v_obs")
        .select(col("event_type"), col("hr"),
          col("is_gap").cast("int").cast("long").as("gap"),
          col("v_obs").as("v_fill"))
        .orderBy("event_type", "hr")
    }),

    // ---- snapshot reconciliation: derive the changeset between two
    // table versions through ONE full-outer equi-join on the key, then
    // classify each row. The "new" snapshot is simulated by a
    // deterministic rule (delete key%10=7, +5% price on key%10=3,
    // insert a key-shifted copy of key%10=5) so both engines build the
    // identical pair of versions. All money in decimal (the
    // q_merge_upsert lesson — double rounding drifts across engines).
    // At scale this is the data-quality audit run after every backfill:
    // one join, map-side-combinable count/sum rollup, no collects.
    "q_table_diff" -> ((s, d) => {
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(28, 2))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"), dec(col("o_totalprice")).as("p"),
          pmod(col("o_orderkey"), lit(10L)).as("m"))
      val bumped = round(col("p") *
        lit(new java.math.BigDecimal("1.05")), 2).cast(DecimalType(28, 2))
      val newSnap = o.filter(col("m") =!= 7L)
        .select(col("k"),
          when(col("m") === 3L, bumped).otherwise(col("p")).as("p"))
        .unionAll(o.filter(col("m") === 5L)
          .select((col("k") + 1000000000L).as("k"), col("p")))
      o.select(col("k"), col("p").as("p_old"))
        .join(newSnap.select(col("k"), col("p").as("p_new")),
          Seq("k"), "full_outer")
        .withColumn("class",
          when(col("p_old").isNull, "added")
            .when(col("p_new").isNull, "removed")
            .when(col("p_old") =!= col("p_new"), "changed")
            .otherwise("unchanged"))
        .groupBy("class")
        .agg(count(lit(1)).as("n"),
          round(sum(coalesce(col("p_new"), col("p_old"))).cast("double"), 2)
            .as("total"))
        .orderBy("class")
    }),

    // ---- cross-document duplicated-n-gram fraction (the RefinedWeb /
    // CCNet boilerplate filter): per doc, the share of its distinct
    // 3-gram shingles that occur in at least one OTHER document. One
    // map-side-combinable document-frequency aggregate + one equi-join
    // back on the 64-bit shingle hash — counts are hash-invariant, so
    // the text-shingle oracle matches the hashed plan exactly.
    "q_quality_dupngrams" -> ((s, d) =>
      graft.Graft.dupNgramStats(Tables.documents(s, d)).orderBy("doc_id")),

    // ---- PMI collocations: pointwise mutual information of adjacent
    // token pairs under a min-support cut — the tokenizer-induction /
    // phrase-mining statistic. Three count-aggregates over one bigram
    // explode (all map-side combinable, keyed by bounded vocabulary),
    // marginals joined back, ONE exactly-rounded IEEE division inside
    // ln() so both engines see bit-identical inputs.
    "q_text_collocations" -> ((s, d) =>
      graft.Graft.collocations(Tables.documents(s, d))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(20)),

    // ---- SCD2 (slowly-changing-dimension type 2) build: turn a keyed
    // changelog into validity INTERVALS — each change row becomes a
    // version with valid_from = its time and valid_to = the next
    // change's time (null = current version). ONE window lead per key
    // (state = one following row), the canonical warehouse-dimension
    // materialization that latestPerKey (keep newest only) cannot
    // express. At 100 TB the per-key window parallelizes across users
    // and the only shuffle is the key partitioning.
    "q_scd2" -> ((s, d) => {
      val changelog = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          epochUs(col("ts")).as("us"), col("event_type"))
      graft.Graft.scd2(changelog, "user_id", "us", tieBreak = Seq("event_id"))
        .select(col("user_id"), col("version"), col("event_id"),
          col("us").as("valid_from_us"), col("valid_to").as("valid_to_us"),
          col("event_type"), col("is_current"))
        .orderBy("user_id", "version")
    }),

    // ---- series anomaly flags: per-type hourly event counts scored by
    // the z-score against that type's own distribution — the monitoring/
    // data-quality gate shape. Moments are EXACT integer sums (n, Σx,
    // Σx²) so both engines evaluate the identical IEEE sqrt/division
    // formula on identical inputs — the q_agg_stats discipline; rows
    // with |z| ≥ 2 survive. Two map-side-combinable aggregates + one
    // broadcast-size join back; nothing is per-series state.
    "q_events_anomaly" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .select(col("event_type"),
          expr(s"${epochUsSql("ts")} div $usPerHour").as("hr"))
        .groupBy("event_type", "hr").agg(count(lit(1)).as("cnt"))
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"), sum("cnt").as("s1"),
          sum(col("cnt") * col("cnt")).as("s2"))
      hourly.join(broadcast(stats), Seq("event_type"))
        .filter(col("n_hours") >= 2)
        .withColumn("mean",
          col("s1").cast("double") / col("n_hours").cast("double"))
        .withColumn("sd", sqrt(
          (col("s2").cast("double") - col("s1").cast("double") * col("mean"))
            / (col("n_hours") - 1).cast("double")))
        .filter(col("sd") > 0.0 &&
          abs(col("cnt").cast("double") - col("mean")) >= lit(2.0) * col("sd"))
        .select(col("event_type"), col("hr"), col("cnt"),
          round(col("mean"), 4).as("mean"),
          round((col("cnt").cast("double") - col("mean")) / col("sd"), 4)
            .as("z"))
        .orderBy("event_type", "hr")
    }),

    // ---- correlated LATERAL join: the top-3 customers by balance FOR
    // EACH nation, written as the SQL-standard lateral subquery (the
    // per-row-top-k API shape). Catalyst decorrelates the LIMIT-inside-
    // correlation into a ranked window join — verified in PlanShapeSpec:
    // no nested-loop per-outer-row re-execution survives in the plan.
    "q_join_lateral" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("g_lat_nation")
      Tables.customer(s, d).createOrReplaceTempView("g_lat_customer")
      s.sql("""
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM g_lat_nation n
        JOIN LATERAL (
          SELECT c.c_custkey, round(c.c_acctbal, 2) AS c_acctbal
          FROM g_lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c.c_acctbal DESC, c.c_custkey
          LIMIT 3
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
      """)
    })
  )

  /** Spark-side SQL fragment for epoch µs of a ns-loaded ts column —
    * Tables.events already exposes a µs TIMESTAMP, so this is plain
    * unix_micros (kept as a helper for readability in expr strings). */
  private def epochUsSql(c: String): String = s"unix_micros($c)"

  val oracle: Map[String, String] = Map(
    "q_timeseries_fill" ->
      """WITH ev AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr, value
           FROM events),
         hourly AS (
           SELECT event_type, hr,
                  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 4)
                    AS v_obs
           FROM ev GROUP BY 1, 2),
         bounds AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM ev),
         grid AS (
           SELECT t.event_type, UNNEST(generate_series(b.mn, b.mx)) AS hr
           FROM (SELECT DISTINCT event_type FROM ev) t, bounds b)
         SELECT g.event_type, g.hr,
                CAST(CASE WHEN h.v_obs IS NULL THEN 1 ELSE 0 END AS BIGINT)
                  AS gap,
                LAST_VALUE(h.v_obs IGNORE NULLS) OVER (
                  PARTITION BY g.event_type ORDER BY g.hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
         FROM grid g LEFT JOIN hourly h
           ON g.event_type = h.event_type AND g.hr = h.hr
         ORDER BY g.event_type, g.hr""",
    "q_table_diff" ->
      """WITH o AS (
           SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(28,2)) AS p,
                  (o_orderkey % 10 + 10) % 10 AS m
           FROM orders),
         n AS (
           SELECT k, CASE WHEN m = 3
                          THEN CAST(ROUND(p * CAST('1.05' AS DECIMAL(3,2)), 2)
                                    AS DECIMAL(28,2))
                          ELSE p END AS p
           FROM o WHERE m <> 7
           UNION ALL
           SELECT k + 1000000000, p FROM o WHERE m = 5),
         d AS (
           SELECT CASE WHEN o.k IS NULL THEN 'added'
                       WHEN n.k IS NULL THEN 'removed'
                       WHEN o.p <> n.p THEN 'changed'
                       ELSE 'unchanged' END AS class,
                  COALESCE(n.p, o.p) AS p
           FROM o FULL OUTER JOIN n ON o.k = n.k)
         SELECT class, COUNT(*) AS n,
                ROUND(CAST(SUM(p) AS DOUBLE), 2) AS total
         FROM d GROUP BY 1 ORDER BY class""",
    "q_quality_dupngrams" ->
      """WITH sh AS (
           SELECT DISTINCT doc_id, u.s AS shingle FROM documents,
           UNNEST(list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - 1),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i+1] || ' ' ||
                  string_split(text, ' ')[i+2]))) AS u(s)),
         df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
         SELECT s.doc_id, COUNT(*) AS n_shingles,
                COUNT(CASE WHEN df.df >= 2 THEN 1 END) AS n_dup,
                ROUND(CAST(COUNT(CASE WHEN df.df >= 2 THEN 1 END) AS DOUBLE)
                      / COUNT(*), 6) AS dup_frac
         FROM sh s JOIN df ON s.shingle = df.shingle
         GROUP BY 1 ORDER BY doc_id""",
    "q_text_collocations" ->
      """WITH toks AS (
           SELECT string_split(text, ' ') AS l FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
         bg AS (
           SELECT l[i] AS w1, l[i + 1] AS w2
           FROM toks, UNNEST(range(1, len(l))) AS u(i)),
         c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY 1, 2),
         c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
         cb AS (SELECT w2, COUNT(*) AS nb FROM bg GROUP BY 1),
         tot AS (SELECT COUNT(*) AS n_total FROM bg)
         SELECT w1, w2, n2,
                ROUND(LN(CAST(n2 * n_total AS DOUBLE)
                         / CAST(n1 * nb AS DOUBLE)), 6) AS pmi
         FROM c2 JOIN c1 USING (w1) JOIN cb USING (w2) CROSS JOIN tot
         WHERE n2 >= 5
         ORDER BY pmi DESC, w1, w2 LIMIT 20""",
    "q_scd2" ->
      """SELECT user_id,
                CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
                event_id,
                epoch_us(ts) AS valid_from_us,
                LEAD(epoch_us(ts), 1) OVER w AS valid_to_us,
                event_type,
                (LEAD(epoch_us(ts), 1) OVER w IS NULL) AS is_current
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
         ORDER BY user_id, version""",
    "q_events_anomaly" ->
      """WITH hourly AS (
           SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                  COUNT(*) AS cnt
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, COUNT(*) AS n_hours,
                  CAST(SUM(cnt) AS BIGINT) AS s1,
                  CAST(SUM(cnt * cnt) AS BIGINT) AS s2
           FROM hourly GROUP BY 1),
         calc AS (
           SELECT h.event_type, h.hr, h.cnt,
                  CAST(s.s1 AS DOUBLE) / CAST(s.n_hours AS DOUBLE) AS mean,
                  SQRT((CAST(s.s2 AS DOUBLE)
                        - CAST(s.s1 AS DOUBLE)
                          * (CAST(s.s1 AS DOUBLE) / CAST(s.n_hours AS DOUBLE)))
                       / CAST(s.n_hours - 1 AS DOUBLE)) AS sd
           FROM hourly h JOIN stats s USING (event_type)
           WHERE s.n_hours >= 2)
         SELECT event_type, hr, cnt, ROUND(mean, 4) AS mean,
                ROUND((CAST(cnt AS DOUBLE) - mean) / sd, 4) AS z
         FROM calc
         WHERE sd > 0 AND ABS(CAST(cnt AS DOUBLE) - mean) >= 2.0 * sd
         ORDER BY event_type, hr""",
    "q_join_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
         FROM nation n CROSS JOIN LATERAL (
           SELECT c.c_custkey, ROUND(c.c_acctbal, 2) AS c_acctbal
           FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c.c_acctbal DESC, c.c_custkey
           LIMIT 3
         ) t
         ORDER BY n_name, c_acctbal DESC, c_custkey"""
  )
}
