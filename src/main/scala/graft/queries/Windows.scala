package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.sources.Tables
import graft.util.Det._

/** Window functions (§2.5) and event-time windows (§2.9 batch twins).
  *
  * Ranking/analytic/frame windows shuffle once on the partition key and
  * sort locally — the same shape at 1000 executors. The event-time windows
  * (tumbling/sliding/session) are the batch twins of the streaming
  * operators in graft.streaming; window() / session_window() here is the
  * exact function Structured Streaming uses incrementally.
  */
object Windows {
  private def byCust = Window.partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  val queries: Map[String, Q] = Map(
    // rank outputs cast to BIGINT: Spark's row_number/rank are INT, DuckDB's
    // are BIGINT, and the hash compare is type-sensitive at the parquet level.
    "q_win_rank" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byCust).cast("long").as("rn"),
          rank().over(byCust).cast("long").as("rk"),
          dense_rank().over(byCust).cast("long").as("drk"))
        .filter(col("rn") <= 5)
        .orderBy("o_custkey", "rn")
    }),

    "q_win_topk_group" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(byCust).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist over
    // the per-customer price order (same single-shuffle shape as q_win_rank).
    "q_win_dist" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(byCust).cast("long").as("quartile"),
          round(percent_rank().over(byCust), 6).as("pct_rank"),
          round(cume_dist().over(byCust), 6).as("cdist"))
        .orderBy("o_custkey", "pct_rank", "o_orderkey")
    }),

    "q_win_analytic" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
                epochUs(col("ts")).as("ts_us"), col("value"))
        .withColumn("prev_value", lag("value", 1).over(w))
        .withColumn("next_value", lead("value", 1).over(w))
        .withColumn("delta", col("value") - col("prev_value"))
        .orderBy("event_id")
    }),

    "q_win_frame_rows" -> ((s, d) => {
      // Running revenue per customer; decimal accumulate → order-exact.
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
                epochMs(col("o_orderdate")).as("odate_ms"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).over(w)
            .cast("double").as("running_price"))
        .orderBy("o_custkey", "odate_ms", "o_orderkey")
    }),

    "q_win_frame_range" -> ((s, d) => {
      // Trailing-7-day order count per customer: RANGE frame over epoch-day.
      val w = Window.partitionBy("o_custkey").orderBy(col("epoch_day"))
        .rangeBetween(-6, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("epoch_day",
          datediff(to_date(col("o_orderdate")), lit("1970-01-01")).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("epoch_day"),
                count(lit(1)).over(w).as("n_7d"))
        .orderBy("o_custkey", "epoch_day", "o_orderkey")
    }),

    "q_win_frame_time" -> ((s, d) => {
      // Trailing 1-HOUR aggregates per event (time-interval RANGE frame
      // over epoch-µs) — the per-row sliding aggregate a feature pipeline
      // computes ("events/value in the last hour as of each event").
      // Range frames aggregate ALL order-value peers, so duplicate
      // timestamps cannot make the result order-dependent.
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", epochUs(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_us"),
                count(lit(1)).over(w).as("n_1h"),
                sum(col("value").cast(DecimalType(28, 4))).over(w)
                  .cast("double").as("sum_1h"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // ---- event-time windows: batch twins of graft.streaming (§2.9) ----

    "q_tumbling" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(epochUs(col("window.start")).as("ws_us"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy("ws_us", "event_type")
    }),

    "q_sliding" -> ((s, d) => {
      // 10-minute windows sliding every 5 — each event lands in exactly 2.
      Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"),
                 col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(epochUs(col("window.start")).as("ws_us"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy("ws_us", "event_type")
    }),

    "q_session" -> ((s, d) => {
      // Per-user sessions, 30-min inactivity gap. session_window end =
      // last event + gap; events merge while the gap is STRICTLY below
      // 30 min — the oracle's gaps-and-islands SQL implements the same rule.
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
                epochUs(col("session_window.start")).as("session_start_us"),
                epochUs(col("session_window.end")).as("session_end_us"),
                col("n_events"), col("sum_value"))
        .orderBy("user_id", "session_start_us")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
             DENSE_RANK() OVER w AS drk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC))
         WHERE rn <= 5 ORDER BY o_custkey, rn""",
    "q_win_topk_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_win_dist" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
         round(PERCENT_RANK() OVER w, 6) AS pct_rank,
         round(CUME_DIST() OVER w, 6) AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_custkey, pct_rank, o_orderkey""",
    "q_win_analytic" ->
      """SELECT event_id, user_id, ts_us, value,
         LAG(value) OVER w AS prev_value, LEAD(value) OVER w AS next_value,
         value - LAG(value) OVER w AS delta
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
         ORDER BY event_id""",
    "q_win_frame_time" ->
      """SELECT event_id, user_id, ts_us,
         COUNT(*) OVER w AS n_1h,
         CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS sum_1h
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
               FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, ts_us, event_id""",
    "q_win_frame_rows" ->
      """SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4)))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS running_price
         FROM orders ORDER BY o_custkey, odate_ms, o_orderkey""",
    "q_win_frame_range" ->
      """SELECT o_custkey, o_orderkey, epoch_day,
         COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch_day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_7d
         FROM (SELECT o_custkey, o_orderkey,
                 date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS epoch_day
               FROM orders)
         ORDER BY o_custkey, epoch_day, o_orderkey""",
    "q_tumbling" ->
      s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
          event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""",
    "q_sliding" ->
      s"""SELECT ws_us, event_type, COUNT(*) AS n,
          ${sqlDsum("value")} AS sum_value
          FROM (SELECT (epoch_us(ts) // 300000000) * 300000000 - off.off
                  AS ws_us, event_type, value
                FROM events
                CROSS JOIN (SELECT UNNEST([0, 300000000]) AS off) off)
          GROUP BY ws_us, event_type ORDER BY ws_us, event_type""",
    "q_session" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, value FROM events),
          m AS (SELECT *, CASE WHEN tus - LAG(tus) OVER
                  (PARTITION BY user_id ORDER BY tus) >= 1800000000
                THEN 1 ELSE 0 END AS brk FROM e),
          s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tus
                  ROWS UNBOUNDED PRECEDING) AS sid FROM m)
          SELECT user_id, MIN(tus) AS session_start_us,
                 MAX(tus) + 1800000000 AS session_end_us,
                 COUNT(*) AS n_events, ${sqlDsum("value")} AS sum_value
          FROM s GROUP BY user_id, sid
          ORDER BY user_id, session_start_us"""
  )
}
