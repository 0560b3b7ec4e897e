package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.operators.{AsOf, BloomJoin, RangeJoin, SaltedJoin}
import graft.sources.Tables
import graft.util.Det._

/** Joins — SURVEY.md §2.3, the heart of the reference (a Kafka-Streams
  * join example). Every flavor: inner/left/right/full/semi/anti/cross,
  * theta (non-equi residual), interval (the flagship stream-stream-join
  * batch twin), as-of (stream-table), broadcast (GlobalKTable), multiway,
  * and FK-join + re-aggregate.
  *
  * Scale notes: dimension joins (nation/region/customer at dim scale) stay
  * broadcast-able — Catalyst's JoinSelection picks BroadcastHashJoin under
  * the 10 MB threshold and AQE re-plans at runtime; fact-fact joins shuffle
  * on their equi keys only. The interval join keeps its equi key (user_id)
  * as the shuffle key so the time-range residual evaluates within a
  * sort-merge join, never as a cross product.
  */
object Joins {
  /** 10 minutes in microseconds — flagship join window. */
  private val TenMinUs = 600000000L

  val queries: Map[String, Q] = Map(
    "q_join_inner" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_join_left" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
             dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
        .orderBy("c_custkey")
    }),

    "q_join_right" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"),
             dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
        .orderBy("c_custkey")
    }),

    "q_join_full" -> ((s, d) => {
      Tables.nation(s, d)
        .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"),
              "full_outer")
        .select(col("n_nationkey"), col("n_name"), col("s_suppkey"),
                col("s_name"))
        .orderBy(col("n_nationkey").asc_nulls_first,
                 col("s_suppkey").asc_nulls_first)
    }),

    "q_join_semi" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
              "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q_join_anti" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
              "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    "q_join_cross" -> ((s, d) => {
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_regionkey", "r_name", "n_nationkey", "n_name")
        .orderBy("r_regionkey", "n_nationkey")
    }),

    "q_join_theta" -> ((s, d) => {
      // Equi key (partkey) carries the shuffle; the band predicate on
      // quantity-vs-size stays a cheap residual inside the join.
      Tables.lineitem(s, d)
        .join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity").between(col("p_size") - 5.0, col("p_size") + 5.0))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Flagship — batch twin of the reference's stream-stream windowed join
    // (view→purchase attribution within 10 minutes, per user). Streaming
    // twin: graft.streaming.Streams.viewPurchaseJoin.
    "q_join_interval" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
                epochUs(col("ts")).as("view_ts_us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
                epochUs(col("ts")).as("purchase_ts_us"),
                col("value").as("purchase_value"))
      v.join(p, col("v_user") === col("p_user") &&
          col("purchase_ts_us") >= col("view_ts_us") &&
          col("purchase_ts_us") <= col("view_ts_us") + TenMinUs)
        .select(col("v_user").as("user_id"), col("view_id"),
                col("purchase_id"), col("view_ts_us"), col("purchase_ts_us"),
                col("purchase_value"))
        .orderBy("view_id", "purchase_id")
    }),

    // As-of join (stream-table semantics): latest order at-or-before each
    // event's time, per user/customer key. Right side deduped to one row
    // per (key, time) for determinism; see graft.operators.AsOf.
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"))
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey"), epochMs(col("o_orderdate")).as("odate_ms"))
        .agg(max("o_orderkey").as("o_orderkey"))
        .select(col("o_custkey"), (col("odate_ms") * 1000L).as("ots_us"),
                col("o_orderkey"))
      AsOf.join(ev, ord, "user_id", "o_custkey", "ts_us", "ots_us",
                Seq("o_orderkey", "ots_us"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
                col("o_orderkey").as("asof_orderkey"),
                col("ots_us").as("asof_odate_us"))
        .orderBy("event_id")
    }),

    // Forward as-of: the EARLIEST order at-or-after each event's time —
    // "next purchase after exposure" attribution. Same merge-sort plan as
    // the backward form, mirrored (operators.AsOf forward=true).
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"))
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey"), epochMs(col("o_orderdate")).as("odate_ms"))
        .agg(max("o_orderkey").as("o_orderkey"))
        .select(col("o_custkey"), (col("odate_ms") * 1000L).as("ots_us"),
                col("o_orderkey"))
      AsOf.join(ev, ord, "user_id", "o_custkey", "ts_us", "ots_us",
                Seq("o_orderkey", "ots_us"), forward = true)
        .select(col("event_id"), col("user_id"), col("ts_us"),
                col("o_orderkey").as("next_orderkey"),
                col("ots_us").as("next_odate_us"))
        .orderBy("event_id")
    }),

    // Nearest-in-time as-of (the ML feature-join variant: attach
    // whichever same-key order is CLOSER in time, backward winning
    // ties). One shuffle + one sort via operators.AsOf.joinNearest —
    // the right side rides the union twice so both direction carries
    // share a single window pass; never a range join.
    "q_join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("ts_us"))
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey"), epochMs(col("o_orderdate")).as("odate_ms"))
        .agg(max("o_orderkey").as("o_orderkey"))
        .select(col("o_custkey"), (col("odate_ms") * 1000L).as("ots_us"),
                col("o_orderkey"))
      AsOf.joinNearest(ev, ord, "user_id", "o_custkey", "ts_us", "ots_us",
                Seq("o_orderkey", "ots_us"))
        .select(col("event_id"), col("user_id"), col("ts_us"),
                col("o_orderkey").as("nearest_orderkey"),
                col("ots_us").as("nearest_odate_us"),
                col("delta").as("delta_us"))
        .orderBy("event_id")
    }),

    "q_join_bcast" -> ((s, d) => {
      // GlobalKTable analog: explicit broadcast of the dim side.
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
             dsum(col("s_acctbal")).as("sum_acctbal"))
        .orderBy("n_name")
    }),

    "q_join_multiway" -> ((s, d) => {
      // Revenue via exact decimal factors (2-dp fixture data) — see
      // q_agg_hash: double-product-then-cast drifts across engines.
      val revenue = col("l_extendedprice").cast(DecimalType(12, 2)) *
        (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(revenue).cast("double").as("revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    // The SQL-string front door as a DECLARED surface (SURVEY §3.2
    // entry 2): register the fixtures as temp views and submit ONE
    // shared ANSI text — the SAME string is the DuckDB oracle — through
    // SparkSqlParser into the identical Catalyst pipeline every
    // DataFrame entry uses. A TPC-H-Q3-shaped segment-revenue top-10:
    // two shuffle joins + grouped decimal-exact revenue + top-k.
    "q_sql_entry" -> ((s, d) => {
      for (t <- Seq("customer", "orders", "lineitem"))
        Tables.load(s, d, t).createOrReplaceTempView(t)
      s.sql(sqlEntryText)
    }),

    // Skew-mitigated join (salting): events (hot user_ids at scale) ⋈
    // customer, salted 8 ways. Result — and therefore the oracle SQL —
    // is identical to the plain equi-join; see operators/SaltedJoin.
    "q_join_salted" -> ((s, d) => {
      SaltedJoin.join(
          Tables.events(s, d), Tables.customer(s, d),
          "user_id", "c_custkey",
          Seq(col("event_id")), n = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("c_mktsegment")
    }),

    "q_join_fk_agg" -> ((s, d) => {
      // KIP-213 foreign-key join analog: supplier→nation→region, then
      // re-aggregate per region.
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
              col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_suppliers"),
             dsum(col("s_acctbal")).as("sum_acctbal"))
        .orderBy("r_name")
    }),

    // Bloom semi-join reduction: the dim side (urgent orders, ~20% of
    // orders — too many ROWS to broadcast at 100 TB, but the KEY SET is a
    // megabyte sketch) prunes the fact scan before the join exchange via
    // a scalar-subquery BloomFilterAggregate. Result ≡ the plain join —
    // false positives only re-enter the exact join that follows — so the
    // oracle is the plain join SQL. See operators/BloomJoin.scala.
    "q_join_bloom" -> ((s, d) => {
      val dim = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
      BloomJoin.join(
          Tables.lineitem(s, d), dim, "l_orderkey", "o_orderkey",
          expectedItems = 1000000L)
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("l_returnflag")
    }),

    // Pure range join — NO equi key: parts priced within 20 cents of each
    // other (competitor-pricing shape). Naively a cartesian/BNL join;
    // operators.RangeJoin bucketizes the price into 20-cent cells so it
    // runs as a shuffle equi-join on the cell id. Prices scale to integer
    // cents first — exact bucket math, exact residual. Output aggregates
    // per left brand, so the result stays small while the join does the
    // real pair work (~1M pairs at sf0.1).
    "q_join_range" -> ((s, d) => {
      val cents = round(col("p_retailprice") * 100).cast("long")
      val a = Tables.part(s, d)
        .select(col("p_partkey").as("a_key"), col("p_brand").as("a_brand"),
                cents.as("a_cents"))
      val b = Tables.part(s, d)
        .select(col("p_partkey").as("b_key"), cents.as("b_cents"))
      RangeJoin.join(a, b, "a_cents", "b_cents", band = 20L)
        .filter(col("a_key") < col("b_key"))
        .groupBy("a_brand")
        .agg(count(lit(1)).as("n_pairs"),
             sum(abs(col("a_cents") - col("b_cents"))).as("sum_diff_cents"))
        .orderBy("a_brand")
    }),

    // Null-safe equi-join (<=>): under ordinary `=` a NULL key matches
    // nothing (three-valued logic silently drops rows); `<=>` treats
    // NULL as a VALUE, so the null bucket joins like any other key — the
    // semantics ETL wants when an unknown dimension key must land on the
    // "unknown" dim row, not vanish. Fixtures are null-free, so nulls
    // are derived (key % 1000 = 0 → NULL). Note the scale caution the
    // comment IS the documentation for: the null bucket is a self-
    // multiplying hot key (here 150×15 at sf0.1) — at 100 TB you size it
    // or route it through the salted-join path like any skewed key.
    "q_join_nullsafe" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("k",
          when(pmod(col("o_custkey"), lit(1000L)) === 0L, lit(null))
            .otherwise(col("o_custkey")))
      val c = Tables.customer(s, d)
        .withColumn("ck",
          when(pmod(col("c_custkey"), lit(1000L)) === 0L, lit(null))
            .otherwise(col("c_custkey")))
      o.join(c, col("k") <=> col("ck"))
        .groupBy(col("c_mktsegment"), col("ck").isNull.as("null_bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment", "null_bucket")
    })
  )

  /** ONE text for both engines: the Spark query SUBMITS this string and
    * the driver runs it in DuckDB — entry-2 equivalence is the surface
    * itself, not a translation. Revenue uses the decimal-factor form
    * (§7.6) so both engines sum identical exact values. */
  private val sqlEntryText: String =
    """SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY o_orderkey
       ORDER BY revenue DESC, o_orderkey ASC
       LIMIT 10"""

  val oracle: Map[String, String] = Map(
    "q_sql_entry" -> sqlEntryText,
    "q_join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_left" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
          ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS sum_price
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_join_right" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
          ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS sum_price
          FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
          GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_join_full" ->
      """SELECT n_nationkey, n_name, s_suppkey, s_name
         FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
         ORDER BY n_nationkey NULLS FIRST, s_suppkey NULLS FIRST""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",
    "q_join_theta" ->
      s"""SELECT p_brand, COUNT(*) AS n, ${sqlDsum("l_quantity")} AS sum_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
           AND l_quantity BETWEEN p_size - 5.0 AND p_size + 5.0
          GROUP BY p_brand ORDER BY p_brand""",
    "q_join_interval" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
         epoch_us(v.ts) AS view_ts_us, epoch_us(p.ts) AS purchase_ts_us,
         p.value AS purchase_value
         FROM events v JOIN events p
           ON v.user_id = p.user_id
          AND epoch_us(p.ts) >= epoch_us(v.ts)
          AND epoch_us(p.ts) <= epoch_us(v.ts) + 600000000
         WHERE v.event_type = 'view' AND p.event_type = 'purchase'
         ORDER BY view_id, purchase_id""",
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, e.ts_us,
         o.o_orderkey AS asof_orderkey, o.ots_us AS asof_odate_us
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) e
         ASOF LEFT JOIN (
           SELECT o_custkey, epoch_ms(o_orderdate) * 1000 AS ots_us,
                  MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, epoch_ms(o_orderdate)) o
           ON e.user_id = o.o_custkey AND e.ts_us >= o.ots_us
         ORDER BY event_id""",
    "q_join_asof_fwd" ->
      """SELECT e.event_id, e.user_id, e.ts_us,
         o.o_orderkey AS next_orderkey, o.ots_us AS next_odate_us
         FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) e
         ASOF LEFT JOIN (
           SELECT o_custkey, epoch_ms(o_orderdate) * 1000 AS ots_us,
                  MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, epoch_ms(o_orderdate)) o
           ON e.user_id = o.o_custkey AND e.ts_us <= o.ots_us
         ORDER BY event_id""",
    "q_join_asof_nearest" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
         o AS (
           SELECT o_custkey, epoch_ms(o_orderdate) * 1000 AS ots_us,
                  MAX(o_orderkey) AS o_orderkey
           FROM orders GROUP BY o_custkey, epoch_ms(o_orderdate)),
         b AS (
           SELECT e.event_id, e.user_id, e.ts_us,
                  o.o_orderkey AS b_key, o.ots_us AS b_us
           FROM e ASOF LEFT JOIN o
             ON e.user_id = o.o_custkey AND e.ts_us >= o.ots_us),
         f AS (
           SELECT e.event_id, o.o_orderkey AS f_key, o.ots_us AS f_us
           FROM e ASOF LEFT JOIN o
             ON e.user_id = o.o_custkey AND e.ts_us <= o.ots_us)
         SELECT b.event_id, b.user_id, b.ts_us,
           CASE WHEN b.b_us IS NOT NULL AND (f.f_us IS NULL
                     OR (b.ts_us - b.b_us) <= (f.f_us - b.ts_us))
                THEN b.b_key ELSE f.f_key END AS nearest_orderkey,
           CASE WHEN b.b_us IS NOT NULL AND (f.f_us IS NULL
                     OR (b.ts_us - b.b_us) <= (f.f_us - b.ts_us))
                THEN b.b_us ELSE f.f_us END AS nearest_odate_us,
           CASE WHEN b.b_us IS NOT NULL AND (f.f_us IS NULL
                     OR (b.ts_us - b.b_us) <= (f.f_us - b.ts_us))
                THEN b.ts_us - b.b_us ELSE f.f_us - b.ts_us END AS delta_us
         FROM b JOIN f USING (event_id) ORDER BY event_id""",
    "q_join_bcast" ->
      s"""SELECT n_name, COUNT(*) AS n_suppliers,
          ${sqlDsum("s_acctbal")} AS sum_acctbal
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q_join_multiway" ->
      s"""SELECT n_name,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
            AS revenue,
          COUNT(*) AS n_items
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name ORDER BY n_name""",
    "q_join_salted" ->  // plain equi-join oracle: salting is result-neutral
      s"""SELECT c_mktsegment, COUNT(*) AS n_events,
          ${sqlDsum("value")} AS sum_value
          FROM events JOIN customer ON user_id = c_custkey
          GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_join_fk_agg" ->
      s"""SELECT r_name, COUNT(*) AS n_suppliers,
          ${sqlDsum("s_acctbal")} AS sum_acctbal
          FROM supplier
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name ORDER BY r_name""",
    "q_join_bloom" ->  // plain join oracle: the bloom prefilter is result-neutral
      s"""SELECT o_orderpriority, l_returnflag, COUNT(*) AS n,
          ${sqlDsum("l_quantity")} AS sum_qty,
          ${sqlDsum("o_totalprice")} AS sum_price
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority = '1-URGENT'
          GROUP BY o_orderpriority, l_returnflag ORDER BY l_returnflag""",
    "q_join_range" ->  // plain band-predicate oracle: bucketing is result-neutral
      """SELECT a.p_brand AS a_brand, COUNT(*) AS n_pairs,
           CAST(SUM(abs(CAST(round(a.p_retailprice*100) AS BIGINT)
                      - CAST(round(b.p_retailprice*100) AS BIGINT))) AS BIGINT)
             AS sum_diff_cents
         FROM part a JOIN part b
           ON abs(CAST(round(a.p_retailprice*100) AS BIGINT)
                - CAST(round(b.p_retailprice*100) AS BIGINT)) <= 20
          AND a.p_partkey < b.p_partkey
         GROUP BY 1 ORDER BY a_brand""",
    "q_join_nullsafe" ->
      s"""WITH o AS (
            SELECT CASE WHEN o_custkey % 1000 = 0 THEN NULL
                        ELSE o_custkey END AS k, o_totalprice FROM orders),
          c AS (
            SELECT CASE WHEN c_custkey % 1000 = 0 THEN NULL
                        ELSE c_custkey END AS ck, c_mktsegment FROM customer)
          SELECT c_mktsegment, (ck IS NULL) AS null_bucket, COUNT(*) AS n,
          ${sqlDsum("o_totalprice")} AS sum_price
          FROM o JOIN c ON k IS NOT DISTINCT FROM ck
          GROUP BY 1, 2 ORDER BY c_mktsegment, null_bucket"""
  )
}
