package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Q
import graft.functions.WeightedMean
import graft.sources.Tables
import graft.util.Det._

/** Aggregations — SURVEY.md §2.4. Hash agg with map-side partials,
  * distinct + approx-distinct, HAVING, rollup/cube/grouping sets,
  * a custom typed Aggregator UDAF, and a high-cardinality group-by that
  * exercises the sort/spill path.
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary — 6 groups, 2-phase HashAggregate.
    // Product aggregates use exact decimal FACTORS (the fixture's money
    // columns are exact 2-dp values): double-product-then-cast rounds the
    // 4th decimal differently across engines, decimal-factor products are
    // exact and engine-identical.
    "q_agg_hash" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val price = col("l_extendedprice").cast(DecimalType(12, 2))
      val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
      val taxF  = (lit(1.0) + col("l_tax")).cast(DecimalType(4, 2))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(price * discF).cast("double").as("sum_disc_price"),
          sum(price * discF * taxF).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // HLL++ approximate distinct — mergeable sketch, one shuffle of
    // fixed-size sketches instead of the full distinct expand at 100 TB.
    // No SQL oracle (DuckDB's HLL estimates differ); bounds vs the exact
    // count are asserted in ScalaTest, driver records a rows-only check.
    "q_agg_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
             count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Mergeable quantile sketch (percentile_approx, GK-style summaries):
    // fixed-size sketches merge across partitions instead of the full
    // sort an exact percentile needs at 100 TB. No SQL oracle (sketch
    // estimates are engine-specific); ScalaTest asserts the estimate's
    // RANK sits within the sketch's error bound of the target, driver
    // records a rows-only check.
    "q_agg_approx_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
               .as("p50_approx"),
             percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000))
               .as("p90_approx"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Two-level RE-AGGREGATABLE sketch rollup (Apache DataSketches HLL):
    // per-(type, day) user sketches union'd up to per-type estimates —
    // THE 100-TB pre-aggregation pattern (daily sketch partitions merge
    // into any rollup without touching raw data; registers are max-merged
    // so the result is insertion-order independent). Test-oracled vs
    // exact distinct; driver records rows-only.
    "q_agg_sketch_union" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("event_type")
    }),

    // Sketches AT REST: the same per-(type, day) HLL sketches persisted
    // to parquet (binary column) and re-read before the union — the
    // stored pre-aggregation layout (daily sketch partitions on shared
    // storage; any later rollup merges bytes, never raw events). Result
    // must EXACTLY equal the in-flight q_agg_sketch_union (asserted in
    // ScalaTest); driver records rows-only.
    "q_agg_sketch_table" -> ((s, d) => {
      val tmp = Scans.scratch("sketches", s, d)
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .groupBy("event_type", "day")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
             hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("event_type")
    }),

    "q_agg_distinct" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
             count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    "q_agg_having" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("sum_price"),
             count(lit(1)).as("n_orders"))
        .filter(col("sum_price") > 1000000.0)
        .orderBy("c_mktsegment")
    }),

    "q_agg_rollup" -> ((s, d) => {
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
              col("n_regionkey") === col("r_regionkey"))
        .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"))
        // col(...)-based grouping: the String overload resolves through
        // Dataset.col and its __dataset_id metadata false-positives the
        // ambiguous-self-join check on joined frames (Spark 4.1).
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
             dsum(col("s_acctbal")).as("sum_acctbal"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
                 col("l_linestatus").asc_nulls_first)
    }),

    "q_agg_grouping_sets" -> ((s, d) => {
      // DataFrame-native GROUPING SETS (SPARK-45929) — no temp-view side
      // effect. gid cast to BIGINT on both sides (DuckDB GROUPING is INT).
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
              Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id(col("o_orderstatus"), col("o_orderpriority"))
               .cast("long").as("gid"),
             count(lit(1)).as("n"),
             dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    }),

    // Custom typed Aggregator (Kafka-Streams Aggregator analog):
    // mean discount weighted by quantity.
    "q_agg_udaf" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(WeightedMean(col("l_discount"), col("l_quantity")), 6)
               .as("wmean_disc"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // Pivot (wide aggregation): quantity sums per linestatus, one column
    // per return flag. Values list is EXPLICIT — pivot without it runs an
    // extra distinct pass at scale. Oracle: conditional aggregation.
    "q_agg_pivot" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
        .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
        .orderBy("l_linestatus")
    }),

    // The INVERSE of pivot — wide measures melted back to long
    // (metric, value) rows via Dataset.unpivot (the melt/UNPIVOT
    // surface). Applied to a tiny wide aggregate; at scale unpivot is a
    // per-row Expand (rows × measures), no shuffle of its own.
    "q_agg_unpivot" -> ((s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("qty"),
             dsum(col("l_extendedprice")).as("price"))
      wide.unpivot(Array(col("l_returnflag")),
                   Array(col("qty"), col("price")), "metric", "value")
        .orderBy("l_returnflag", "metric")
    }),

    // Exact interpolated percentiles (sort-based `percentile`): median and
    // p90 — same continuous-quantile definition as DuckDB quantile_cont.
    "q_agg_percentile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
             round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
             round(expr("percentile(l_extendedprice, 0.5)"), 6)
               .as("median_price"))
        .orderBy("l_returnflag")
    }),

    // High-cardinality group-by (one group per order) — partial agg still
    // helps (avg 4 items/order) and the final agg exercises spill paths at
    // scale; output folded to a histogram to keep the result small.
    "q_agg_sort_fallback" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("items"), dsum(col("l_quantity")).as("qty"))
        .groupBy("items")
        .agg(count(lit(1)).as("n_orders"), dsum(col("qty")).as("sum_qty"))
        .orderBy("items")
    }),

    // DETERMINISTIC arg-max as an AGGREGATE (vs the window top-1 shape):
    // max_by/arg_max tie-breaks are engine- and partition-order-dependent,
    // so the portable form is max over a (measure, -key) struct —
    // lexicographic comparison picks the highest total and, on exact
    // decimal ties, the LOWEST user id, identically on every engine and
    // partitioning. One map-side-combinable aggregate, no window.
    "q_agg_argmax" -> ((s, d) => {
      val perUser = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast(DecimalType(28, 4))).as("total"))
      perUser.groupBy("event_type")
        .agg(max(struct(col("total"), (-col("user_id")).as("nu"))).as("m"))
        .select(col("event_type"),
          col("m.total").cast("double").as("top_value"),
          (-col("m.nu")).as("top_user"))
        .orderBy("event_type")
    }),

    // Portable deterministic MODE: built-in mode() tie-breaking is
    // engine/partition-dependent, so the portable form is the argmax
    // shape over (count, -value) — most frequent l_quantity per flag,
    // exact ties to the SMALLEST quantity. Two map-side-combinable
    // aggregates, no window, no engine-specific mode kernel.
    "q_agg_mode" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("n"), (-col("l_quantity")).as("nq"))).as("m"))
        .select(col("l_returnflag"), (-col("m.nq")).as("mode_qty"),
          col("m.n").as("n"))
        .orderBy("l_returnflag")
    }),

    // Statistical aggregates (corr / covar / stddev / var / linear
    // regression) computed from DECIMAL-EXACT raw moments rather than the
    // built-in streaming (Welford) kernels: engine-internal merge order
    // perturbs the last ULPs of corr()/covar_samp() differently in Spark
    // and DuckDB, so the hash gate would flake. One map-side-combinable
    // aggregate produces exact (n, Σx, Σy, Σx², Σy², Σxy); both engines
    // then evaluate the IDENTICAL double formula over bit-identical
    // inputs — IEEE arithmetic is deterministic, so the outputs match
    // exactly. Also the better plan at 100 TB: six moments in one pass
    // instead of six stateful kernels.
    "q_agg_stats" -> ((s, d) => {
      val x = col("l_quantity").cast(DecimalType(15, 2))
      val y = col("l_extendedprice").cast(DecimalType(15, 2))
      val m = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
             sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
             sum(x * x).cast("double").as("sxx"),
             sum(y * y).cast("double").as("syy"),
             sum(x * y).cast("double").as("sxy"))
      val nd = col("n").cast("double")
      val slope = (nd * col("sxy") - col("sx") * col("sy")) /
                  (nd * col("sxx") - col("sx") * col("sx"))
      m.select(col("l_returnflag"), col("n"),
          round((nd * col("sxy") - col("sx") * col("sy")) /
            (sqrt(nd * col("sxx") - col("sx") * col("sx")) *
             sqrt(nd * col("syy") - col("sy") * col("sy"))), 4).as("corr_qp"),
          round((col("sxy") - col("sx") * col("sy") / nd) / (nd - 1), 4)
            .as("covar_qp"),
          round(sqrt((col("sxx") - col("sx") * col("sx") / nd) / (nd - 1)), 4)
            .as("stddev_q"),
          round((col("syy") - col("sy") * col("sy") / nd) / (nd - 1), 4)
            .as("var_p"),
          round(slope, 4).as("regr_slope"),
          round(col("sy") / nd - slope * (col("sx") / nd), 4).as("regr_icept"))
        .orderBy("l_returnflag")
    }),

    // KS CogroupedKStream analog: N keyed inputs merged into ONE keyed
    // aggregate. The relational anti-pattern is join-of-aggregates (N
    // shuffles + an N-way join); the cogroup shape is union-tagged rows
    // through a SINGLE shuffle with per-source conditional aggregates —
    // at 100 TB that is one exchange of (key, tag, value) tuples instead
    // of N exchanges plus a join of their outputs. See Graft.cogroupAgg.
    "q_agg_cogroup" -> ((s, d) => {
      val merged = graft.Graft.cogroupAgg(Seq(
        (Tables.orders(s, d), "o_orderkey", "o_totalprice"),
        (Tables.lineitem(s, d), "l_orderkey", "l_quantity")))
      merged.select(col("key").as("order_key"),
          col("n_0").as("n_orders"),
          coalesce(col("sum_0"), lit(0.0)).as("total_price"),
          col("n_1").as("n_lines"),
          coalesce(col("sum_1"), lit(0.0)).as("sum_qty"))
        .orderBy("order_key")
    }),

    // Group-member materialization (LISTAGG/ARRAY_AGG): the sorted member
    // list per group as one delimited string. collect_list is partition-
    // order-NONDETERMINISTIC by contract, so the deterministic form is
    // collect → array_sort → join — and the scale rule the comment
    // exists to state: only materialize BOUNDED groups (25 nations × ≤40
    // suppliers here); an unbounded member list is a driver-OOM in
    // disguise at 100 TB, where the windowed top-k (q_win_topk_group) or
    // the aggregate top-k (graft_topk) is the right tool.
    "q_agg_collect" -> ((s, d) => {
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
              col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
             array_join(array_sort(collect_list(col("s_name"))), ",")
               .as("members"))
        .orderBy("n_name")
    })
  )

  val oracle: Map[String, String] = Map(
    // pure-ANSI row_number top-1 (no DuckDB struct literals): the same
    // SQL also drives Spark's SQL entry in SqlEntrySpec — three engines
    // on one oracle text
    "q_agg_mode" ->
      """WITH c AS (
           SELECT l_returnflag, l_quantity, COUNT(*) AS n
           FROM lineitem GROUP BY 1, 2),
         ranked AS (
           SELECT l_returnflag, l_quantity, n, ROW_NUMBER() OVER
             (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) rn
           FROM c)
         SELECT l_returnflag, l_quantity AS mode_qty, n
         FROM ranked WHERE rn = 1 ORDER BY l_returnflag""",
    "q_agg_argmax" ->
      """WITH per_user AS (
           SELECT event_type, user_id,
                  SUM(CAST(value AS DECIMAL(28,4))) AS total
           FROM events GROUP BY 1, 2),
         ranked AS (
           SELECT event_type, total, user_id, ROW_NUMBER() OVER
             (PARTITION BY event_type ORDER BY total DESC, user_id ASC) rn
           FROM per_user)
         SELECT event_type, CAST(total AS DOUBLE) AS top_value,
                user_id AS top_user
         FROM ranked WHERE rn = 1 ORDER BY event_type""",
    "q_agg_hash" -> {
      val price = "CAST(l_extendedprice AS DECIMAL(12,2))"
      val discF = "CAST(1.0 - l_discount AS DECIMAL(4,2))"
      val taxF  = "CAST(1.0 + l_tax AS DECIMAL(4,2))"
      s"""SELECT l_returnflag, l_linestatus,
          ${sqlDsum("l_quantity")} AS sum_qty,
          ${sqlDsum("l_extendedprice")} AS sum_base_price,
          CAST(SUM($price * $discF) AS DOUBLE) AS sum_disc_price,
          CAST(SUM($price * $discF * $taxF) AS DOUBLE) AS sum_charge,
          ${sqlDavg("l_quantity")} AS avg_qty,
          ${sqlDavg("l_extendedprice")} AS avg_price,
          ${sqlDavg("l_discount")} AS avg_disc,
          COUNT(*) AS count_order
          FROM lineitem GROUP BY l_returnflag, l_linestatus
          ORDER BY l_returnflag, l_linestatus"""
    },
    "q_agg_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers,
         COUNT(*) AS n_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_agg_having" ->
      s"""SELECT c_mktsegment, ${sqlDsum("o_totalprice")} AS sum_price,
          COUNT(*) AS n_orders
          FROM customer JOIN orders ON c_custkey = o_custkey
          GROUP BY c_mktsegment
          HAVING ${sqlDsum("o_totalprice")} > 1000000.0
          ORDER BY c_mktsegment""",
    "q_agg_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
          ${sqlDsum("s_acctbal")} AS sum_acctbal
          FROM nation JOIN region ON n_regionkey = r_regionkey
          JOIN supplier ON n_nationkey = s_nationkey
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q_agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
          ${sqlDsum("l_quantity")} AS sum_qty, COUNT(*) AS n
          FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
          ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q_agg_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority,
          CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS sum_price
          FROM orders
          GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                  (o_orderstatus), ())
          ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_agg_udaf" ->  // decimal sums ≙ the UDAF's scaled-long accumulation
      """SELECT l_returnflag,
         ROUND(CAST(SUM(CAST(l_discount * l_quantity AS DECIMAL(28,4)))
                    AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE), 6)
           AS wmean_disc,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_pivot" ->
      s"""SELECT l_linestatus,
          ${sqlDsum("CASE WHEN l_returnflag = 'A' THEN l_quantity END")} AS qty_a,
          ${sqlDsum("CASE WHEN l_returnflag = 'N' THEN l_quantity END")} AS qty_n,
          ${sqlDsum("CASE WHEN l_returnflag = 'R' THEN l_quantity END")} AS qty_r
          FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_agg_unpivot" ->
      s"""WITH w AS (
            SELECT l_returnflag,
              ${sqlDsum("l_quantity")} AS qty,
              ${sqlDsum("l_extendedprice")} AS price
            FROM lineitem GROUP BY l_returnflag)
          SELECT l_returnflag, 'qty' AS metric, qty AS value FROM w
          UNION ALL
          SELECT l_returnflag, 'price' AS metric, price AS value FROM w
          ORDER BY l_returnflag, metric""",
    "q_agg_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
         round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg_sort_fallback" ->
      s"""SELECT items, COUNT(*) AS n_orders,
          CAST(SUM(qty) AS DOUBLE) AS sum_qty FROM (
            SELECT l_orderkey, COUNT(*) AS items,
                   SUM(CAST(l_quantity AS DECIMAL(28,4))) AS qty
            FROM lineitem GROUP BY l_orderkey)
          GROUP BY items ORDER BY items""",
    // same exact-moment formulation as the Spark side — NOT DuckDB's own
    // corr()/covar_samp(): identical double formula over identical exact
    // inputs is the only way the hash gate holds (see query comment)
    "q_agg_stats" ->
      """WITH m AS (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                    * CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                    * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))
                    * CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY 1),
         f AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM m)
         SELECT l_returnflag, n,
           ROUND((nd*sxy - sx*sy) /
                 (sqrt(nd*sxx - sx*sx) * sqrt(nd*syy - sy*sy)), 4) AS corr_qp,
           ROUND((sxy - sx*sy/nd) / (nd - 1), 4) AS covar_qp,
           ROUND(sqrt((sxx - sx*sx/nd) / (nd - 1)), 4) AS stddev_q,
           ROUND((syy - sy*sy/nd) / (nd - 1), 4) AS var_p,
           ROUND((nd*sxy - sx*sy) / (nd*sxx - sx*sx), 4) AS regr_slope,
           ROUND(sy/nd - ((nd*sxy - sx*sy) / (nd*sxx - sx*sx)) * (sx/nd), 4)
             AS regr_icept
         FROM f ORDER BY l_returnflag""",
    "q_agg_cogroup" ->
      """WITH u AS (
           SELECT o_orderkey AS key, 0 AS src,
                  CAST(o_totalprice AS DECIMAL(28,4)) AS v FROM orders
           UNION ALL
           SELECT l_orderkey, 1, CAST(l_quantity AS DECIMAL(28,4))
           FROM lineitem)
         SELECT key AS order_key,
           COUNT(CASE WHEN src = 0 THEN 1 END) AS n_orders,
           CAST(COALESCE(SUM(CASE WHEN src = 0 THEN v END), 0) AS DOUBLE)
             AS total_price,
           COUNT(CASE WHEN src = 1 THEN 1 END) AS n_lines,
           CAST(COALESCE(SUM(CASE WHEN src = 1 THEN v END), 0) AS DOUBLE)
             AS sum_qty
         FROM u GROUP BY key ORDER BY order_key""",
    "q_agg_collect" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
           string_agg(s_name, ',' ORDER BY s_name) AS members
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name"""
  )
}
