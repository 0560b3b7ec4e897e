package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}
import graft.Q
import graft.sources.Tables
import graft.util.Det._

/** Scalar functions — SURVEY.md §2.8: string / date / math / array / map /
  * json / UDF / explode. All per-row expressions stay inside whole-stage
  * codegen (built-in functions, not UDFs, except the contract-mandated
  * q_udf_scalar).
  *
  * Cross-engine determinism notes:
  *  - Spark length/datediff/pos are INT, DuckDB's are BIGINT → cast to long.
  *  - Transcendental fns (ln/pow) may differ in the last ULP across libm
  *    implementations → always rounded to 6 dp on both sides.
  *  - DuckDB ceil/floor return DECIMAL/DOUBLE → oracle casts to BIGINT to
  *    match Spark's LONG.
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    "q_str_funcs" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pre"),
          concat_ws("|", split(col("p_name"), " ")).as("name_piped"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_trim"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          when(col("p_name").like("%widget%"), 1L).otherwise(0L)
            .as("is_widget"))
        .orderBy("p_partkey")
    }),

    "q_date_funcs" -> ((s, d) => {
      // year/month/date_trunc/datediff/interval arithmetic, aggregated per
      // order-month so the output is small and totally ordered. Two
      // work-pushdown moves the optimizer will not make for us:
      //  (1) ORDER-side datetime expressions computed below the join
      //      (per 150 K orders, not per joined row — Catalyst prunes
      //      columns through joins but never pushes expression WORK);
      //  (2) lineitem PARTIALLY AGGREGATED to per-order (count, min/max
      //      shipdate) BEFORE the join — o_date is constant per order, so
      //      min/max of datediff(ship, o_date) ≡ datediff(min/max ship,
      //      o_date): the join and all per-row datediff work run on 150 K
      //      rows instead of 600 K. Profiled r6: the sf0.1 wall time is
      //      floor-bound (~0.45 s = two scans + the partial agg; the
      //      datediff/join tail it removes was ~0.05 s there), but the
      //      replica probe tier shows the real effect (0.47 → 0.33 s) —
      //      and no join hint: AQE broadcasts the small side at this
      //      scale and switches to shuffle when orders outgrow it.
      val o = Tables.orders(s, d).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        epochMs(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
        epochMs(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ms"))
      val li = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("cnt"),
             min("l_shipdate").as("min_ship"), max("l_shipdate").as("max_ship"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_year"), col("o_month"), col("month_start_ms"),
          col("cnt"),
          datediff(to_date(col("min_ship")), col("o_date"))
            .cast("long").as("gap_lo"),
          datediff(to_date(col("max_ship")), col("o_date"))
            .cast("long").as("gap_hi"),
          col("due_ms"))
        .groupBy("o_year", "o_month", "month_start_ms")
        .agg(sum("cnt").as("n"),
             min("gap_lo").as("min_gap"), max("gap_hi").as("max_gap"),
             min("due_ms").as("min_due_ms"))
        .orderBy("o_year", "o_month")
    }),

    "q_str_pad" -> ((s, d) => {
      Tables.customer(s, d)
        .select(
          col("c_custkey"),
          lpad(col("c_name"), 25, "*").as("name_lpad"),
          rpad(col("c_name"), 25, ".").as("name_rpad"),
          repeat(substring(col("c_name"), 1, 4), 2).as("name_rep"),
          reverse(col("c_name")).as("name_rev"))
        .orderBy("c_custkey")
    }),

    // dayofweek aligned to DuckDB's Sunday=0 convention (Spark is Sunday=1).
    "q_date_extract" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          epochMs(last_day(col("o_orderdate")).cast("timestamp"))
            .as("month_end_ms"))
        .orderBy("o_orderkey")
    }),

    "q_math_funcs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          abs(col("o_totalprice") - 100000.0).as("abs_diff"),
          floor(col("o_totalprice")).as("price_floor"),
          ceil(col("o_totalprice")).as("price_ceil"),
          round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
          round(log(col("o_totalprice")), 6).as("price_ln"),
          round(pow(col("o_totalprice") / 100000.0, 3.0), 6).as("price_pow3"))
        .orderBy("o_orderkey")
    }),

    "q_array_funcs" -> ((s, d) => {
      // ArrayType built-ins + higher-order functions over the 64-dim
      // embedding; HOF fold is left-to-right in both engines, and float→
      // double promotion is exact, so sum-of-squares matches bit-for-bit
      // (rounded anyway per the Det contract).
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_el"),
          element_at(col("embedding"), 64).cast("double").as("last_el"),
          round(expr(
            "aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
            6).as("sum_sq"),
          round(expr(
            "aggregate(slice(embedding, 1, 8), 0D, (acc, x) -> acc + CAST(x AS DOUBLE))"),
            6).as("head8_sum"))
        .orderBy("vec_id")
    }),

    "q_bit_funcs" -> ((s, d) => {
      // Bitwise family over the order key (and/or/xor/shifts/bit_count).
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("and_255"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("or_4096"),
          col("o_orderkey").bitwiseXOR(lit(1023L)).as("xor_1023"),
          shiftleft(col("o_orderkey"), 2).as("shl_2"),
          shiftright(col("o_orderkey"), 3).as("shr_3"),
          bit_count(col("o_orderkey")).cast("long").as("popcount"))
        .orderBy("o_orderkey")
    }),

    "q_cond_funcs" -> ((s, d) => {
      // Conditional scalar family: greatest/least/nullif/coalesce/ifnull.
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          greatest(col("o_totalprice"), lit(100000.0)).as("floor_100k"),
          least(col("o_totalprice"), lit(200000.0)).as("cap_200k"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_or_open"),
          when(col("o_totalprice") > 150000.0, col("o_totalprice"))
            .otherwise(lit(null)).as("big_or_null"))
        .orderBy("o_orderkey")
    }),

    "q_map_funcs" -> ((s, d) => {
      // props JSON → MapType; explode to (key, value) and aggregate —
      // output flattened to sorted scalars (maps don't hash stably).
      Tables.events(s, d)
        .select(explode(from_json(col("props"), MapType(StringType, LongType)))
          .as(Seq("key", "v")))
        .groupBy("key")
        .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
        .orderBy("key")
    }),

    "q_json_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
             count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    "q_udf_scalar" -> ((s, d) => {
      // Contract-mandated scalar UDF (Catalyst-opaque — predicates stay
      // OUTSIDE the UDF so pushdown still works; oracle is the same CASE).
      val band = udf((p: Double) =>
        if (p < 50000.0) "small"
        else if (p < 150000.0) "medium"
        else if (p < 300000.0) "large"
        else "jumbo")
      Tables.orders(s, d)
        .select(col("o_orderkey"), band(col("o_totalprice")).as("band"))
        .orderBy("o_orderkey")
    }),

    "q_explode" -> ((s, d) => {
      // posexplode (UDTF surface): per-position stats across all vectors.
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy((col("pos") + 1).cast("long").as("position"))
        .agg(count(lit(1)).as("n"),
             round(dsum(col("x").cast("double"), 6) / count(lit(1)), 6)
               .as("avg_x"))
        .orderBy("position")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey, upper(p_name) AS up_name,
         CAST(length(p_name) AS BIGINT) AS name_len,
         substring(p_name, 1, 5) AS name_pre,
         array_to_string(string_split(p_name, ' '), '|') AS name_piped,
         trim('  ' || p_name || '  ') AS name_trim,
         regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
         CAST(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END AS BIGINT)
           AS is_widget
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(month(o_orderdate) AS BIGINT) AS o_month,
         epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
         COUNT(*) AS n,
         MIN(date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE))) AS min_gap,
         MAX(date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE))) AS max_gap,
         MIN(epoch_ms(o_orderdate + INTERVAL 30 DAY)) AS min_due_ms
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2, 3 ORDER BY o_year, o_month""",
    "q_str_pad" ->
      """SELECT c_custkey, lpad(c_name, 25, '*') AS name_lpad,
         rpad(c_name, 25, '.') AS name_rpad,
         repeat(substring(c_name, 1, 4), 2) AS name_rep,
         reverse(c_name) AS name_rev
         FROM customer ORDER BY c_custkey""",
    "q_date_extract" ->
      """SELECT o_orderkey,
         CAST(dayofweek(o_orderdate) AS BIGINT) AS dow,
         CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
         CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         CAST(week(o_orderdate) AS BIGINT) AS iso_week,
         epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP))
           AS month_end_ms
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT o_orderkey,
         abs(o_totalprice - 100000.0) AS abs_diff,
         CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
         CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
         round(sqrt(o_totalprice), 6) AS price_sqrt,
         round(ln(o_totalprice), 6) AS price_ln,
         round(pow(o_totalprice / 100000.0, 3.0), 6) AS price_pow3
         FROM orders ORDER BY o_orderkey""",
    "q_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
         CAST(embedding[1] AS DOUBLE) AS first_el,
         CAST(embedding[64] AS DOUBLE) AS last_el,
         round(list_aggregate(list_transform(embedding,
           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sum_sq,
         round(list_aggregate(list_transform(embedding[1:8],
           x -> CAST(x AS DOUBLE)), 'sum'), 6) AS head8_sum
         FROM embeddings ORDER BY vec_id""",
    "q_bit_funcs" ->
      """SELECT o_orderkey,
         o_orderkey & 255 AS and_255,
         o_orderkey | 4096 AS or_4096,
         xor(o_orderkey, 1023) AS xor_1023,
         o_orderkey << 2 AS shl_2,
         o_orderkey >> 3 AS shr_3,
         CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
         FROM orders ORDER BY o_orderkey""",
    "q_cond_funcs" ->
      """SELECT o_orderkey,
         greatest(o_totalprice, 100000.0) AS floor_100k,
         least(o_totalprice, 200000.0) AS cap_200k,
         coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
         CASE WHEN o_totalprice > 150000.0 THEN o_totalprice END AS big_or_null
         FROM orders ORDER BY o_orderkey""",
    "q_map_funcs" ->
      """SELECT k.key AS key, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT))
              AS BIGINT) AS sum_v
         FROM events, UNNEST(json_keys(props)) AS k(key)
         GROUP BY 1 ORDER BY key""",
    "q_json_funcs" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS sum_k,
         COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_udf_scalar" ->
      """SELECT o_orderkey,
         CASE WHEN o_totalprice < 50000.0 THEN 'small'
              WHEN o_totalprice < 150000.0 THEN 'medium'
              WHEN o_totalprice < 300000.0 THEN 'large'
              ELSE 'jumbo' END AS band
         FROM orders ORDER BY o_orderkey""",
    "q_explode" ->
      """SELECT CAST(t.i AS BIGINT) AS position, COUNT(*) AS n,
         round(CAST(SUM(CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(28,6)))
                    AS DOUBLE) / COUNT(*), 6) AS avg_x
         FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
         GROUP BY 1 ORDER BY position"""
  )
}
