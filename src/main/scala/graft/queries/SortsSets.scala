package graft.queries

import org.apache.spark.sql.functions._
import graft.Q
import graft.sources.Tables

/** Sorts, limits, top-k (§2.6) and set operations (§2.7).
  *
  * q_topk compiles to TakeOrderedAndProjectExec — per-partition heaps,
  * never a full global sort; q_sort_multi is the genuine global sort
  * (range-partitioned SortExec). Set ops shuffle on the full row hash.
  */
object SortsSets {

  val queries: Map[String, Q] = Map(
    "q_sort_multi" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(col("o_orderpriority").asc_nulls_first,
                 col("o_totalprice").desc, col("o_orderkey").asc)
    }),

    "q_topk" -> ((s, d) => {
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    "q_limit_offset" -> ((s, d) => {
      // Pagination: rows 101–200 of the price-sorted orders.
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .offset(100).limit(100)
    }),

    "q_union_all" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.filter(col("event_type") === "click")
        .unionAll(ev.filter(col("event_type") === "error"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    "q_union_distinct" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        .union(o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey")))
        .distinct()
        .orderBy("o_custkey")
    }),

    "q_intersect" -> ((s, d) => {
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    }),

    "q_except" -> ((s, d) => {
      Tables.customer(s, d).select(col("c_custkey"))
        .except(Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey")))
        .orderBy("c_custkey")
    }),

    // ---- the MULTISET set ops (bag semantics — INTERSECT ALL keeps
    // min(multiplicity) copies, EXCEPT ALL subtracts multiplicities):
    // the API surface dropDuplicates-style distinct set ops miss.
    // Spark plans both as one aggregate of per-side counts + a
    // generate — no row-hash shuffle of duplicates.
    "q_intersect_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .intersectAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")))
        .orderBy("o_custkey")
    }),

    "q_except_all" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        .exceptAll(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")))
        .orderBy("o_custkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         ORDER BY o_orderpriority ASC NULLS FIRST, o_totalprice DESC,
                  o_orderkey ASC""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "q_limit_offset" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100 OFFSET 100""",
    "q_union_all" ->
      """SELECT event_type, COUNT(*) AS n FROM (
           SELECT * FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT * FROM events WHERE event_type = 'error')
         GROUP BY event_type ORDER BY event_type""",
    "q_union_distinct" ->
      """SELECT DISTINCT o_custkey FROM (
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           UNION
           SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
         ORDER BY o_custkey""",
    "q_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey FROM orders
         ORDER BY c_custkey""",
    "q_except" ->
      """SELECT c_custkey FROM customer
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY c_custkey""",
    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_custkey""",
    "q_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         ORDER BY o_custkey"""
  )
}
