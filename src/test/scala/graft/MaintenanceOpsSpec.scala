package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Maintenance-rewrite laws the SQL oracles cannot see: the deletion
  * snapshot really no longer CONTAINS the erased rows (the oracle only
  * checks the aggregate), and the merge's row kinds partition the new
  * snapshot exactly along the change-set's op classes. */
class MaintenanceOpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("q_sink_delete: erased ids are absent from the rewritten snapshot") {
    val row = run("q_sink_delete").collect()(0)
    val (nBefore, nAfter, nDeleted) =
      (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nBefore == nAfter + nDeleted, "accounting must be lossless")
    assert(nDeleted > 0, "fixture must contain erasure-set rows")
    // the snapshot the query wrote is still on scratch — re-read it and
    // assert the erasure predicate matches nothing
    val tmp = graft.queries.Scans.scratch("delete", spark, sf0001)
    val kept = spark.read.parquet(tmp)
    assert(kept.filter(pmod(col("doc_id"), lit(97L)) === 13L).count() == 0,
      "an erased doc survived the rewrite")
    assert(kept.count() == nAfter)
  }

  test("q_sink_delete rewrite is idempotent") {
    val first = run("q_sink_delete").collect()(0)
    val second = run("q_sink_delete").collect()(0)
    assert(first.toSeq == second.toSeq)
  }

  test("q_merge_upsert: row kinds partition the merged snapshot exactly") {
    val o = Tables.orders(spark, sf0001)
    val md = pmod(col("o_orderkey"), lit(10L))
    val expectUpdates = o.filter(md <= 2L).count()
    val expectInserts = o.filter(md === 9L).count()
    val expectDeletes = o.filter(md === 5L).count()
    val total = o.count()
    val kinds = run("q_merge_upsert").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds("update") == expectUpdates)
    assert(kinds("insert") == expectInserts)
    assert(kinds("carry") == total - expectUpdates - expectInserts - expectDeletes,
      "carry = base rows (all minus the md=9 inserts) not updated, not deleted")
    assert(kinds.values.sum == total - expectDeletes,
      "merged row count = all orders minus deletes")
  }

  test("q_merge_upsert: updated rows carry the changed price") {
    // rebuild the merged frame's update rows and check one invariant the
    // aggregate output can't: every update row's price is 1.01× its base
    val o = Tables.orders(spark, sf0001)
    val md = pmod(col("o_orderkey"), lit(10L))
    val updatedTotal = o.filter(md <= 2L)
      .agg(sum(round(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(28, 2))
          * lit(new java.math.BigDecimal("1.01")), 2)
        .cast(org.apache.spark.sql.types.DecimalType(28, 2))))
      .collect()(0).getDecimal(0)
    val carryAndInsertTotal = o.filter(md > 2L && md =!= 5L)
      .agg(sum(col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(28, 2))))
      .collect()(0).getDecimal(0)
    val reported = run("q_merge_upsert").collect()
      .map(r => java.math.BigDecimal.valueOf(r.getDouble(2)))
      .reduce(_ add _)
    val expected = updatedTotal.add(carryAndInsertTotal)
    assert(reported.compareTo(expected) == 0,
      s"merged totals drifted: $reported vs $expected")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  /** Full single-pass recompute of the q_agg_incremental rollup — the
    * law incremental view maintenance must satisfy. */
  private def fullRecompute(sfDir: String) = {
    import org.apache.spark.sql.types.DecimalType
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val discF = (lit(1.0) - col("l_discount")).cast(DecimalType(4, 2))
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ship_ym"))
      .agg(count(lit(1)).as("n_rows"),
           sum(col("l_quantity").cast(DecimalType(28, 4)))
             .cast("double").as("sum_qty"),
           sum(price * discF).cast("double").as("sum_disc_price"))
      .orderBy("l_returnflag", "l_linestatus", "ship_ym")
  }

  test("q_agg_incremental == full recompute at two tiers (IVM law)") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val inc = rows(SparkEntry.queries("q_agg_incremental")(spark, sf))
      assert(inc === rows(fullRecompute(sf)), s"IVM law broken at $sf")
      assert(inc.nonEmpty)
    }
  }

  test("q_agg_incremental answers from the stored rollup on repeat calls") {
    // first call (previous test) built the artifact; this run must merge
    // stored partials + delta — assert the plan reads the rollup parquet
    // and the DELTA lineitem scan carries the pushed shipdate bound
    val df = SparkEntry.queries("q_agg_incremental")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_aggbase_"),
      s"stored rollup not read:\n${plan.take(1200)}")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"delta scan lost its pushed cutoff predicate:\n$plan")
    // and repeat answers are identical (artifact is stable)
    assert(rows(df) === rows(SparkEntry.queries("q_agg_incremental")(spark, sf0001)))
  }
}
