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
}
