package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bucketed (pre-partitioned, sorted) tables — the storage layout that
  * eliminates the shuffle from repeated co-located joins at 100 TB. The
  * engine's scans must pick the bucketing up: a join of two tables
  * bucketed on the join key must run WITHOUT any Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs shuffle-free") {
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevBcast = spark.conf.get(bcastKey)
    // disable broadcast so the bucket-vs-shuffle choice is what's tested
    spark.conf.set(bcastKey, "-1")
    try {
      Tables.orders(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(4, "o_custkey").sortBy("o_custkey")
        .saveAsTable("b_orders")
      Tables.customer(spark, sf0001)
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
              col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join still shuffles:\n${plan.take(2000)}")

      // and the result is identical to the plain (shuffling) join
      val plain = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001),
              col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
      assert(joined.collect().map(_.toString).sorted.toSeq
        === plain.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set(bcastKey, prevBcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
