package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin
import graft.sources.Tables

class BloomJoinSpec extends SparkSpec {

  test("bloom-prefiltered join ≡ plain join (exact result, fewer shuffled rows)") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val bloomed = BloomJoin.join(fact, dim, "l_orderkey", "o_orderkey",
        expectedItems = 10000L)
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
    val plain = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
    assert(bloomed.count() === plain.count())
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
  }

  test("the bloom filter sits below the join exchange in the physical plan") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = BloomJoin.join(fact, dim, "l_orderkey", "o_orderkey", 10000L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a might_contain filter in the plan:\n$plan")
  }
}
