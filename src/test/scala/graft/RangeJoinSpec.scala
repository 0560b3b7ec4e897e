package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.sources.Tables

class RangeJoinSpec extends SparkSpec {

  private def sides() = {
    val cents = round(col("p_retailprice") * 100).cast("long")
    val a = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("a_key"), cents.as("a_cents"))
    val b = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("b_key"), cents.as("b_cents"))
    (a, b)
  }

  test("bucketized band join ≡ naive cross-predicate join") {
    val (a, b) = sides()
    val fast = RangeJoin.join(a, b, "a_cents", "b_cents", 20L)
      .select("a_key", "b_key")
    val naive = a.join(b, abs(col("a_cents") - col("b_cents")) <= 20)
      .select("a_key", "b_key")
    assert(fast.count() > 0, "fixture band too narrow — test is vacuous")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("runs as a shuffle equi-join, not cartesian/nested-loop") {
    val (a, b) = sides()
    val plan = RangeJoin.join(a, b, "a_cents", "b_cents", 20L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"),
      s"band join fell back to an all-pairs strategy:\n$plan")
  }

  test("negative values bucket correctly across the zero boundary") {
    import spark.implicits._
    val l = Seq(-25L, -1L, 0L, 3L).toDF("v")
      .select(col("v").as("a_v"))
    val r = Seq(-30L, -24L, -2L, 2L, 19L).toDF("v")
      .select(col("v").as("b_v"))
    val got = RangeJoin.join(l, r, "a_v", "b_v", 20L)
      .select("a_v", "b_v")
    val want = l.join(r, abs(col("a_v") - col("b_v")) <= 20)
      .select("a_v", "b_v")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
