package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Contracts for the distributed order-statistics family
  * (operators/RankedSelection.scala): the decomposed rank/cumsum must be
  * bit-equal to the naive global window it replaces, the plans must
  * never contain the single-partition window (the exact scale failure
  * the operator exists to avoid), and snake sharding must actually
  * balance. */
class RankedSelectionSpec extends SparkSpec {

  private def naiveOrder: Array[(Long, Long, Long)] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q_select_budget ≡ naive cumsum replay (rank, cumsum, cutoff)") {
    val docs = naiveOrder.sortBy { case (id, ch, _) => (-ch, id) }
    val total = docs.map(_._3).sum
    val budget = math.floor(0.6 * total.toDouble).toLong
    var cum = 0L
    val want = docs.zipWithIndex.flatMap { case ((id, _, tok), i) =>
      cum += tok
      if (cum <= budget) Some((id, tok, (i + 1).toLong, cum)) else None
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_select_budget")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "distributed budget select diverges from naive window")
    assert(want.nonEmpty && want.map(_._4).max <= budget)
  }

  test("q_shard_balance: ranks ≡ naive window; snake totals balanced") {
    val docs = naiveOrder.map { case (id, _, tok) => (id, tok) }
      .sortBy { case (id, tok) => (-tok, id) }
    val want = docs.zipWithIndex.map { case ((id, tok), r0) =>
      val pass = r0 / 8; val pos = r0 % 8
      (id, tok, (r0 + 1).toLong,
        if (pass % 2 == 0) pos.toLong else (7 - pos).toLong)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q_shard_balance")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, "distributed snake sharding diverges from naive replay")
    val totals = want.groupBy(_._4).view.mapValues(_.map(_._2).sum).values.toSeq
    assert(totals.size == 8, "some shard received no documents")
    val maxTok = docs.map(_._2).max
    assert(totals.max - totals.min <= 2 * maxTok,
      s"shard totals spread ${totals.max - totals.min} exceeds 2×max-doc $maxTok")
  }

  test("budgetSelect on an empty corpus selects nothing (no NPE on the null sum)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("id", "key", "w")
    assert(graft.operators.RankedSelection
      .budgetSelect(spark, empty, "id", "key", "w", 0.6).count() == 0L)
  }

  test("no unpartitioned window survives in either plan (the scale contract)") {
    for (key <- Seq("q_select_budget", "q_shard_balance",
                    "q_select_perplexity", "q_select_perplexity_bigram")) {
      val plan = SparkEntry.queries(key)(spark, sf0001)
        .queryExecution.executedPlan
      val bad = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty,
        s"$key: single-partition global window in the plan:\n${plan.toString.take(1200)}")
    }
  }
}
