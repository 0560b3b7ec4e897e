package graft

import org.apache.spark.sql.functions._
import graft.functions.{FreqSketch, MGBuffer}
import graft.sources.Tables

class FreqSketchSpec extends SparkSpec {

  test("MGBuffer: heavy-hitter guarantee and estimate bounds (local)") {
    // skewed stream: term i appears 2^(10-i) times, plus noise singletons
    val stream = (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"t$i")) ++
      (1 to 500).map(i => s"noise$i")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val m = 16
    // partition into 7 chunks in an arbitrary interleaving, then merge —
    // the mergeable-summaries path the aggregate exercises
    val chunks = stream.zipWithIndex.groupBy(_._2 % 7).values.map { c =>
      val b = new MGBuffer(m); c.foreach { case (t, _) => b.add(t) }; b
    }
    val merged = chunks.reduce { (a, b) => a.merge(b); a }
    assert(merged.n === n)
    assert(merged.counts.size <= m)
    for ((t, c) <- exact if c > n / (m + 1))
      assert(merged.counts.contains(t),
        s"heavy hitter $t (count $c > ${n / (m + 1)}) missing from sketch")
    for ((t, est) <- merged.counts) {
      val c = exact(t)
      assert(est <= c && est >= c - n / (m + 1).toLong,
        s"estimate $est for $t outside [${c - n / (m + 1)}, $c]")
    }
  }

  test("graft_freq candidates cover every exact heavy hitter (distributed)") {
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val n = toks.count()
    val m = 64
    val cands = toks.agg(FreqSketch.freq(col("term"), m).as("sk"))
      .select(explode(col("sk")).as("c"))
      .select(col("c.term")).collect().map(_.getString(0)).toSet
    assert(cands.size <= m)
    val heavies = toks.groupBy("term").count()
      .filter(col("count") > n / (m + 1)).collect().map(_.getString(0))
    assert(heavies.nonEmpty, "fixture has no heavy terms — test is vacuous")
    for (t <- heavies)
      assert(cands.contains(t), s"sketch dropped heavy hitter '$t'")
  }

  test("graft_freq is registered for pure-SQL users") {
    Tables.documents(spark, sf0001).createOrReplaceTempView("hh_docs")
    val est = spark.sql(
      """SELECT inline(graft_freq(term, 8)) FROM (
           SELECT explode(split(text, ' ')) AS term FROM hh_docs)""")
    assert(est.count() <= 8 && est.count() > 0)
  }
}
