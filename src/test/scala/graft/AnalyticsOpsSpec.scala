package graft

import org.apache.spark.sql.functions._

/** Semantic laws for the round-6 third batch (queries/AnalyticsOps):
  * grid completeness + fill correctness, diff conservation, dup-fraction
  * bounds, PMI identity, and lateral-join equivalence to its window twin.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("q_timeseries_fill: dense grid, fill matches last observation") {
    val out = SparkEntry.queries("q_timeseries_fill")(spark, sf0001).collect()
    val byType = out.groupBy(_.getString(0))
    // dense grid: every type spans the same [min, max] hour range with no holes
    val spans = byType.values.map { rows =>
      val hrs = rows.map(_.getLong(1)).sorted
      (hrs.head, hrs.last, hrs.length)
    }.toSet
    assert(spans.size === 1, s"types disagree on the grid: $spans")
    val (mn, mx, n) = spans.head
    assert(n === (mx - mn + 1), "grid has holes")
    // forward fill: observed rows (gap=0) carry their own value; gap rows
    // carry the previous non-null value within the type
    for ((_, rows) <- byType) {
      var lastObs: Option[Double] = None
      for (r <- rows.sortBy(_.getLong(1))) {
        val fill = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        if (r.getLong(2) == 0L) lastObs = fill
        else assert(fill === lastObs, s"gap row not carried forward: $r")
      }
    }
  }

  test("q_table_diff: class counts obey snapshot conservation") {
    val d = sf0001
    val out = SparkEntry.queries("q_table_diff")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(pmod(col("o_orderkey"), lit(10L)).as("m"))
      .groupBy("m").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val oldN = o.values.sum
    assert(out("added") === o(5L), "inserted copies of m=5 rows")
    assert(out("removed") === o(7L), "m=7 rows deleted")
    assert(out("changed") === o(3L), "+5% on a positive price always differs")
    assert(out("removed") + out("changed") + out("unchanged") === oldN,
      "every old row classified exactly once")
  }

  test("q_quality_dupngrams: fractions bounded, exact on a known corpus") {
    val out = SparkEntry.queries("q_quality_dupngrams")(spark, sf0001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(2) <= r.getLong(1), "n_dup <= n_shingles")
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
    // hand-built corpus: doc 1/2 share their only shingle, doc 3 is unique
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val sh = Graft.shingleRows(docs, "doc_id", "text", n = 3)
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val got = sh.join(df, Seq("shingle")).groupBy("doc_id")
      .agg(count(when(col("df") >= 2, 1)).as("n_dup")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 0L))
  }

  test("q_text_collocations: PMI identity holds for every output row") {
    val d = sf0001
    val out = SparkEntry.queries("q_text_collocations")(spark, d).collect()
    assert(out.nonEmpty && out.length <= 20)
    // recompute marginals exactly and check ln identity at full precision
    val bg = spark.read.parquet(s"$d/documents.parquet")
      .select(split(col("text"), " ").as("l")).filter(size(col("l")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(l) - 2)," +
          " i -> struct(l[i] AS w1, l[i + 1] AS w2))")).as("bg"))
      .select(col("bg.w1"), col("bg.w2")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = bg.length.toLong
    val c2 = bg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cb = bg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for (r <- out) {
      val (w1, w2, n2, pmi) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))
      assert(c2((w1, w2)) === n2)
      assert(n2 >= 5)
      val expect = math.log((n2 * n).toDouble / (c1(w1) * cb(w2)).toDouble)
      assert(math.abs(pmi - expect) < 1e-6, s"PMI mismatch for ($w1,$w2)")
    }
  }

  test("q_join_lateral: equals the window-top-k twin, 3 rows max per nation") {
    val d = sf0001
    val out = SparkEntry.queries("q_join_lateral")(spark, d).collect()
    val perNation = out.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perNation.values.forall(_ <= 3))
    val twin = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      spark.read.parquet(s"$d/customer.parquet")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .join(spark.read.parquet(s"$d/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(out.map(_.toString).sorted.toSeq === twin)
  }

  test("q_scd2: intervals chain per key, exactly one current version") {
    val d = sf0001
    val out = SparkEntry.queries("q_scd2")(spark, d).collect()
    val nEvents = spark.read.parquet(s"$d/events.parquet").count()
    assert(out.length === nEvents, "every change row becomes a version")
    for ((_, rows) <- out.groupBy(_.getLong(0))) {
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.count(_.getBoolean(6)) === 1, "one current version per key")
      assert(sorted.last.getBoolean(6), "the current version is the last")
      for (Array(a, b) <- sorted.sliding(2).filter(_.length == 2))
        assert(a.getLong(4) === b.getLong(3),
          "valid_to must equal the next version's valid_from")
    }
  }

  test("q_events_anomaly: every flagged row is >= 2 sigma from its mean") {
    val out = SparkEntry.queries("q_events_anomaly")(spark, sf0001).collect()
    assert(out.nonEmpty, "the fixture has hourly outliers")
    for (r <- out)
      assert(math.abs(r.getDouble(4)) >= 1.9995,
        s"|z| below threshold after rounding: $r")
  }

  test("q_intersect_all / q_except_all obey multiset count laws") {
    val d = sf0001
    val o = spark.read.parquet(s"$d/orders.parquet")
    def counts(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_custkey").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val a = counts(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
    val b = counts(o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey"))
    val inter = counts(SparkEntry.queries("q_intersect_all")(spark, d))
    val exc = counts(SparkEntry.queries("q_except_all")(spark, d))
    for (k <- a.keySet ++ b.keySet) {
      assert(inter(k) === math.min(a(k), b(k)),
        s"INTERSECT ALL multiplicity law broken for key $k")
      assert(exc(k) === math.max(a(k) - b(k), 0L),
        s"EXCEPT ALL multiplicity law broken for key $k")
    }
  }

  test("q_join_lateral decorrelates — no per-outer-row nested loop") {
    val p = SparkEntry.queries("q_join_lateral")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested loop in:\n${p.take(1500)}")
  }
}
