package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Local

/** Distributed order statistics WITHOUT the single-partition global
  * window — the machinery behind token-budget selection and balanced
  * shard assignment.
  *
  * The naive form of both ops is `ROW_NUMBER()/SUM() OVER (ORDER BY key
  * DESC, id)` — an UNPARTITIONED window, which Spark executes by moving
  * the whole corpus to ONE task (WindowExec warns exactly this). At
  * 100 TB that is the canonical scale failure. The scale-correct
  * decomposition used here:
  *
  *   global_rank(row)  = offset(key)  + row_number() within its key
  *   global_cumsum(row) = offset_w(key) + running sum within its key
  *
  * where `offset`/`offset_w` come from a KEY HISTOGRAM — a groupBy(key)
  * count/sum whose cardinality is bounded by the number of DISTINCT key
  * values (for document-length keys: thousands, regardless of corpus
  * row count — a model-sized frame by construction). The histogram is
  * folded into per-key offsets on the driver and broadcast-joined back;
  * the within-key window partitions BY the key, so every partition holds
  * one key's rows and the sort parallelizes across keys. Skew caveat: a
  * single pathological key (every doc the same length) degrades to the
  * naive form — the fix (sub-bucket the key by a hash of id, then a
  * second offset level) is mechanical and documented, not built, since
  * the ordering inside equal keys is by id and thus arbitrary-split-safe.
  *
  * Determinism: the total order is (key DESC, id ASC) with unique ids,
  * so ranks, cumsums, and everything derived from them are exact
  * integers — bit-identical to the DuckDB oracle's unpartitioned window.
  */
object RankedSelection {

  /** (id, key, weight) -> (id, key, weight, rank, cum_weight) under the
    * total order (key DESC, id ASC); exact-integer arithmetic only.
    * `df` must have unique `id`; key/weight must be non-null longs. */
  def rankAndCumsum(s: SparkSession, df: DataFrame,
                    id: String, key: String, weight: String): DataFrame = {
    // reject silent collisions: the operator appends rank/cum_weight and
    // uses rank_off/w_off internally — a caller frame already carrying
    // one of those would be overwritten (or fail analysis ambiguously)
    val reserved = Seq("rank", "cum_weight", "rank_off", "w_off")
    val clash = df.columns.toSet.intersect(reserved.toSet) -- Set(id, key, weight)
    require(clash.isEmpty,
      s"rankAndCumsum reserves columns ${reserved.mkString(", ")}; input already has ${clash.mkString(", ")}")
    // key histogram: model-sized by construction (distinct key values)
    val hist = Local.modelRows(
      df.groupBy(col(key)).agg(count(lit(1)).as("n"),
        sum(col(weight)).as("w"))).map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (k, _, _) => -k }
    // driver fold: rows/weight strictly ABOVE each key in the total order
    var nAcc = 0L; var wAcc = 0L
    val offsets = hist.map { case (k, n, w) =>
      val row = (k, nAcc, wAcc); nAcc += n; wAcc += w; row
    }
    import s.implicits._
    val offDf = offsets.toSeq.toDF(key, "rank_off", "w_off")
    val perKey = Window.partitionBy(col(key)).orderBy(col(id).asc)
    df.join(broadcast(offDf), Seq(key))
      .withColumn("rank", col("rank_off") + row_number().over(perKey))
      .withColumn("cum_weight",
        col("w_off") + sum(col(weight)).over(
          perKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("rank_off", "w_off")
  }

  /** Token-budget selection (the DataComp/"data mixtures under a token
    * budget" step): keep documents in priority order (key DESC, id ASC)
    * while the running token total stays within `frac` of the corpus
    * total. Returns only the kept docs. */
  def budgetSelect(s: SparkSession, docs: DataFrame, id: String,
                   key: String, weight: String, frac: Double): DataFrame = {
    // coalesce: SUM over an empty frame is null, and an empty corpus
    // should select nothing, not NPE
    val total = Local.modelRows(
      docs.agg(coalesce(sum(col(weight)), lit(0L)).as("t"))).head.getLong(0)
    // same IEEE double product both engines evaluate (frac * total)
    val budget = math.floor(frac * total.toDouble).toLong
    rankAndCumsum(s, docs, id, key, weight)
      .filter(col("cum_weight") <= budget)
  }

  /** Balanced K-shard assignment via boustrophedon (snake) packing:
    * docs ordered by (weight DESC, id ASC), rank r (0-based) goes to
    * shard r mod K on even passes and K-1-(r mod K) on odd passes — each
    * 2K-row round gives every shard exactly two docs whose weights
    * bracket the round, so shard totals stay within ~one max-weight doc
    * of each other without any sequential greedy state. */
  def snakeShards(s: SparkSession, docs: DataFrame, id: String,
                  weight: String, k: Int): DataFrame = {
    rankAndCumsum(s, docs, id, weight, weight)
      .withColumn("r0", col("rank") - 1)
      .withColumn("shard",
        when(pmod(expr(s"r0 div $k"), lit(2L)) === 0L, pmod(col("r0"), lit(k.toLong)))
          .otherwise(lit(k.toLong - 1) - pmod(col("r0"), lit(k.toLong))))
      .drop("r0", "cum_weight")
  }
}
