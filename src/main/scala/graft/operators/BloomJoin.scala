package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bloom-filter semi-join reduction — the shuffle-saver for the case the
  * broadcast join can't cover: the dimension side is too large to
  * broadcast as ROWS, but the set of its join keys compresses into a
  * few-megabyte Bloom sketch.
  *
  * Shape: one aggregate over the dim keys builds a single-row
  * [[BloomFilterAggregate]] sketch; the fact side filters on
  * [[BloomFilterMightContain]] BEFORE its exchange, so fact rows whose key
  * cannot match never enter the join shuffle. The sketch reaches executors
  * as an uncorrelated scalar subquery (`Dataset.scalar()`), i.e. one
  * small broadcast value — never a driver-side `.collect()` of data rows.
  * False positives only let extra rows into the exact join that follows,
  * so the RESULT is exactly the plain join's; the sketch only affects how
  * much the fact side shuffles (at 100 TB: a 3% match rate means ~97% of
  * fact bytes drop at the scan instead of crossing the wire).
  *
  * This is the same plan Catalyst's own InjectRuntimeFilter builds when
  * its heuristics fire; exposing it as an explicit operator makes the
  * reduction deterministic — a pipeline author should not gamble a 30×
  * shuffle reduction on optimizer thresholds.
  */
object BloomJoin {

  /** The raw Bloom AGGREGATE column over `xxhash64(key)` — the sketch as
    * a selectable value, so it can also be PERSISTED as an artifact
    * (DecontamIndex) instead of consumed in-plan. */
  def keyBloomAgg(key: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(key)),
        Literal(expectedItems),
        // standard ~8 bits/item sizing, capped at Spark's 67108864 default
        Literal(math.min(expectedItems * 8L, 8388608L * 8L))
      ).toAggregateExpression())

  /** Single-row Bloom sketch of `xxhash64(dim(dimKey))` as a scalar
    * subquery Column. `expectedItems` sizes the sketch (bits ≈ 8×). */
  def keyBloom(dim: DataFrame, dimKey: String, expectedItems: Long): Column =
    dim.select(keyBloomAgg(col(dimKey), expectedItems).as("key_bloom"))
      .scalar()

  /** `might_contain(bloom, xxhash64(key))` as a filter Column. */
  def mightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom),
      ColumnBridge.expression(xxhash64(key))))

  /** Equi-join `fact ⋈ dim` with a Bloom pre-filter on the fact side.
    * Result ≡ `fact.join(dim, fact(factKey) === dim(dimKey))`. */
  def join(fact: DataFrame, dim: DataFrame,
           factKey: String, dimKey: String,
           expectedItems: Long = 1000000L): DataFrame = {
    val filtered = fact.filter(
      mightContain(keyBloom(dim, dimKey, expectedItems), col(factKey)))
    filtered.join(dim, filtered(factKey) === dim(dimKey))
  }
}
