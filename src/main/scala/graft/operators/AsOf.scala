package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the batch analog of a Kafka-Streams
  * stream-table join: for each left row, the single latest right row with
  * `rightTime <= leftTime` for the same key.
  *
  * Spark has no built-in as-of join. Rather than a naive range join +
  * row_number (which materializes every (left, candidate) pair — quadratic
  * in matches per key), this uses the union/merge trick: tag both sides,
  * union, and carry the last-seen right value forward over a single
  * per-key time sort. Cost is one shuffle + one sort over |L|+|R| rows —
  * the plan a 1000-executor cluster wants, since each key's timeline sorts
  * locally within its hash partition and nothing is ever quadratic.
  *
  * Right rows sort BEFORE left rows at equal timestamps, so `<=` (inclusive
  * as-of) semantics match DuckDB's `ASOF JOIN`. The right side must be
  * unique per (key, time) — dedup it first or ties are nondeterministic.
  *
  * `forward = true` flips the direction: each left row takes the single
  * EARLIEST right row with `rightTime >= leftTime` (the "next event
  * after" attribution shape — DuckDB `ASOF JOIN ... ON l.t <= r.t`),
  * again inclusive at equal timestamps. Same cost either way.
  */
object AsOf {
  /** @param left       left (probe) side
    * @param right      right (reference) side, unique per (key, time)
    * @param leftKey    join key column name on the left
    * @param rightKey   join key column name on the right
    * @param leftTime   event-time column on the left (any orderable type)
    * @param rightTime  event-time column on the right (same type)
    * @param rightVals  right columns to carry onto matching left rows
    * @param forward    false = latest right ≤ left time (default);
    *                   true = earliest right ≥ left time
    * @return left rows + carried right columns (null when no match) */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightVals: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // Carry the right values as ONE struct so a matched right row is taken
    // atomically: a legitimately-NULL right field stays NULL instead of
    // being back-filled from an older right row.
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++ Seq(
        lit(null).cast(rvType).as("__rv"),
        col("__k"), col("__t"), col("__side"))): _*)
    // Backward: right rows (side 0) sort BEFORE left (side 1) at equal
    // time and the latest prior right struct is carried forward.
    // Forward: right rows (side 2) sort AFTER left at equal time and the
    // earliest following right struct is pulled backward. Both inclusive.
    val rightSide = if (forward) 2 else 0
    // SQL join semantics: a NULL right key matches nothing. Without this
    // filter the window's partitionBy would group null-keyed rows of
    // BOTH sides into one partition and "match" them — a silent
    // divergence from the DuckDB ASOF oracle. Null-keyed LEFT rows stay
    // (alone in the null partition, no right rows → null carry).
    // A NULL right TIME likewise matches nothing (the ASOF inequality is
    // never true on null) — unfiltered it would sort FIRST (nulls-first
    // asc) and the backward last(ignoreNulls) would carry its values into
    // left rows that have no real earlier right row.
    val r = right.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(rightSide))
      .select((leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        struct(rightVals.map(col): _*).as("__rv"),
        col("__k"), col("__t"), col("__side"))): _*)

    // One hash-partition by key, one local sort. Left rows' __rv is NULL,
    // so ignoreNulls carries the nearest right struct across them.
    val base = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
    val carried =
      if (forward)
        first(col("__rv"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__rv"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // SQL ASOF semantics: a NULL left TIME matches nothing (DuckDB's
    // inequality condition is never true on null). Without the guard a
    // null-time left row sorts first (nulls-first asc) and the FORWARD
    // carry would hand it the earliest right row's values.
    l.unionByName(r)
      .withColumn("__rv", when(col("__t").isNotNull, carried))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightVals.map(c => col(s"__rv.$c").as(c))): _*)
  }

  /** NEAREST-in-time join — the ML feature-join variant of as-of: each
    * left row takes whichever right row (same key) is closer in time,
    * backward winning ties. Still ONE shuffle + ONE local sort: the
    * right side enters the union TWICE (side 0 for the backward carry,
    * side 2 for the forward pull), and both window carries run over the
    * same (key, time, side) sort — |L| + 2|R| rows through one
    * exchange, never a range join, never quadratic. `rightTime` must be
    * in `rightVals` (the pick needs the matched row's time) and numeric
    * (the emitted `delta` is left − right time in its units). The right
    * side must be unique per (key, time) — dedup it first, same as
    * [[join]], or the carried values are partition-order-dependent.
    * NULL right keys match nothing (filtered, SQL semantics); a NULL
    * left key or a NULL left time carries nulls.
    * Returns left + carried rightVals + `delta` (null when keyless). */
  def joinNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  rightVals: Seq[String]): DataFrame = {
    require(rightVals.contains(rightTime),
      s"rightVals must include $rightTime — the nearest pick needs the matched time")
    val leftCols = left.columns.toSeq
    val rvType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    def sideRow(df0: DataFrame, side: Int, bv: Boolean): DataFrame = {
      // SQL: null key/time matches nothing (same rule as join() above)
      val df = df0.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      df.withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__side", lit(side))
      .select((leftCols.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        (if (bv) struct(rightVals.map(col): _*)
         else lit(null).cast(rvType)).as("__bv"),
        (if (bv) lit(null).cast(rvType)
         else struct(rightVals.map(col): _*)).as("__fv"),
        col("__k"), col("__t"), col("__side"))): _*)
    }
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++ Seq(
        lit(null).cast(rvType).as("__bv"), lit(null).cast(rvType).as("__fv"),
        col("__k"), col("__t"), col("__side"))): _*)
    val base = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
    val merged = l
      .unionByName(sideRow(right, 0, bv = true))
      .unionByName(sideRow(right, 2, bv = false))
      .withColumn("__b", last(col("__bv"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__f", first(col("__fv"), ignoreNulls = true)
        .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("__side") === 1)
    val bt = col(s"__b.$rightTime"); val ft = col(s"__f.$rightTime")
    val useB = bt.isNotNull &&
      (ft.isNull || (col("__t") - bt) <= (ft - col("__t")))
    // A NULL left TIME matches nothing (same rule as the null key): it
    // sorts first in the window, gets no backward carry, but WOULD take
    // the forward pull — gate every emitted value on __t being present so
    // the row carries nulls instead of the earliest right row.
    val tOk = col("__t").isNotNull
    merged.select((leftCols.map(col) ++
      rightVals.map(c =>
        when(tOk,
          when(useB, col(s"__b.$c")).otherwise(col(s"__f.$c"))).as(c)) :+
      when(tOk,
        when(useB, col("__t") - bt).otherwise(ft - col("__t"))).as("delta")): _*)
  }
}
