package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, TimestampType}

/** Determinism helpers — the SURVEY.md §7.6 contract in code.
  *
  * The driver hash-compares every declared query's parquet output against a
  * DuckDB run of the oracle SQL, so results must be bit-stable across two
  * engines with different summation order and timestamp precision:
  *
  *  - Double sums drift by ULPs with partition order. Summing after a cast
  *    to DECIMAL(28,4) makes addition exact and order-independent; casting
  *    the final decimal back to double is then identical on both engines
  *    (values ≪ 2^53). DuckDB twin: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`.
  *  - `events.ts` is ns in parquet; Spark truncates to µs, DuckDB keeps ns.
  *    All timestamp outputs/comparisons go through epoch integers
  *    (`unix_micros`/`unix_millis` ≙ DuckDB `epoch_us`/`epoch_ms`), which
  *    truncate identically.
  *  - round() is only applied to values that are already bit-identical on
  *    both sides (per-row IEEE arithmetic, or decimal-exact sums), where
  *    HALF_UP halfway cases cannot arise from full-precision doubles.
  */
object Det {
  /** Order-independent exact sum of a money/measure double, as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Exact mean via decimal sum / count, rounded — identical on both engines. */
  def davg(c: Column, dp: Int = 4): Column =
    round(dsum(c) / count(lit(1)), dp)

  /** DuckDB twin of [[dsum]]. */
  def sqlDsum(x: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($x AS DECIMAL(28,$scale))) AS DOUBLE)"

  /** DuckDB twin of [[davg]]. */
  def sqlDavg(x: String, dp: Int = 4): String =
    s"ROUND(${sqlDsum(x)} / COUNT(*), $dp)"

  /** Timestamp → epoch microseconds (DuckDB twin: epoch_us).
    * Fixtures are TIMESTAMP_NTZ (pyarrow writes no tz); unix_micros only
    * accepts TIMESTAMP, so cast first — value-preserving under the UTC
    * session timezone the harness pins. */
  def epochUs(c: Column): Column = unix_micros(c.cast(TimestampType))

  /** Timestamp → epoch milliseconds (DuckDB twin: epoch_ms). */
  def epochMs(c: Column): Column = unix_millis(c.cast(TimestampType))
}
