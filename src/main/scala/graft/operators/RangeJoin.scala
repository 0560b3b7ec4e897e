package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure range (band) join — `|left.v − right.v| ≤ band` with NO equi key.
  *
  * Spark's planner can only run such a predicate as a broadcast
  * nested-loop or cartesian join: O(|L|·|R|) comparisons and one side
  * materialized whole — dead at 100 TB. The standard scalable rewrite
  * (the same one Databricks' range-join hint and every interval-join
  * engine use) turns the band into an EQUI key by bucketizing:
  *
  *   bucket(v) = v div band            (right side: its own bucket)
  *   left probes buckets {b−1, b, b+1} (explode ×3)
  *
  * `|vl − vr| ≤ band ⟹ |bucket(vl) − bucket(vr)| ≤ 1`, so every
  * qualifying pair meets in exactly ONE (probe, bucket) slot — the right
  * row's bucket is a single value, and the left row probes it once. The
  * join is then a plain shuffle equi-join on the bucket id (hash
  * partitionable across 1000 executors, AQE-skew-splittable) with the
  * exact band predicate as a residual — no candidate is double-counted,
  * so no dedup pass is needed, and the 3× left-side inflation is the
  * entire cost.
  *
  * Values must be INTEGRAL (fixed-point-scale doubles first: cents, µs,
  * …). Integer `div` makes bucket assignment exact on every engine; a
  * floating divide could mis-bucket a value sitting one ULP from a
  * boundary and silently lose its edge pair.
  */
object RangeJoin {

  /** Band join on integral value columns; emits all (left, right) pairs
    * with `|leftVal − rightVal| ≤ band`. Column names must be disjoint
    * across the two inputs (rename before a self-join). */
  def join(left: DataFrame, right: DataFrame,
           leftVal: String, rightVal: String, band: Long): DataFrame = {
    require(band > 0, s"band must be positive, got $band")
    // exact integer floor-div (Spark's `div` truncates toward zero, which
    // would fold buckets −0 and 0 together for negative values):
    // (v − pmod(v, band)) / band, all int64 arithmetic.
    def ibucket(v: Column): Column =
      ((v - pmod(v, lit(band))) / lit(band)).cast("long")
    val l = left.withColumn("__probe",
      explode(array(ibucket(col(leftVal)) - 1, ibucket(col(leftVal)),
                    ibucket(col(leftVal)) + 1)))
    val r = right.withColumn("__bucket", ibucket(col(rightVal)))
    l.join(r, l("__probe") === r("__bucket") &&
        abs(col(leftVal) - col(rightVal)) <= lit(band))
      .drop("__probe", "__bucket")
  }
}
