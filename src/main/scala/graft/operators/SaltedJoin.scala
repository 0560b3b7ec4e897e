package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the (possibly hot-keyed) left side into
  * `n` sub-keys and replicate the right side `n`× , so one hot key spreads
  * over `n` reducers instead of serializing on one. The result set is
  * IDENTICAL to the plain equi-join — each left row meets each matching
  * right row exactly once (on its own salt) — which is why the declared
  * query using this operator can share the plain join's SQL oracle.
  *
  * The salt is a deterministic function of row content (no rand(), which
  * would break retries/speculative execution — a failed task must re-salt
  * identically). At 100 TB, `n` is sized to the observed hot-key factor or
  * replaced by AQE's skew-join split; this operator is the explicit,
  * plannable form.
  */
object SaltedJoin {
  /** @param left      fact side (potentially skewed on `leftKey`)
    * @param right     dim side to replicate (keep small — it is sent n×)
    * @param leftKey   join key column on the left
    * @param rightKey  join key column on the right
    * @param saltSrc   left column(s) driving the deterministic salt
    * @param n         salt fan-out */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           saltSrc: Seq[Column], n: Int): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(saltSrc: _*), lit(n.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    // side-qualified refs: col(key) alone is AMBIGUOUS_REFERENCE whenever
    // both sides share the key's column name (the common equi-join shape)
    l.join(r, l("__salt") === r("__salt") &&
        l(leftKey) === r(rightKey))
      .drop("__salt")
  }
}
