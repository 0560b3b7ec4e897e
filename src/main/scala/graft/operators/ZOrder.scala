package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve for multi-dimensional data layout.
  *
  * At 100 TB the scan cost of a 2-d box predicate is decided by LAYOUT,
  * not by the filter: parquet row-group min/max stats can only skip
  * row groups whose value RANGES miss the predicate, and a file sorted
  * by one key interleaves the other key's values across every row
  * group. Ordering the write by the Morton interleave of both keys
  * makes every row group a small rectangle in (x, y) space, so a box
  * predicate touches only the row groups its rectangle overlaps —
  * the same trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies.
  *
  * The interleave is pure int64 bit arithmetic (shiftleft / & / |),
  * fully codegen'd by Catalyst — no UDF, no shuffle beyond the range
  * partition of the write itself.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (the classic magic-mask doubling sequence). */
  private def spread16(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val c = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = c.bitwiseOR(shiftleft(c, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton code of the low 16 bits of two non-negative int columns:
    * x in the even bits, y in the odd bits. Total order over the
    * 65536×65536 grid following the Z curve. */
  def morton(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1)).as("zorder")

  /** Min-max scale a column to the full 16-bit grid axis [0, 65535].
    * Raw interleaving of two columns with different value RANGES
    * degenerates to a 1-d sort on the wider column (its high bits
    * dominate every comparison); scaling first gives both dimensions
    * equal weight — the same range-normalization Delta/Iceberg apply
    * before Z-ordering. Exact int64 arithmetic: (c-min)*65535 stays
    * below 2^48 for any 32-bit dimension domain — callers with wider
    * domains must use [[scaleTo16Wide]] (the multiply overflows past
    * ~2^47 and the double quotient loses floor exactness past ~2^37;
    * Graft.writeZOrdered guards this). */
  def scaleTo16(c: Column, mn: Column, mx: Column): Column =
    // floor of the double quotient is exact here: numerator < 2^32, so
    // the quotient's ulp (≤ 2^-21 at 65535) is far smaller than the
    // 1/(mx-mn) ≥ 2^-16 gap to the nearest integer boundary
    when(mx === mn, lit(0L)).otherwise(
      floor(((c - mn) * lit(65535L)) / (mx - mn)))

  /** Shift for [[scaleTo16Wide]]: the smallest k with range >> k ≤
    * 65535. Driver-side, exact for any int64 range ≥ 0. */
  def gridShift(range: Long): Int = {
    require(range >= 0, s"zorder range must be non-negative, got $range")
    math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(range) - 16)
  }

  /** Min-max scale into the 16-bit grid for ANY int64 dimension
    * domain: (c - mn) >> k with a driver-known power-of-two bucket
    * width — pure int64 arithmetic, nothing multiplies, so nothing
    * overflows (vs [[scaleTo16]]'s ~32-bit-domain limit). The
    * power-of-two width wastes at most half the grid axis — layout
    * granularity, not correctness. `mn`/`shift` come from one 4-value
    * stats agg per write (every ZORDER OPTIMIZE runs that pass). */
  def scaleTo16Wide(c: Column, mn: Long, shift: Int): Column =
    shiftright(c.cast("long") - lit(mn), shift)
}
