package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-cell-slice SDC kNN block scorer — the [[BlockTopK]] treatment
  * applied to PQ-coded pairs (operators.SdcKnnJoin).
  *
  * The join-row form streamed ~N²/cells pair rows through a hash join,
  * a cross-cell canonical-estimate aggregate (nearly no reduction:
  * 5.92M groups from 6.06M rows at the 10× tier), and a per-pair round.
  * This expression takes two slices of ONE cell's coded copies and
  * scores the full ordered product in primitive loops: m table lookups
  * per pair, a bounded per-row top-k, and ≤ |A|·k emitted structs.
  *
  * The cross-cell aggregate disappears because canonicality is decided
  * LOCALLY: at nprobe ≤ 2, a pair (a, b) meeting in cell C also meets
  * in at most ONE other cell D — and D is computable inside the eval
  * (D = a's other probed cell when it equals b's, else no second
  * meeting). The canonical estimate is the one with the best
  * (secondary-copy count, cell id) priority, exactly the old
  * aggregate's (np, cell) struct-min: emit from C iff D is absent or
  * (np_C, C) < (np_D, D), where np_D = 2 − np_C (a copy primary in C
  * is secondary in D and vice versa). Every pair thus surfaces from
  * exactly one cell with exactly the estimate the old plan kept —
  * SdcKnnJoinSpec pins block ≡ join-form bit-for-bit.
  *
  * Distances are rounded to 6 dp inside the eval with the
  * [[FastRound]] fast path (the old plan's per-pair BigDecimal), and
  * the per-row top-k selects under (rounded d asc, id asc) — the total
  * order TopKByScore merges with downstream. */
case class BlockSdcTopK(first: Expression, second: Expression,
                        third: Expression,
                        table: Array[Double], kCodes: Int, k: Int)
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("nbr_id", LongType, nullable = false),
    StructField("approx_d2", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_block_sdc_topk"

  private def round6(x: Double): Double = {
    val y = x * 1e6
    val z = y + 0.5
    val f = math.floor(z)
    // ulp-scaled band measured against rint(z), in lockstep with
    // FastRound.fastRound (the join-form path this expression is
    // spec-pinned bit-identical to): a fixed 1e-9 band under-covers
    // once |y| ≳ 4.5e6 — reachable here, since y is a squared distance
    // × 10⁶ — and a floor-based diff misses the just-below-boundary
    // half of the cases entirely
    if (math.abs(z - math.rint(z)) < 16.0 * math.ulp(math.max(math.abs(y), 1.0)))
      scala.math.BigDecimal(x)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    else f / 1e6
  }

  /** (ids, codes, primary, otherCell) from a block of structs. */
  private def unpack(ad: ArrayData)
      : (Array[Long], Array[Array[Int]], Array[Boolean], Array[Long]) = {
    val n = ad.numElements()
    val ids = new Array[Long](n)
    val codes = new Array[Array[Int]](n)
    val prim = new Array[Boolean](n)
    val other = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = ad.getStruct(i, 4)
      ids(i) = row.getLong(0)
      codes(i) = row.getArray(1).toIntArray()
      prim(i) = row.getBoolean(2)
      other(i) = row.getLong(3)
      i += 1
    }
    (ids, codes, prim, other)
  }

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val (idsA, codesA, primA, otherA) = unpack(a.asInstanceOf[ArrayData])
    val (idsB, codesB, primB, otherB) = unpack(b.asInstanceOf[ArrayData])
    val cell = c.asInstanceOf[Long]
    val kk = kCodes * kCodes
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val topScore = new Array[Double](k)
    val topId = new Array[Long](k)
    var ai = 0
    while (ai < idsA.length) {
      val ida = idsA(ai); val ca = codesA(ai)
      val pa = primA(ai); val oa = otherA(ai)
      var sz = 0
      var bi = 0
      while (bi < idsB.length) {
        val idb = idsB(bi)
        if (idb != ida) {
          // local canonicality: the pair meets again in D iff both
          // copies' other cells agree; emit from the better (np, cell)
          val sameOther = oa >= 0L && oa == otherB(bi)
          val npC = 2 - (if (pa) 1 else 0) - (if (primB(bi)) 1 else 0)
          val canonical = !sameOther || {
            val npD = 2 - npC
            npC < npD || (npC == npD && cell < oa)
          }
          if (canonical) {
            val cb = codesB(bi)
            val m = math.min(ca.length, cb.length)
            var s = 0.0
            var i = 0
            while (i < m) {
              s += table(i * kk + (ca(i) - 1) * kCodes + (cb(i) - 1))
              i += 1
            }
            val d = round6(s)
            // bounded insertion under (d asc, id asc) — the order the
            // downstream topk(-approx_d2, nbr_id) merge ranks with
            if (sz < k || d < topScore(sz - 1) ||
                (d == topScore(sz - 1) && idb < topId(sz - 1))) {
              var p = if (sz < k) sz else k - 1
              while (p > 0 && (d < topScore(p - 1) ||
                     (d == topScore(p - 1) && idb < topId(p - 1)))) {
                topScore(p) = topScore(p - 1); topId(p) = topId(p - 1)
                p -= 1
              }
              topScore(p) = d; topId(p) = idb
              if (sz < k) sz += 1
            }
          }
        }
        bi += 1
      }
      var j = 0
      while (j < sz) {
        out += new GenericInternalRow(Array[Any](ida, topId(j), topScore(j)))
        j += 1
      }
      ai += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BlockSdc {
  /** Top-k SDC rows of coded block A against coded block B of the same
    * cell (`cell` column), canonical across multi-probe duplicates.
    * Blocks are array<struct<id: long, codes: array<int>, p: boolean,
    * other: long>>. */
  def topkPerSlicePair(blockA: Column, blockB: Column, cell: Column,
                       table: Array[Double], kCodes: Int, k: Int): Column =
    ColumnBridge.column(BlockSdcTopK(
      ColumnBridge.expression(blockA), ColumnBridge.expression(blockB),
      ColumnBridge.expression(cell), table, kCodes, k))
}
