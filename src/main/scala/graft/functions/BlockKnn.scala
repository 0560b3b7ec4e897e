package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-cell-pair exact kNN block scorer — the tight-loop replacement for
  * materializing every candidate PAIR as a join row.
  *
  * VectorSimJoin.knnJoin's old plan joined vectors through cell-id pairs,
  * which streams one row PER CANDIDATE PAIR through the join, the
  * cosine expression, and the partial top-k aggregate: ~N² rows of join
  * machinery (hash probe, UnsafeRow projection, aggregate update) around
  * a 64-multiply kernel. Exact kNN is Ω(N²) in DOT PRODUCTS — nothing
  * says it must be Ω(N²) in operator rows. This expression takes two
  * whole CELLS packed as arrays (id, v, nrm) and scores the full block
  * product in one eval: unpack to primitive arrays once per call, run
  * the fused dot loop over every (a, b) pair, keep a bounded per-a-row
  * top-k, and emit ≤ |A|·k result structs — so the operator-row volume
  * drops from N² to cells²·blockRows·k while the arithmetic stays
  * identical (same left-to-right dot, same s/(nrmA·nrmB) division, same
  * HALF_UP 4-dp round as Catalyst's Round on DoubleType, so outputs are
  * bit-for-bit unchanged — pinned in VectorSimJoinSpec).
  *
  * CodegenFallback is deliberate: one eval amortizes over |A|·|B| dots
  * (~10⁶ multiplies for √N-sized cells), so per-call boxing is noise,
  * and the inner loops are plain primitive-array JIT fodder.
  */
private[functions] object BlockVec {
  /** Catalyst Round(double, 4, HALF_UP) semantics, replicated exactly.
    * Spark's RoundBase routes DoubleType through
    * BigDecimal(double).setScale(4, HALF_UP).toDouble — ~300 ns of
    * allocation and decimal-string parsing PER PAIR, which at N² pairs
    * was the actual bottleneck of the whole kNN join (not the dots).
    * Fast path: floor(x·10⁴ + 0.5)/10⁴ is bit-identical to the
    * BigDecimal form except possibly within an ε-band of an exact .5
    * boundary (where toString's shortest-decimal view of x can round
    * the other way), so only that band — measure-zero for real cosine
    * data — takes the slow exact path. HALF_UP rounds away from zero,
    * which floor(+0.5) gets wrong for exactly-.5 NEGATIVES; those sit
    * in the band too. */
  def round4(x: Double): Double = {
    val y = x * 10000.0
    val z = y + 0.5
    val f = math.floor(z)
    // band scales with |y| (16 ulp ≈ 8× the worst shortest-decimal /
    // multiply discrepancy) and is measured against the NEAREST integer
    // of z (rint), not floor — a binary y just BELOW the .5 boundary
    // reads diff ≈ 1 under floor and was silently missed. MUST stay in
    // lockstep with FastRound.fastRound and BlockSdc.round6: the specs
    // pin block ≡ join-form bit-for-bit, so both paths must take the
    // slow exact branch on exactly the same inputs.
    if (math.abs(z - math.rint(z)) < 16.0 * math.ulp(math.max(math.abs(y), 1.0)))
      scala.math.BigDecimal(x)
        .setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    else f / 10000.0
  }

  /** Unpack a block of (id, v, nrm) structs to primitive arrays. */
  def unpack(ad: ArrayData)
      : (Array[Long], Array[Array[Double]], Array[Double]) = {
    val n = ad.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val nrms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = ad.getStruct(i, 3)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1).toDoubleArray()
      nrms(i) = row.getDouble(2)
      i += 1
    }
    (ids, vecs, nrms)
  }
}

case class BlockTopK(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with CodegenFallback {
  import BlockVec.{round4, unpack}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("nbr_id", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_block_topk"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (idsA, vecsA, nrmsA) = unpack(a.asInstanceOf[ArrayData])
    val (idsB, vecsB, nrmsB) = unpack(b.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val topScore = new Array[Double](k)
    val topId = new Array[Long](k)
    var ai = 0
    while (ai < idsA.length) {
      val va = vecsA(ai); val na = nrmsA(ai); val ida = idsA(ai)
      var sz = 0
      var bi = 0
      while (bi < idsB.length) {
        val idb = idsB(bi)
        if (idb != ida) {
          val vb = vecsB(bi)
          val n = math.min(va.length, vb.length)
          var s = 0.0
          var i = 0
          while (i < n) { s += va(i) * vb(i); i += 1 }
          val c = round4(s / (na * nrmsB(bi)))
          // bounded insertion under the (score desc, id asc) total order —
          // the same order TopKByScore merges with, so per-block top-k
          // partials compose into the exact global top-k
          if (sz < k || c > topScore(sz - 1) ||
              (c == topScore(sz - 1) && idb < topId(sz - 1))) {
            var p = if (sz < k) sz else k - 1
            while (p > 0 && (c > topScore(p - 1) ||
                   (c == topScore(p - 1) && idb < topId(p - 1)))) {
              topScore(p) = topScore(p - 1); topId(p) = topId(p - 1)
              p -= 1
            }
            topScore(p) = c; topId(p) = idb
            if (sz < k) sz += 1
          }
        }
        bi += 1
      }
      var j = 0
      while (j < sz) {
        out += new GenericInternalRow(
          Array[Any](ida, topId(j), topScore(j)))
        j += 1
      }
      ai += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Threshold sibling of [[BlockTopK]] for the exact similarity JOIN:
  * emits every (id_a < id_b) pair of the block product whose rounded
  * cosine clears `threshold` — the id_a < id_b gate makes each
  * unordered pair surface in exactly ONE of a cell pair's two
  * orientations, so the both-orientations cell-pair frame needs no
  * downstream dedup (the same canonicalization the old per-pair join
  * form applied row-wise). Same arithmetic discipline as BlockTopK:
  * left-to-right dot, nrm division, exact HALF_UP 4-dp round. */
case class BlockSimPairs(left: Expression, right: Expression,
                         threshold: Double)
  extends BinaryExpression with CodegenFallback {
  import BlockVec.{round4, unpack}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cos_sim", DoubleType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_block_simpairs"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (idsA, vecsA, nrmsA) = unpack(a.asInstanceOf[ArrayData])
    val (idsB, vecsB, nrmsB) = unpack(b.asInstanceOf[ArrayData])
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var ai = 0
    while (ai < idsA.length) {
      val va = vecsA(ai); val na = nrmsA(ai); val ida = idsA(ai)
      var bi = 0
      while (bi < idsB.length) {
        val idb = idsB(bi)
        if (ida < idb) {
          val vb = vecsB(bi)
          val n = math.min(va.length, vb.length)
          var s = 0.0
          var i = 0
          while (i < n) { s += va(i) * vb(i); i += 1 }
          val c = round4(s / (na * nrmsB(bi)))
          if (c >= threshold)
            out += new GenericInternalRow(Array[Any](ida, idb, c))
        }
        bi += 1
      }
      ai += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BlockKnn {
  /** Top-k rows of block A against block B (self-pairs excluded), as an
    * array of (vec_id, nbr_id, cos_sim) structs. Blocks are
    * array<struct<id: long, v: array<double>, nrm: double>>. */
  def topkPerBlockPair(blockA: Column, blockB: Column, k: Int): Column =
    ColumnBridge.column(BlockTopK(
      ColumnBridge.expression(blockA), ColumnBridge.expression(blockB), k))

  /** Canonical (id_a < id_b) pairs of the block product with rounded
    * cosine ≥ threshold. */
  def simPairsPerBlockPair(blockA: Column, blockB: Column,
                           threshold: Double): Column =
    ColumnBridge.column(BlockSimPairs(
      ColumnBridge.expression(blockA), ColumnBridge.expression(blockB),
      threshold))
}
