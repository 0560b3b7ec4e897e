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

  /** Reassociated 4-accumulator dot — the PREFILTER kernel. The exact
    * left-to-right dot the outputs are defined by is one serial add
    * dependency chain (~4 cycles per element of pure latency); four
    * independent chains let the JIT overlap them, so a screening pass
    * costs ~¼ of the exact dot. NOT bit-identical to left-to-right —
    * callers may use it only on the sound-skip side of a margin:
    * both orders are within (n+2)·u·Σ|aᵢbᵢ| of the true product and
    * Σ|aᵢbᵢ| ≤ |a||b| (Cauchy–Schwarz), so
    * |fastDot − exactDot| ≤ 2(n+2)·u·|a||b| < 1e-5·|a||b| for any
    * conceivable dimension (n ≤ 4×10¹⁰ at u = 2⁻⁵³). */
  def fastDot(va: Array[Double], vb: Array[Double], n: Int): Double =
    if (simdAvailable) SimdDot.dot(va, vb, n)
    else {
      var s0 = 0.0; var s1 = 0.0; var s2 = 0.0; var s3 = 0.0
      var i = 0
      val n4 = n - 3
      while (i < n4) {
        s0 += va(i) * vb(i); s1 += va(i + 1) * vb(i + 1)
        s2 += va(i + 2) * vb(i + 2); s3 += va(i + 3) * vb(i + 3)
        i += 4
      }
      while (i < n) { s0 += va(i) * vb(i); i += 1 }
      (s0 + s1) + (s2 + s3)
    }

  /** True iff the SIMD kernel's incubator module is present in this JVM
    * (build.sbt passes --add-modules=jdk.incubator.vector; a deployment
    * that doesn't keeps the scalar 4-accumulator kernel). Probed ONCE at
    * class init: the scalar branch never touches the SimdDot symbol, so
    * a module-less JVM never triggers the linkage error again. Both
    * kernels carry the same reassociation-error bound, so the margin
    * proof below is kernel-independent. */
  private val simdAvailable: Boolean =
    try SimdDot.dot(Array(2.0), Array(3.0), 1) == 6.0
    catch { case _: Throwable => false }

  /** Margin between a SKIP threshold expressed on the rounded cosine and
    * the prefilter cutoff applied to [[fastDot]]: 5e-5 of HALF_UP round
    * slack (raw < T − 5e-5 ⇒ round4(raw) < T for any T) plus 1e-5 ≫ the
    * reassociation error bound above. A pair skipped at
    * fastDot < (T − SkipMargin)·|a||b| provably cannot round to ≥ T, so
    * two-phase scoring is bit-identical to always-exact scoring. */
  val SkipMargin: Double = 6e-5

  /** Unpack a block of (id, v, nrm) structs to primitive arrays, SORTED
    * ascending by id. Sorting (≤ MaxBlockRows·log per eval — noise next
    * to the block product it fronts) is what turns the orientation /
    * self-exclusion gates into RANGES: BlockSimPairs screens only the
    * idb > ida suffix (binary search, zero per-row compares) and both
    * scorers can hand a contiguous range to the batched SIMD screen.
    * Outputs are order-insensitive — BlockTopK selects under a total
    * order and BlockSimPairs' pair SET is gate-determined — so the
    * iteration-order change is invisible downstream (specs pin it). */
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
    sortByIds(ids, vecs, nrms, 0, n - 1)
    (ids, vecs, nrms)
  }

  /** In-place quicksort of the three parallel block arrays by id
    * (median-of-three pivot; blocks are ≤ MaxBlockRows so recursion
    * depth is bounded and allocation-free beats boxing an index sort). */
  private def sortByIds(ids: Array[Long], vecs: Array[Array[Double]],
                        nrms: Array[Double], lo0: Int, hi0: Int): Unit = {
    if (lo0 >= hi0) return
    @inline def swap(i: Int, j: Int): Unit = {
      val t = ids(i); ids(i) = ids(j); ids(j) = t
      val tv = vecs(i); vecs(i) = vecs(j); vecs(j) = tv
      val tn = nrms(i); nrms(i) = nrms(j); nrms(j) = tn
    }
    val mid = (lo0 + hi0) >>> 1
    if (ids(mid) < ids(lo0)) swap(mid, lo0)
    if (ids(hi0) < ids(lo0)) swap(hi0, lo0)
    if (ids(hi0) < ids(mid)) swap(hi0, mid)
    val pivot = ids(mid)
    var i = lo0; var j = hi0
    while (i <= j) {
      while (ids(i) < pivot) i += 1
      while (ids(j) > pivot) j -= 1
      if (i <= j) { swap(i, j); i += 1; j -= 1 }
    }
    sortByIds(ids, vecs, nrms, lo0, j)
    sortByIds(ids, vecs, nrms, i, hi0)
  }

  /** First index in sorted `ids` with ids(i) > x (= ids.length if none). */
  def upperBound(ids: Array[Long], x: Long): Int = {
    var lo = 0; var hi = ids.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ids(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Batched prefilter over rows [from, to) of a block: writes indices
    * whose [[fastDot]]-class dot with `va` clears `cutNa · nrms(i)` into
    * `hits`, returns the count. SIMD path register-blocks 4 rows per
    * a-vector load (SimdDot.screen — the load-bound kernel's remaining
    * 2× after single-row SIMD); the scalar fallback is the plain
    * per-row 4-accumulator screen. Same reassociation-error bound as
    * [[fastDot]], so the [[SkipMargin]] proof covers every path. */
  def screen(va: Array[Double], vbs: Array[Array[Double]],
             nrms: Array[Double], from: Int, to: Int, cutNa: Double,
             hits: Array[Int]): Int =
    if (simdAvailable) SimdDot.screen(va, vbs, nrms, from, to, cutNa, hits)
    else {
      var m = 0
      var i = from
      while (i < to) {
        val vb = vbs(i)
        if (fastDot(va, vb, math.min(va.length, vb.length))
              >= cutNa * nrms(i)) { hits(m) = i; m += 1 }
        i += 1
      }
      m
    }
}

case class BlockTopK(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with CodegenFallback {
  import BlockVec.{round4, unpack, SkipMargin}

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
    val hits = new Array[Int](idsB.length)
    var ai = 0
    while (ai < idsA.length) {
      val va = vecsA(ai); val na = nrmsA(ai); val ida = idsA(ai)
      var sz = 0
      // exact insertion under the (score desc, id asc) total order —
      // the same order TopKByScore merges with, so per-block top-k
      // partials compose into the exact global top-k
      @inline def insert(bi: Int): Unit = {
        val idb = idsB(bi)
        if (idb != ida) {
          val vb = vecsB(bi)
          val n = math.min(va.length, vb.length)
          var s = 0.0
          var i = 0
          while (i < n) { s += va(i) * vb(i); i += 1 }
          val c = round4(s / (na * nrmsB(bi)))
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
      }
      // two-phase scoring: fill the heap exactly, then batch-screen the
      // rest with the kth score CAPTURED AT SCREEN TIME. A pair whose
      // reassociated dot sits below (kth − SkipMargin)·|a||b| provably
      // cannot displace the kth entry (round slack + reassociation
      // error both inside the margin — BlockVec.SkipMargin); a stale —
      // i.e. lower — capture only ADMITS extra pairs, and every
      // admitted pair flows through the same exact insertion in the
      // same order, so the final heap is bit-identical to the all-exact
      // form (VectorSimJoinSpec pins block ≡ join-form). Screening in
      // chunks re-captures the rising kth score every `Chunk` rows,
      // keeping the admit rate near the per-pair-exact form's without
      // paying a per-pair branch.
      var bi = 0
      while (bi < idsB.length && sz < k) { insert(bi); bi += 1 }
      val Chunk = 256
      while (bi < idsB.length) {
        val hi = math.min(bi + Chunk, idsB.length)
        val m = BlockVec.screen(va, vecsB, nrmsB, bi, hi,
          (topScore(k - 1) - SkipMargin) * na, hits)
        var h = 0
        while (h < m) { insert(hits(h)); h += 1 }
        bi = hi
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
  import BlockVec.{round4, unpack, SkipMargin}

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
    val hits = new Array[Int](idsB.length)
    var ai = 0
    while (ai < idsA.length) {
      val va = vecsA(ai); val na = nrmsA(ai); val ida = idsA(ai)
      // two-phase scoring (the BlockTopK discipline): the batched
      // prefilter (BlockVec.screen) admits only pairs whose reassociated
      // dot reaches (threshold − SkipMargin)·|a||b| — anything below
      // provably cannot round to ≥ threshold — and the exact serial dot
      // runs only on those survivors. Blocks are id-sorted, so the
      // id_a < id_b orientation gate is the binary-searched suffix
      // [lo, nB): no per-row id compares, and the screen's 4-row
      // register blocking sees a contiguous range. Bit-identical to the
      // all-exact form by the margin proof (specs pin it).
      val lo = BlockVec.upperBound(idsB, ida)
      val m = BlockVec.screen(va, vecsB, nrmsB, lo, idsB.length,
        (threshold - SkipMargin) * na, hits)
      var h = 0
      while (h < m) {
        val bi = hits(h)
        val vb = vecsB(bi)
        val n = math.min(va.length, vb.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += va(i) * vb(i); i += 1 }
        val c = round4(s / (na * nrmsB(bi)))
        if (c >= threshold)
          out += new GenericInternalRow(Array[Any](ida, idsB(bi), c))
        h += 1
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
