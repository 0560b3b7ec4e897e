package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** IVF cell assignment as a PURE MAP — the expression that removed the
  * SDC ANN join's real bottleneck (operators.SdcKnnJoin).
  *
  * The join-row form cross-joined every vector against the broadcast
  * centroid table and ranked the copies with a row_number window:
  * N·cells join rows (90M at the 100× tier) shuffled and SORTED per
  * vector just to pick the top-nprobe cells — machinery that cost more
  * than the exact join's full block scoring and made the "sub-quadratic
  * sibling" LOSE to its exact twin at every replica tier (round-11
  * verdict). The centroid table is model-sized (≤ 1024 × dim doubles),
  * so it ships INSIDE the expression like SdcLookupSum's table, and one
  * eval scans all cells in a primitive loop: row volume stays N, no
  * exchange, no sort.
  *
  * Output per vector: the top-`nprobe` cells by (cosine desc, cent_id
  * asc) as structs (cell, primary, other_cell, rv) — EXACTLY the
  * multiAssign row shape: sim = dot(v,cv)/(nrm·cnrm) with DotProduct's
  * left-to-right sum, rv = v − cv elementwise, other_cell = the other
  * probed cell id when exactly two copies exist else −1 (the
  * locally-decidable canonicality fact BlockSdcTopK needs). Candidates
  * are scanned in cent_id-ascending order with strict-improvement
  * insertion, so ties keep the lowest cent_id — bit-identical to the
  * (sim desc, cent_id asc) row_number it replaces. */
case class IvfCellProbes(left: Expression, right: Expression,
                         centIds: Array[Int], centVecs: Array[Double],
                         centNrms: Array[Double], nprobe: Int)
  extends BinaryExpression with CodegenFallback {

  private val nCells = centIds.length
  private val dim = if (nCells == 0) 0 else centVecs.length / nCells

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("primary", BooleanType, nullable = false),
    StructField("other_cell", LongType, nullable = false),
    StructField("rv", ArrayType(DoubleType, containsNull = false),
      nullable = false))), containsNull = false)

  override def prettyName: String = "graft_ivf_probes"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    val nrm = b.asInstanceOf[Double]
    val n = math.min(v.length, dim)
    val topSim = new Array[Double](nprobe)
    val topPos = new Array[Int](nprobe)
    var cnt = 0
    var c = 0
    while (c < nCells) {
      // DotProduct's left-to-right fused loop, then the exact Catalyst
      // shape dot / (nrm * cnrm) — bit-identical sims
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { s += v(i) * centVecs(off + i); i += 1 }
      val sim = s / (nrm * centNrms(c))
      // strict-improvement insertion: equal sims never displace an
      // earlier (lower cent_id) candidate — ≡ (sim desc, cent_id asc)
      var pos = cnt
      while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
      if (pos < nprobe) {
        val last = math.min(cnt, nprobe - 1)
        var j = last
        while (j > pos) { topSim(j) = topSim(j - 1); topPos(j) = topPos(j - 1); j -= 1 }
        topSim(pos) = sim
        topPos(pos) = c
        if (cnt < nprobe) cnt += 1
      }
      c += 1
    }
    val out = new Array[Any](cnt)
    var r = 0
    while (r < cnt) {
      val cc = topPos(r)
      val rv = new Array[Double](dim)
      var i = 0
      val off = cc * dim
      while (i < dim) { rv(i) = v(i) - centVecs(off + i); i += 1 }
      val other =
        if (cnt == 2) centIds(topPos(1 - r)).toLong else -1L
      out(r) = new GenericInternalRow(Array[Any](
        centIds(cc), r == 0, other, new GenericArrayData(rv)))
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ encode as a PURE MAP — same motivation as [[IvfCellProbes]].
  *
  * The join-row form exploded each residual into m subvector rows,
  * equi-joined them against the broadcast codebook (m·kCodes rows per
  * vector through a row_number window), and re-assembled the codes with
  * a groupBy + collect_list + array_sort — ~32 shuffled rows and one
  * hash-aggregate per copy for what is arithmetically m·kCodes·(dim/m)
  * multiplies. The codebook is model-sized (m·kCodes·(dim/m) doubles ≤
  * a few KB), so it bakes in as a literal and one eval emits the m-code
  * array directly.
  *
  * Per sub s, code k: d² = (sv·sv − 2·(sv·cv)) + cv·cv with
  * DotProduct's left-to-right sums over the slice (cv·cv precomputed by
  * the SAME loop at construction — deterministic doubles are
  * reproducible), argmin with strict improvement over code_id 1..kCodes
  * so ties keep the lowest code — ≡ the (d2 asc, code_id asc)
  * row_number of ProductQuantizer.encode, bit for bit. */
case class PqEncodeCodes(child: Expression, flatCb: Array[Double],
                         present: Array[Boolean],
                         m: Int, kCodes: Int, dim: Int)
  extends UnaryExpression with CodegenFallback {

  private val w = dim / m

  /** cv·cv per (sub, code), computed with the identical left-to-right
    * loop the eval uses for the other two dots. Missing (sub, code)
    * combos — Lloyd rounds can empty a cluster, so code ids are sparse
    * per sub — carry +∞ so the strict argmin can never select them,
    * exactly as the equi-join form never presented them. */
  private val cbNorm2: Array[Double] = {
    val out = new Array[Double](m * kCodes)
    var sc = 0
    while (sc < m * kCodes) {
      if (present(sc)) {
        var s = 0.0
        var i = 0
        val off = sc * w
        while (i < w) { s += flatCb(off + i) * flatCb(off + i); i += 1 }
        out(sc) = s
      } else out(sc) = Double.PositiveInfinity
      sc += 1
    }
    out
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val rv = input.asInstanceOf[ArrayData].toDoubleArray()
    val codes = new Array[Int](m)
    var sub = 0
    while (sub < m) {
      val svOff = sub * w
      // sv·sv once per sub
      var svv = 0.0
      var i = 0
      while (i < w) { svv += rv(svOff + i) * rv(svOff + i); i += 1 }
      var bestD = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < kCodes) {
        val cOff = (sub * kCodes + k) * w
        var svc = 0.0
        i = 0
        while (i < w) { svc += rv(svOff + i) * flatCb(cOff + i); i += 1 }
        val d = svv - 2.0 * svc + cbNorm2(sub * kCodes + k)
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      codes(sub) = bestK + 1 // code ids are 1-based (row_number seeds)
      sub += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfProbe {
  /** Top-`nprobe` probed cells of `v` as (cell, primary, other_cell, rv)
    * structs; `cents` rows are (cent_id: Int, cv: Seq[Double],
    * cnrm: Double) pulled via util.Local.modelRows. */
  def cellProbes(v: Column, nrm: Column,
                 cents: Array[org.apache.spark.sql.Row],
                 nprobe: Int): Column = {
    val sorted = cents.map(r =>
        (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val dim = if (sorted.isEmpty) 0 else sorted.head._2.length
    val flat = new Array[Double](sorted.length * dim)
    sorted.zipWithIndex.foreach { case ((_, cv, _), i) =>
      System.arraycopy(cv, 0, flat, i * dim, dim) }
    ColumnBridge.column(IvfCellProbes(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      sorted.map(_._1), flat, sorted.map(_._3), nprobe))
  }

  /** m-code PQ encoding of a residual; `cb` rows are (sub: Int,
    * code_id: Int, cv: Seq[Double]) pulled via util.Local.modelRows. */
  def pqEncode(rv: Column, cb: Array[org.apache.spark.sql.Row],
               m: Int, kCodes: Int, dim: Int): Column = {
    val w = dim / m
    // code ids are SPARSE per sub (Lloyd rounds can empty a cluster) —
    // absent combos are flagged so the argmin can never pick them
    val flat = new Array[Double](m * kCodes * w)
    val present = new Array[Boolean](m * kCodes)
    cb.foreach { r =>
      val sub = r.getInt(0)
      val code = r.getInt(1) - 1
      require(sub >= 0 && sub < m && code >= 0 && code < kCodes,
        s"codebook row (sub=$sub, code=${code + 1}) outside $m x $kCodes")
      val cv = r.getSeq[Double](2).toArray
      System.arraycopy(cv, 0, flat, (sub * kCodes + code) * w, w)
      present(sub * kCodes + code) = true
    }
    ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(rv), flat, present, m, kCodes, dim))
  }
}
