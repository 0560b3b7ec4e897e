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
  require(nCells > 0, "graft_ivf_probes: empty centroid table — the " +
    "replaced crossJoin form yielded empty output; train cells first")

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
    // the rv loop below reads v(0..dim); fail the invariant loudly
    // instead of AIOOBE (the replaced zip_with form silently truncated)
    require(v.length == dim,
      s"graft_ivf_probes: vector dim ${v.length} != centroid dim $dim")
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

/** Per-subvector nearest-codeword pick as a PURE MAP — the
  * subspace-grain sibling of [[PqEncodeCodes]] for frames already at
  * (vec_id, sub, sv) grain: ProductQuantizer's Lloyd rounds and encode
  * ran a row_number window over N·m·kCodes join rows per call; here the
  * model-sized codebook bakes in and one eval does the kCodes-way
  * argmin for its row's sub in a primitive loop. Same semantics as
  * ProductQuantizer.encode's (d2 asc, code_id asc) window: d² =
  * (sv·sv − 2·(sv·cv)) + cv·cv with left-to-right sums, strict
  * improvement over ascending code ids, Lloyd-emptied codes carry +∞
  * norms so they can never win. Returns the 1-based code id. */
case class PqNearestCode(left: Expression, right: Expression,
                         flatCb: Array[Double], present: Array[Boolean],
                         kCodes: Int, w: Int)
  extends BinaryExpression with CodegenFallback {

  private val cbNorm2: Array[Double] = {
    val out = new Array[Double](present.length)
    var sc = 0
    while (sc < present.length) {
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

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_pq_code"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[Int]
    val sv = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(sv.length, w)
    var svv = 0.0
    var i = 0
    while (i < n) { svv += sv(i) * sv(i); i += 1 }
    var bestD = Double.PositiveInfinity
    var bestK = 0
    var k = 0
    while (k < kCodes) {
      val cOff = (sub * kCodes + k) * w
      var svc = 0.0
      i = 0
      while (i < n) { svc += sv(i) * flatCb(cOff + i); i += 1 }
      val d = svv - 2.0 * svc + cbNorm2(sub * kCodes + k)
      if (d < bestD) { bestD = d; bestK = k }
      k += 1
    }
    bestK + 1
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Single nearest-cell pick as a PURE MAP — the one-cell specialization
  * of [[IvfCellProbes]] shared by every argmax-cosine / argmin-angle
  * assignment site (VectorSimJoin.assignments, IvfKMeans' Lloyd rounds
  * and assignClusters, SemDedup, AnnIndex.assign): the N·k crossJoin
  * rows those sites pushed through a window sort or a min_by aggregate
  * become one primitive scan per vector.
  *
  * `emitTheta = false`: score = sim = dot/(nrm·cnrm), pick by
  * (sim desc, cent_id asc) — the row_number tie order, exactly,
  * INCLUDING Spark's NaN-largest descending order: a NaN sim (zero-norm
  * vector or centroid → 0/0) wins over every finite sim, as the
  * replaced orderBy(sim.desc) window ranked it.
  * `emitTheta = true`: score = acos(clamp(sim)) with Spark's
  * least/greatest NaN semantics (a NaN sim clamps to 1.0 → theta 0),
  * pick by theta strictly ascending — ≡ min_by(cent_id, theta) with
  * the tie broken to the lowest cent_id (min_by's tie pick is
  * partition-order-dependent; exact-operator outputs are provably
  * invariant to the assignment, so the deterministic tie is safe and
  * strictly better). Returns struct(cell: long, score: double). */
case class NearestCellScore(left: Expression, right: Expression,
                            centIds: Array[Long], centVecs: Array[Double],
                            centNrms: Array[Double], emitTheta: Boolean)
  extends BinaryExpression with CodegenFallback {

  private val nCells = centIds.length
  private val dim = if (nCells == 0) 0 else centVecs.length / nCells
  require(nCells > 0, "graft_nearest_cell: empty centroid table — the " +
    "replaced crossJoin form yielded empty output; train cells first")

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def prettyName: String = "graft_nearest_cell"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    val nrm = b.asInstanceOf[Double]
    val n = math.min(v.length, dim)
    var bestScore = if (emitTheta) Double.PositiveInfinity
                    else Double.NegativeInfinity
    var bestIdx = -1
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { s += v(i) * centVecs(off + i); i += 1 }
      val sim = s / (nrm * centNrms(c))
      val score =
        if (emitTheta) {
          // Catalyst's least(1, greatest(-1, sim)): NaN is the LARGEST
          // double in Spark's ordering, so a NaN sim clamps to 1.0
          val clamped =
            if (sim.isNaN) 1.0 else math.min(1.0, math.max(-1.0, sim))
          java.lang.Math.acos(clamped)
        } else sim
      // sim mode mirrors the replaced orderBy(sim.desc): Spark ranks
      // NaN as the LARGEST double, so a NaN sim (zero-norm vector or
      // centroid) wins over any finite sim — first NaN keeps the
      // lowest cent_id, matching row_number's tie order
      val better =
        if (emitTheta) score < bestScore
        else (score.isNaN && !bestScore.isNaN) ||
             (!bestScore.isNaN && score > bestScore)
      if (better || bestIdx < 0) { bestScore = score; bestIdx = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](centIds(bestIdx), bestScore))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfProbe {

  /** Flatten model rows (id, cv, cnrm) — id Int or Long — into the
    * literal arrays the expressions ship, sorted by id so ascending-id
    * scans reproduce the (score, cent_id asc) tie order. */
  private def flatten(cents: Array[org.apache.spark.sql.Row])
      : (Array[Long], Array[Double], Array[Double]) = {
    val sorted = cents.map { r =>
      val id = r.get(0) match {
        case i: Int => i.toLong
        case l: Long => l
        case x => sys.error(s"unsupported cent id type: $x")
      }
      (id, r.getSeq[Double](1).toArray, r.getDouble(2))
    }.sortBy(_._1)
    val dim = if (sorted.isEmpty) 0 else sorted.head._2.length
    val flat = new Array[Double](sorted.length * dim)
    sorted.zipWithIndex.foreach { case ((_, cv, _), i) =>
      System.arraycopy(cv, 0, flat, i * dim, dim) }
    (sorted.map(_._1), flat, sorted.map(_._3))
  }

  /** struct(cell: long, score) — nearest cell of `v` (see
    * [[NearestCellScore]]); `cents` rows are (id, cv, cnrm) via
    * util.Local.modelRows. */
  def nearestCell(v: Column, nrm: Column,
                  cents: Array[org.apache.spark.sql.Row],
                  emitTheta: Boolean): Column = {
    val (ids, flat, nrms) = flatten(cents)
    ColumnBridge.column(NearestCellScore(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm),
      ids, flat, nrms, emitTheta))
  }
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

  /** 1-based nearest-codeword id for a (sub, sv) row — the
    * subspace-grain encode (see [[PqNearestCode]]); `cb` rows are
    * (sub: Int, code_id: Int, cv: Seq[Double]) via util.Local.modelRows,
    * shape inferred from the rows. */
  def pqNearestCode(sub: Column, sv: Column,
                    cb: Array[org.apache.spark.sql.Row]): Column = {
    require(cb.nonEmpty, "empty codebook")
    val m = cb.map(_.getInt(0)).max + 1
    val kCodes = cb.map(_.getInt(1)).max
    val w = cb.head.getSeq[Double](2).size
    val flat = new Array[Double](m * kCodes * w)
    val present = new Array[Boolean](m * kCodes)
    cb.foreach { r =>
      val s = r.getInt(0)
      val code = r.getInt(1) - 1
      System.arraycopy(r.getSeq[Double](2).toArray, 0, flat,
        (s * kCodes + code) * w, w)
      present(s * kCodes + code) = true
    }
    ColumnBridge.column(PqNearestCode(
      ColumnBridge.expression(sub), ColumnBridge.expression(sv),
      flat, present, kCodes, w))
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
