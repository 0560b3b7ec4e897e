package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Second-moment accumulator for a d-dim vector column: count, per-dim
  * sums, and the UPPER-TRIANGLE of Σ x xᵀ in one flat buffer
  * (1 + d + d(d+1)/2 doubles; d=64 → 2,145 — model-sized however large
  * the corpus). */
final class GramBuffer(val dim: Int) {
  val tri: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  val sums = new Array[Double](dim)
  val gram = new Array[Double](tri)

  def add(v: ArrayData): Unit = {
    n += 1
    var i = 0
    var t = 0
    while (i < dim) {
      val xi = v.getDouble(i)
      sums(i) += xi
      var j = i
      while (j < dim) { gram(t) += xi * v.getDouble(j); j += 1; t += 1 }
      i += 1
    }
  }

  def addAll(o: GramBuffer): Unit = {
    n += o.n
    var i = 0
    while (i < dim) { sums(i) += o.sums(i); i += 1 }
    var t = 0
    while (t < tri) { gram(t) += o.gram(t); t += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (dim + tri))
    bb.putLong(n)
    sums.foreach(bb.putDouble)
    gram.foreach(bb.putDouble)
    bb.array()
  }
}

object GramBuffer {
  def fromBytes(dim: Int, bytes: Array[Byte]): GramBuffer = {
    val b = new GramBuffer(dim)
    val bb = ByteBuffer.wrap(bytes)
    b.n = bb.getLong
    var i = 0
    while (i < dim) { b.sums(i) = bb.getDouble; i += 1 }
    var t = 0
    while (t < b.tri) { b.gram(t) = bb.getDouble; t += 1 }
    b
  }
}

/** `gram_agg(v, d)` — the covariance-input fold as ONE aggregate
  * (SURVEY §4.3): the declarative form (double explode to (i, j, xᵢxⱼ)
  * cells + groupBy) materializes d²/2 rows PER INPUT ROW before the
  * partial agg collapses them — measured 2.8 s at sf0.1 on q_embed_pca,
  * ~6× the family median, all interpretation and row churn. This
  * aggregate accumulates the flat buffer directly in update() — zero
  * intermediate rows, map-side partials merged as 2,145-double adds —
  * the TopKByScore shuffle discipline applied to second moments.
  * Output: [n, sums(0..d), gram upper-triangle] as array<double>.
  *
  * Double sums re-associate across partitionings (same caveat as every
  * float aggregate here): replay-stable on a fixed plan+fixture, and
  * the consuming surface (q_embed_pca) is test-oracled with tolerances,
  * never hash-compared. */
case class GramAgg(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  override def update(b: GramBuffer, in: InternalRow): GramBuffer = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: GramBuffer, o: GramBuffer): GramBuffer = {
    b.addAll(o); b
  }

  override def eval(b: GramBuffer): Any = {
    val out = new Array[Any](1 + b.dim + b.tri)
    out(0) = b.n.toDouble
    var i = 0
    while (i < b.dim) { out(1 + i) = b.sums(i); i += 1 }
    var t = 0
    while (t < b.tri) { out(1 + b.dim + t) = b.gram(t); t += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: GramBuffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): GramBuffer =
    GramBuffer.fromBytes(dim, bytes)

  override def withNewMutableAggBufferOffset(o: Int): GramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "gram_agg"
}

object GramAgg {
  /** Flat [n, sums, upper-tri gram] fold of an array<double> column. */
  def gram(v: Column, dim: Int): Column =
    ColumnBridge.column(
      GramAgg(ColumnBridge.expression(v), dim).toAggregateExpression())
}
