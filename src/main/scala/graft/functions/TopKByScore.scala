package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded buffer of the k best (score, id) entries under the TOTAL order
  * "higher score first, lower id breaks ties" — the deterministic ranking
  * every top-k surface in this engine uses. Insertion keeps a plain
  * sorted array of ≤ k elements (k is small — neighbor lists, not
  * percentiles), so update is O(k) with zero allocation on the hot path
  * and merge is a bounded merge-sort step. The structure is an
  * associative, commutative monoid: merge order cannot change the
  * result, which is what makes the PARTIAL aggregation safe. */
final class TopKBuffer(val k: Int) {
  // parallel arrays, best first; `n` entries valid
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n: Int = 0

  /** true if (s1, i1) ranks strictly better than (s2, i2). */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return
    // find insert position (arrays are tiny: linear scan beats binary
    // search overhead for k ≤ ~16)
    var pos = if (n < k) n else n - 1
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    // shift worse entries down (dropping the overflow)
    val last = math.min(n, k - 1)
    var j = last
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }

  def addAll(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    // entries arrive best-first and pre-deduplicated, add() keeps order
    while (i < n) { b.add(in.readDouble(), in.readLong()); i += 1 }
    b
  }
}

/** Partial-aggregating top-k: `topk_by_score(score, id, k)` returns the k
  * best (score desc, id asc) entries per group as
  * `array<struct<score,id>>`, best first.
  *
  * WHY an aggregate and not a rank window (SURVEY §4.3): a window top-k
  * must shuffle EVERY candidate row to its group's reducer and sort the
  * whole group — for a kNN join that is all N²/groups scored pairs. A
  * TypedImperativeAggregate gets map-side partial aggregation for free:
  * each map task reduces its slice of a group to ≤ k entries BEFORE the
  * exchange, so the shuffle carries ≤ k·maps rows per group instead of
  * the whole group, and the reducer merges bounded buffers instead of
  * sorting (measured on q_knn_join at sf0.1: 25M shuffled rows → ~0.5M,
  * 4.1 → 3.6 s; see SURVEY §6 — requires the objectHashAggregate
  * fallback threshold raised above the per-partition group count). Determinism: the buffer is an associative,
  * commutative monoid over a total order, so partial/merge order cannot
  * affect the result. */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("score", DoubleType).add("id", LongType), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, in: InternalRow): TopKBuffer = {
    val s = score.eval(in)
    val i = id.eval(in)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.addAll(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.scores(i), b.ids(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** `topk_by_score(score, id, k)` as an aggregate Column. */
  def topk(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score),
                  ColumnBridge.expression(id), k).toAggregateExpression())
}
