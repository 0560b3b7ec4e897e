package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items buffer with `m` counters.
  *
  * Invariant (the heavy-hitter guarantee): after summarizing any stream
  * of n items, `est(x) ∈ [count(x) − n/(m+1), count(x)]` — so every item
  * with true count > n/(m+1) is PRESENT in the buffer. Merging two
  * buffers (sum counts for the key union, then subtract the (m+1)-th
  * largest combined count and drop ≤ 0) preserves the bound over
  * n₁ + n₂ [Agarwal et al., "Mergeable Summaries", PODS'12 — public
  * result], which is exactly what makes the sketch safe as a PARTIAL
  * aggregate: map-side buffers summarize each partition, the reducer
  * merges m-sized summaries, and no single node ever holds the full
  * term dictionary — the 100-TB vocabulary property.
  */
final class MGBuffer(val m: Int) {
  val counts = new mutable.HashMap[String, Long]()
  /** total items summarized (for the error bound; carried through merge) */
  var n: Long = 0L

  def add(term: String, w: Long = 1L): Unit = {
    n += w
    counts.get(term) match {
      case Some(c) => counts.update(term, c + w)
      case None if counts.size < m => counts.update(term, w)
      case None =>
        // decrement-all by the insert weight, capped at the current min
        // (classic MG step, batched for w > 1)
        val dec = math.min(w, counts.valuesIterator.min)
        val dead = counts.iterator.filter(_._2 <= dec).map(_._1).toList
        counts.mapValuesInPlace((_, c) => c - dec)
        dead.foreach(counts.remove)
        val rem = w - dec
        if (rem > 0 && counts.size < m) counts.update(term, rem)
    }
  }

  def merge(o: MGBuffer): Unit = {
    n += o.n
    o.counts.foreach { case (t, c) =>
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    if (counts.size > m) {
      // subtract the (m+1)-th largest count, drop non-positive
      val sorted = counts.valuesIterator.toArray.sorted(Ordering[Long].reverse)
      val dec = sorted(m)
      val dead = counts.iterator.filter(_._2 <= dec).map(_._1).toList
      counts.mapValuesInPlace((_, c) => c - dec)
      dead.foreach(counts.remove)
    }
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(n)
    out.writeInt(counts.size)
    counts.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }
}

object MGBuffer {
  def fromBytes(m: Int, bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MGBuffer(m)
    b.n = in.readLong()
    val sz = in.readInt()
    var i = 0
    while (i < sz) {
      val len = in.readInt(); val tb = new Array[Byte](len)
      in.readFully(tb)
      b.counts.update(new String(tb, "UTF-8"), in.readLong())
      i += 1
    }
    b
  }
}

/** `graft_freq(term, m)`: Misra–Gries heavy-hitter sketch as a partial-
  * aggregating Catalyst aggregate — returns `array<struct<term, est>>`
  * sorted (est desc, term asc). The ESTIMATES are sketch values
  * (deterministic bounds, not deterministic digits — like HLL); exact
  * pipelines use the sketch as a CANDIDATE GENERATOR and re-count the
  * ≤ m survivors exactly (see q_text_heavyhitters), which restores full
  * determinism at a bounded second-pass cost. */
case class FreqSketch(
    term: Expression, m: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def children: Seq[Expression] = Seq(term)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("term", StringType).add("est", LongType), containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(b: MGBuffer, in: InternalRow): MGBuffer = {
    val t = term.eval(in)
    if (t != null) b.add(t.toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = { b.merge(o); b }

  override def eval(b: MGBuffer): Any = {
    val rows = b.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(b: MGBuffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): MGBuffer =
    MGBuffer.fromBytes(m, bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(term = c(0))
  override def prettyName: String = "graft_freq"
}

object FreqSketch {
  /** `graft_freq(term, m)` as an aggregate Column. */
  def freq(term: Column, m: Int): Column =
    ColumnBridge.column(
      FreqSketch(ColumnBridge.expression(term), m).toAggregateExpression())
}
