package graft.functions

import java.math.{BigDecimal => JBigDecimal}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Per-group accumulator for the decimal-exact component-wise mean of an
  * array<double> column: row count + one exact DECIMAL(30,12) sum per
  * component (k-means centroid / PQ codeword update — model-sized
  * however large the corpus: one buffer per GROUP, k or k·m groups). */
final class VecMeanBuffer {
  var n: Long = 0L
  var sums: Array[JBigDecimal] = null // allocated on first row (dim known)

  def add(v: ArrayData): Unit = {
    val d = v.numElements()
    if (sums == null) sums = Array.fill(d)(JBigDecimal.ZERO)
    n += 1
    var i = 0
    while (i < d) {
      // EXACT replica of Catalyst's cast(double AS decimal(30,12)):
      // Decimal(double) goes through BigDecimal.decimal (Double.toString
      // representation), then changePrecision rounds HALF_UP to scale 12.
      // Using Spark's own Decimal keeps the per-value rounding identical
      // to the posexplode + sum(cast(...)) form this aggregate replaces.
      val dec = Decimal(v.getDouble(i))
      if (!dec.changePrecision(30, 12))
        throw new ArithmeticException(
          s"decimal_vec_mean: component overflows DECIMAL(30,12)")
      sums(i) = sums(i).add(dec.toJavaBigDecimal)
      i += 1
    }
  }

  def merge(o: VecMeanBuffer): Unit = {
    if (o.sums != null) {
      if (sums == null) { sums = o.sums; n = o.n; return }
      n += o.n
      var i = 0
      while (i < sums.length) { sums(i) = sums(i).add(o.sums(i)); i += 1 }
    }
  }

  def toBytes: Array[Byte] = {
    val strs =
      if (sums == null) Array.empty[Array[Byte]]
      else sums.map(_.toPlainString.getBytes(StandardCharsets.US_ASCII))
    val bb = ByteBuffer.allocate(8 + 4 + strs.map(_.length + 4).sum)
    bb.putLong(n)
    bb.putInt(strs.length)
    strs.foreach { s => bb.putInt(s.length); bb.put(s) }
    bb.array()
  }
}

object VecMeanBuffer {
  def fromBytes(bytes: Array[Byte]): VecMeanBuffer = {
    val b = new VecMeanBuffer
    val bb = ByteBuffer.wrap(bytes)
    b.n = bb.getLong
    val d = bb.getInt
    if (d > 0) {
      b.sums = Array.tabulate(d) { _ =>
        val len = bb.getInt
        val s = new Array[Byte](len)
        bb.get(s)
        new JBigDecimal(new String(s, StandardCharsets.US_ASCII))
      }
    }
    b
  }
}

/** `decimal_vec_mean(v)` — the Lloyd-round centroid/codeword update as
  * ONE aggregate: component-wise mean of an array<double> column with
  * the sums carried through exact DECIMAL(30,12) (partition-order-
  * independent, bit-identical run to run — the graft.util.Det
  * discipline the posexplode form satisfied).
  *
  * Replaces `posexplode(v) → groupBy(g, pos).agg(sum(cast(x as
  * decimal(30,12))) / count) → groupBy(g).agg(sorted collect_list)`:
  * that form materializes d rows per input row and needs TWO exchanges
  * per Lloyd round; this one streams the input rows through a flat
  * buffer (map-side partials merged as d BigDecimal adds) and needs ONE
  * k-row exchange (guide §2.3 aggregate-before-shuffle / §2.4 one
  * exchange where two ran). Output per group: array<double> of
  * toDouble(sum_i)/n — exactly `cast(sum AS double) / count(1)`
  * component by component, so consumers are bit-identical
  * (DecimalVecMeanSpec pins ≡ the posexplode form).
  *
  * Null components are rejected by construction (vector columns here are
  * containsNull=false); a null ARRAY row is skipped like sum() skips
  * null — the training frames never produce one. */
case class DecimalVecMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer

  override def update(b: VecMeanBuffer, in: InternalRow): VecMeanBuffer = {
    val v = child.eval(in)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VecMeanBuffer, o: VecMeanBuffer): VecMeanBuffer = {
    b.merge(o); b
  }

  override def eval(b: VecMeanBuffer): Any = {
    if (b.sums == null) null
    else {
      val out = new Array[Any](b.sums.length)
      val n = b.n.toDouble
      var i = 0
      while (i < b.sums.length) {
        // same arithmetic as Divide(cast(sum as double), count):
        // decimal → double first, THEN the IEEE division
        out(i) = b.sums(i).doubleValue() / n
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def serialize(b: VecMeanBuffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): VecMeanBuffer =
    VecMeanBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): DecimalVecMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DecimalVecMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "decimal_vec_mean"
}

object DecimalVecMean {
  /** Decimal-exact component-wise mean of an array<double> column. */
  def mean(v: Column): Column =
    ColumnBridge.column(
      DecimalVecMean(ColumnBridge.expression(v)).toAggregateExpression())
}
