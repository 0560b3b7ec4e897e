package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two ArrayType(Double) columns — a
  * genuinely justified custom Catalyst Expression (SURVEY §4.3): the HOF
  * formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`
  * allocates an intermediate 64-element array and two lambda frames PER
  * PAIR, which at q_sim_join's 2M pairs dominated the bench (52 s).
  * This expression emits a tight fused loop over the unsafe array data —
  * no allocation, whole-stage-codegen friendly — and keeps the exact
  * left-to-right summation order of the HOF fold (bit-identical results).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // inputs are always array<double> at our two call sites; ExpectsInputTypes
  // is private[sql] so type enforcement stays at the caller
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $x.getDouble($i) * $y.getDouble($i);
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SDC pair score: Σ_sub table[sub·k² + (ca−1)·k + (cb−1)] over two
  * packed PQ code arrays (array<int>, 1-based codes) — the m-lookup
  * symmetric-distance sum SdcKnnJoin scores every candidate pair with.
  *
  * Why a custom expression and not 16 unrolled `element_at`s into a
  * `typedLit` array (the previous form): each element_at occurrence
  * carries its OWN copy of the 16384-double literal as BOXED
  * GenericArrayData through plan serialization — measured 13.7 MiB task
  * binaries, deserialized per task per stage, which made the 174k-pair
  * scoring stage cost 6.5 s warm / 35 s cold at sf0.1 while the actual
  * arithmetic is ~3M adds. Here the table is ONE primitive double[]
  * shipped once via the codegen reference array (~128 KB), and the sum
  * is a tight fused loop — the DotProduct discipline applied to the
  * lookup-table shape. */
case class SdcLookupSum(left: Expression, right: Expression,
                        table: Array[Double], kCodes: Int)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sdc_sum"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val m = math.min(x.numElements(), y.numElements())
    val kk = kCodes * kCodes
    var s = 0.0
    var i = 0
    while (i < m) {
      s += table(i * kk + (x.getInt(i) - 1) * kCodes + (y.getInt(i) - 1))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val tab = ctx.addReferenceObj("sdcTable", table, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $tab[$i * ${kCodes * kCodes} +
            ($x.getInt($i) - 1) * $kCodes + ($y.getInt($i) - 1)];
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** dot(a, b) as a Column (inputs: array<double>). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the same fused loop. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** SDC m-lookup pair score over packed 1-based PQ code arrays. */
  def sdcSum(codesA: Column, codesB: Column, table: Array[Double],
             kCodes: Int): Column =
    ColumnBridge.column(SdcLookupSum(
      ColumnBridge.expression(codesA), ColumnBridge.expression(codesB),
      table, kCodes))
}
