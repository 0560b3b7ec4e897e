package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Catalyst `round(x, scale)` on DoubleType with the BigDecimal removed
  * from the hot path. Spark's RoundBase allocates a BigDecimal (via
  * Double.toString parsing) PER ROW — ~300 ns that dominated both exact
  * vector joins (see BlockVec.round4) and the SDC pair scorer at N²/cells
  * row counts. The fast path floor(x·10ˢ + 0.5)/10ˢ is bit-identical to
  * the BigDecimal form except inside an ε-band of an exact .5 decimal
  * boundary (where the shortest-decimal string view of x can round the
  * other way, and where HALF_UP's away-from-zero rule differs for
  * negatives); the band is ≥ 4× wider than the worst binary-vs-decimal
  * discrepancy at double precision and takes the exact slow path —
  * statistically never for measured data, always correct when hit. */
case class FastRound(child: Expression, scale: Int)
  extends UnaryExpression {

  require(scale >= 0 && scale <= 9, s"unsupported scale $scale")

  private val pow10: Double = math.pow(10.0, scale)

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"graft_round$scale"

  /** Exact Catalyst semantics — the slow path and the reference. */
  def exactRound(x: Double): Double =
    scala.math.BigDecimal(x)
      .setScale(scale, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The guard band must scale with |y|: the shortest-decimal-vs-binary
    * discrepancy the slow path exists to absorb grows as ~|y|·2⁻⁵³ (≤ ~2
    * ulp of y across all sources: shortest-decimal round-trip, the x·10ˢ
    * multiply, the +0.5 add). A fixed absolute band (1e-9 originally)
    * silently under-covers once |y| ≳ 4.5e6 — e.g. scale 9 on any
    * unit-scale value. 16 ulps = 8× the worst case, floored at ulp(1.0)
    * so subnormal-small y keeps a sane absolute band. */
  @inline private def band(y: Double): Double =
    16.0 * math.ulp(math.max(math.abs(y), 1.0))

  /** The boundary test must measure distance to the NEAREST integer of
    * y+0.5, not to floor(y+0.5): when binary y lands just BELOW a .5
    * boundary (the true decimal value rounds up, floor rounds down) the
    * floor-based diff reads ≈ 1, not ≈ 0, and the guard silently missed
    * exactly the divergent case (caught by FastRoundSpec's adversarial
    * sweep — e.g. 5684423.26175 at scale 4 sits 1 ulp under the
    * boundary). */
  def fastRound(x: Double): Double = {
    val y = x * pow10
    val z = y + 0.5
    val f = math.floor(z)
    if (math.abs(z - math.rint(z)) < band(y)) exactRound(x) else f / pow10
  }

  override protected def nullSafeEval(input: Any): Any =
    fastRound(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val self = ctx.addReferenceObj("fastRound", this,
        classOf[FastRound].getName)
      val y = ctx.freshName("y")
      val f = ctx.freshName("f")
      val z = ctx.freshName("z")
      val b = ctx.freshName("band")
      s"""
        final double $y = $x * $pow10;
        final double $z = $y + 0.5;
        final double $f = java.lang.Math.floor($z);
        final double $b = 16.0 * java.lang.Math.ulp(
          java.lang.Math.max(java.lang.Math.abs($y), 1.0));
        ${ev.value} = (java.lang.Math.abs($z - java.lang.Math.rint($z)) < $b)
          ? $self.exactRound($x) : $f / $pow10;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FastRound {
  /** round(x, scale) with Catalyst HALF_UP semantics, codegen'd without
    * per-row BigDecimal. */
  def round(x: Column, scale: Int): Column =
    ColumnBridge.column(FastRound(ColumnBridge.expression(x), scale))
}
