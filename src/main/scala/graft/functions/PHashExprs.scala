package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen dHash expressions — one kernel call per row replacing the
  * stacked split+ascii / hex+conv higher-order projections that
  * dominated the pHash family's signature pass (operators/PHash.scala
  * keeps the legacy column builders as the documented geometry spec and
  * for the SQL oracle generators; these expressions are pinned
  * value-identical to them in PHashSpec/FunctionsSpec laws). The actual
  * math lives in [[PHashKernel]] (shared verbatim by eval and codegen,
  * so the two paths cannot drift). */
case class DHashString(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash_string"

  override protected def nullSafeEval(input: Any): Any =
    PHashKernel.dhashString(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PHashKernel.dhashString($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class DHashBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dhash_bytes"

  override protected def nullSafeEval(input: Any): Any =
    PHashKernel.dhashBytes(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PHashKernel.dhashBytes($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PHashExprs {
  /** 63-bit dHash of a STRING payload (ascii-codepoint semantics — the
    * split('')+ascii contract of PHash.byteValues/pixels/dhash). */
  def dhashString(text: Column): Column =
    ColumnBridge.column(DHashString(ColumnBridge.expression(text)))

  /** 63-bit dHash of a BINARY payload (raw unsigned bytes — the
    * byte-faithful frame-grain contract). */
  def dhashBytes(bin: Column): Column =
    ColumnBridge.column(DHashBytes(ColumnBridge.expression(bin)))
}
