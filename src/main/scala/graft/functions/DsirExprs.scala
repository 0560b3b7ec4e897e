package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** The DSIR hashed-bigram bucketizer as a single fused pass (SURVEY §4.3
  * justification): the declarative form —
  * `transform(split(text," "), t => aggregate(split(t,""), 0L, fold))`
  * then a `zip_with(slice, slice, ...)` for the bigram buckets — is
  * semantically right but interpreters ALL of it per row: a regex split
  * allocating one UTF8String per CHARACTER, two lambda frames per fold
  * step, three intermediate arrays per document. Measured 3.24 s at
  * sf0.1 — ~6× the family median — with >90% of it in the char fold
  * (round-9 verdict, `weak`). This expression walks the document text
  * once, code point by code point, and emits the bucket array directly:
  * no regex, no per-char allocation, no lambda frames, whole-stage
  * codegen via a static helper call (the RegExpExtract pattern).
  *
  * Semantics are pinned to the DuckDB oracle (bit-identical, and
  * hash-green since round 8): tokens split on every single space
  * (empties kept — "a  b" and trailing spaces hash like the regex
  * split); token code = left-to-right fold (acc·31 + codepoint) mod
  * 1e9+7 with 0 for the empty token; bucket_i = ((code_i·31 +
  * code_{i+1}) mod 1e9+7) mod b.
  */
object DsirHash {
  final val P = 1000000007L

  /** Per-document bigram bucket array — one pass over the text. */
  def buckets(text: UTF8String, b: Int): ArrayData = {
    val s = text.toString
    // token codes, single scan (split-on-space fused into the fold)
    var codes = new Array[Long](8)
    var nCodes = 0
    def push(v: Long): Unit = {
      if (nCodes == codes.length) codes = java.util.Arrays.copyOf(codes, nCodes * 2)
      codes(nCodes) = v; nCodes += 1
    }
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == ' ') { push(acc); acc = 0L }
      else acc = (acc * 31L + cp) % P
      i += Character.charCount(cp)
    }
    push(acc) // final token (the empty token after a trailing space included)
    val out = new Array[Int](math.max(0, nCodes - 1))
    var j = 0
    while (j < out.length) {
      out(j) = (((codes(j) * 31L + codes(j + 1)) % P) % b).toInt
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `dsir_buckets(text, b)` as a Catalyst expression (array<int>). */
case class DsirBucketCodes(child: Expression, b: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_dsir_buckets"

  override protected def nullSafeEval(t: Any): Any =
    DsirHash.buckets(t.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DsirHash.buckets($c, $b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Σ_i table[idx_i] over an array<int> of in-range indices — the scoring
  * half of DSIR. Replaces `aggregate(bkts, 0.0, (acc,bk) => acc +
  * element_at(typedLit(lut), bk+1))`, which both interprets the fold per
  * element AND ships the 4096-double literal boxed (the exact failure
  * mode SdcLookupSum fixed for the SDC table). One primitive double[]
  * reference, tight fused loop, left-to-right order preserved so the
  * float sum is bit-identical to the HOF fold and the DuckDB
  * list_reduce. */
case class IndexLookupSum(child: Expression, table: Array[Double])
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_lookup_sum"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += table(x.getInt(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val tab = ctx.addReferenceObj("lookupTable", table, "double[]")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        final int $n = $x.numElements();
        double $s = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $s += $tab[$x.getInt($i)];
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DsirExprs {
  /** Per-doc DSIR bigram bucket array (array<int>), fused single pass. */
  def buckets(text: Column, b: Int): Column =
    ColumnBridge.column(DsirBucketCodes(ColumnBridge.expression(text), b))

  /** Left-to-right Σ table[idx] over an array<int> column. */
  def lookupSum(indices: Column, table: Array[Double]): Column =
    ColumnBridge.column(IndexLookupSum(ColumnBridge.expression(indices), table))
}
