package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w)` — the DISTINCT winnowing fingerprints of a
  * document in ONE pass over its bytes: the lexicographic minimum
  * k-char gram of every window of `w` consecutive stride-1 grams (full
  * windows only), deduplicated. Pure function of the text ⇒ a map-side
  * projection.
  *
  * Why an expression and not the declarative form: the explode + per-doc
  * window-min plan materializes every gram as a k-char STRING row —
  * 140M rows at the 100× tier — and pays one doc_id exchange plus a
  * per-doc SORT of those 20-byte keys just to share scans across
  * overlapping windows (52.7 s measured, the round-16 `weak`; a
  * transform/slice/array_min HOF form allocated a w-array per window
  * and measured ≥ 5× worse — PLANS_r16). The classic sliding-window-
  * minimum monotonic deque computes the same minima in O(n) pushes/pops
  * (each gram enters and leaves the deque once; comparisons are O(k)
  * bytes) with ZERO shuffle and zero gram-row materialization — the
  * corpus-sized exchange this key has left is the fingerprint-frequency
  * groupBy itself, which is the answer's own grain.
  *
  * Exactness contract (the SQL oracle survives unchanged): grams are
  * CODE-POINT k-substrings (Spark `substr` semantics — byte offsets
  * resolved per code point, so multi-byte text grams agree with the
  * declarative form) and "minimum" is unsigned byte-wise UTF-8 order —
  * exactly UTF8String.compareTo, which is code-point order, which is
  * DuckDB's default VARCHAR collation. Too-short texts (fewer than w
  * grams) return an empty array — they contribute no fingerprint rows,
  * same as the declarative form's length filter. Output order is
  * first-window-appearance (deterministic in the text); every consumer
  * aggregates, so only the SET is contractual. */
case class WinnowFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  require(k >= 1 && w >= 1, s"winnow_fps needs k,w >= 1, got ($k, $w)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"graft_winnow_fps_${k}_$w"

  /** The whole algorithm, row-local. Kept a public method so codegen is
    * one virtual call on a referenced object (the FastRound pattern) —
    * the expression stays inside whole-stage codegen with no
    * interpreted fallback. */
  def winnow(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    // byte offset of every code point (UTF-8: count non-continuation
    // bytes), one extra slot so gram j spans [off(j), off(j+k))
    var nCp = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) nCp += 1
      i += 1
    }
    val nG = nCp - (k - 1) // stride-1 k-grams
    if (nG < w) return WinnowFps.Empty
    val off = new Array[Int](nCp + 1)
    var cp = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { off(cp) = i; cp += 1 }
      i += 1
    }
    off(nCp) = bytes.length

    // unsigned byte-wise gram compare: gram(a) vs gram(b)
    def cmp(a: Int, b: Int): Int = {
      var ia = off(a); var ib = off(b)
      val ea = off(a + k); val eb = off(b + k)
      while (ia < ea && ib < eb) {
        val d = (bytes(ia) & 0xff) - (bytes(ib) & 0xff)
        if (d != 0) return d
        ia += 1; ib += 1
      }
      (ea - off(a)) - (eb - off(b))
    }

    // monotonic deque of gram indices, values strictly increasing from
    // the front; the front is the current window's minimum
    val deque = new Array[Int](nG)
    var head = 0; var tail = 0 // [head, tail)
    val out = new java.util.LinkedHashSet[UTF8String]()
    var g = 0
    while (g < nG) {
      while (tail > head && cmp(deque(tail - 1), g) >= 0) tail -= 1
      deque(tail) = g; tail += 1
      if (deque(head) <= g - w) head += 1
      if (g >= w - 1) {
        val m = deque(head)
        out.add(UTF8String.fromBytes(bytes, off(m), off(m + k) - off(m)))
      }
      g += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val self = ctx.addReferenceObj("winnowFps", this,
        classOf[WinnowFps].getName)
      s"${ev.value} = $self.winnow($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFps {
  private val Empty = new GenericArrayData(new Array[Any](0))

  /** Distinct winnowing fingerprints of `text` (k-char grams, window of
    * w grams) as array<string>. */
  def fps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(text), k, w))
}
