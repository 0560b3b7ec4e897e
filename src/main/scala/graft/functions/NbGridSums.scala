package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `nb_grid_sums(toks)` — the Naive-Bayes / unigram-LM scoring pass as
  * ONE pure-map expression: the model-sized llk grid (term →
  * per-class INT64 micro-nat log-likelihood) bakes into the expression
  * (the NearestCellScore / DecontamIndex foldable-literal discipline),
  * and each document's token array folds to `array<long>` of per-class
  * sums in a single primitive loop with a hash lookup per token.
  *
  * Replaces the explode → broadcast-grid join → anchor union →
  * groupBy(doc_id) scoring plan (NbClassifier.score /
  * q_select_perplexity): that form pushed tokens-per-corpus rows
  * through join + aggregate machinery and paid a doc-keyed exchange;
  * this is zero-exchange and row volume stays at doc grain (guide
  * §1.2 step 1 + §2.3/2.4). Values are bit-identical: the sums are
  * INT64 adds (associative, order-free), an out-of-vocabulary token
  * contributes nothing (the inner join dropped it), and a doc with no
  * in-vocab tokens sums to zeros — exactly what the anchor row's NULL
  * sums became after the old plan's coalesce(s, 0).
  *
  * A NULL token array (or NULL input row) also yields the zero vector:
  * the old plan's anchor row guaranteed every input doc a (null-summed
  * → 0) result, so this expression never returns NULL either. */
case class NbGridSums(child: Expression, terms: Array[String],
                      llks: Array[Long], nClasses: Int)
  extends UnaryExpression with CodegenFallback {

  require(nClasses > 0, "nb_grid_sums: need at least one class")
  require(llks.length == terms.length * nClasses,
    s"nb_grid_sums: grid shape mismatch (${terms.length} terms × " +
      s"$nClasses classes ≠ ${llks.length} llks)")

  @transient private lazy val idx = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) { m.put(UTF8String.fromString(terms(i)), i); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "nb_grid_sums"

  override def eval(input: InternalRow): Any = {
    val sums = new Array[Long](nClasses)
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val j = idx.get(arr.getUTF8String(i))
          if (j != null) {
            val off = j.intValue() * nClasses
            var c = 0
            while (c < nClasses) { sums(c) += llks(off + c); c += 1 }
          }
        }
        i += 1
      }
    }
    new GenericArrayData(sums)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NbGridSums {
  /** Per-class INT64 llk sums of a token-array column against a
    * model-sized grid. `gridRows` = (term, llk_c1, …, llk_cK) via
    * util.Local.modelRows, class columns in the caller's class order. */
  def sums(toks: Column, gridRows: Array[org.apache.spark.sql.Row],
           nClasses: Int): Column = {
    val terms = gridRows.map(_.getString(0))
    val llks = new Array[Long](terms.length * nClasses)
    var i = 0
    while (i < gridRows.length) {
      var c = 0
      while (c < nClasses) {
        llks(i * nClasses + c) = gridRows(i).getLong(1 + c)
        c += 1
      }
      i += 1
    }
    ColumnBridge.column(
      NbGridSums(ColumnBridge.expression(toks), terms, llks, nClasses))
  }
}
