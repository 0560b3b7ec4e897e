package graft

import scala.collection.mutable
import graft.sources.Tables

/** q_tok_bpe_train vs an independent local reference: BPE merge
  * training is deterministic given the (count desc, pair lex asc)
  * argmax total order and greedy left-to-right re-encoding, so the
  * distributed word-frequency implementation must reproduce a
  * straightforward single-threaded reference bit-for-bit. */
class TokBpeSpec extends SparkSpec {

  /** Greedy left-to-right merge of adjacent (l, r) — the exact fold
    * semantics of BpeTrain's `aggregate` expression. */
  private def fold(syms: Vector[String], l: String, r: String)
      : Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  /** Single-threaded reference BPE on raw document strings. */
  private def reference(texts: Seq[String], nMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    val wordCounts = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ") if w.nonEmpty) wordCounts(w) += 1L
    var vocab: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) =>
        (w.map(_.toString).toVector, c)
      }
    val out = mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < nMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, c) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head
        out += ((step.toLong, l, r, l + r, n))
        vocab = vocab.map { case (syms, c) => (fold(syms, l, r), c) }
        step += 1
      }
    }
    out.toSeq
  }

  test("q_tok_bpe_train == local reference at two tiers") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val texts = Tables.documents(spark, sf)
        .select("text").collect().map(_.getString(0)).toSeq
      val expect = reference(texts, nMerges = 10)
      val got = SparkEntry.queries("q_tok_bpe_train")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(got === expect, s"merge-table mismatch at $sf")
    }
  }

  test("q_text_bpe_apply == local reference encode at two tiers") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val texts = Tables.documents(spark, sf)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val merges = reference(texts.map(_._2), nMerges = 10)
        .map(m => (m._2, m._3))
      def encodeLen(w: String): Int =
        merges.foldLeft(w.map(_.toString).toVector) {
          case (syms, (l, r)) => fold(syms, l, r)
        }.length
      val expect = texts.map { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        (id, ws.length.toLong, ws.map(_.length).sum.toLong,
          ws.map(encodeLen).sum.toLong)
      }.sortBy(_._1)
      val got = SparkEntry.queries("q_text_bpe_apply")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expect, s"encode mismatch at $sf")
    }
  }

  test("batched merge selection ≡ sequential reference at depth 80") {
    // the batching guard (BpeTrain.safeBatch) must be invisible: a DEEP
    // merge run exercises many batch rounds, conflict stops, and the
    // cStop count guard — the merge table must still equal the strictly
    // sequential reference bit-for-bit
    val texts = Tables.documents(spark, sf0001)
      .select("text").collect().map(_.getString(0)).toSeq
    val expect = reference(texts, nMerges = 80)
    val got = graft.operators.BpeTrain
      .merges(Tables.documents(spark, sf0001).select("text"), nMerges = 80)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expect, "batched training diverged from sequential BPE")
    assert(got.length === 80)
  }

  test("safeBatch: stops at conflicts, guards on the stop count") {
    import graft.operators.BpeTrain.safeBatch
    // symbol-disjoint prefix accepted in order
    assert(safeBatch(Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 16)
      === Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)))
    // conflict on a SOURCE symbol stops the scan (never skips past it)
    assert(safeBatch(Seq(("a", "b", 10L), ("b", "c", 9L), ("d", "e", 8L)), 16)
      === Seq(("a", "b", 10L)))
    // conflict on the MERGED string stops too ("ab" is a new symbol)
    assert(safeBatch(Seq(("a", "b", 10L), ("ab", "c", 9L)), 16)
      === Seq(("a", "b", 10L)))
    // count guard: a later accepted merge whose count does not strictly
    // exceed the stop count is dropped (a new pair could tie it) — but
    // the head is always safe (it is the literal argmax)
    assert(safeBatch(Seq(("a", "b", 10L), ("c", "d", 6L), ("b", "x", 6L)), 16)
      === Seq(("a", "b", 10L)))
    assert(safeBatch(Seq(("a", "b", 6L), ("a", "c", 6L)), 16)
      === Seq(("a", "b", 6L)))
    // maxTake caps the batch
    assert(safeBatch(Seq(("a", "b", 10L), ("c", "d", 8L), ("e", "f", 6L)), 2)
      === Seq(("a", "b", 10L), ("c", "d", 8L)))
  }

  test("merges re-encode: overlapping occurrences merge left-to-right") {
    // "aaa" under (a,a): greedy yields ["aa","a"], never ["a","aa"] or
    // a double merge — the property the CaseWhen fold must preserve
    assert(fold(Vector("a", "a", "a"), "a", "a") === Vector("aa", "a"))
    assert(fold(Vector("a", "a", "a", "a"), "a", "a")
      === Vector("aa", "aa"))
  }
}
