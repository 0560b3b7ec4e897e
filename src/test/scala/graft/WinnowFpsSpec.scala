package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.WinnowFps

/** Laws of the winnow_fps monotonic-deque expression — the map-side
  * replacement for the gram-explode + per-doc window-min plan that was
  * the round-16 100× `weak` (52.7 s of string-key sorting). The
  * contract is bit-equality with the declarative definition the DuckDB
  * oracle still runs, so the reference plan lives HERE, verbatim, and
  * every law compares against it. */
class WinnowFpsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r17 declarative plan (and the oracle's definition):
    * stride-1 k-grams, lexicographic min over each window of w
    * consecutive grams, full windows only, distinct per doc. */
  private def declarative(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val grams = docs
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        (length(col("text")) - (k - 1)).as("n_g"),
        explode(sequence(lit(1), length(col("text")) - (k - 1), lit(1)))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("n_g"), col("pos"),
        col("text").substr(col("pos"), lit(k)).as("g"))
    val win = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("wm", min(col("g")).over(win))
      .filter(col("pos") <= col("n_g") - (w - 1))
      .select(col("doc_id"), col("wm")).distinct()
  }

  private def viaExpr(docs: DataFrame, k: Int, w: Int): DataFrame =
    docs.select(col("doc_id"),
      explode(WinnowFps.fps(col("text"), k, w)).as("wm"))

  private def sortedRows(df: DataFrame): Seq[(Long, String)] =
    df.select(col("doc_id").cast("long"), col("wm")).as[(Long, String)]
      .collect().toSeq.sorted

  test("expression ≡ declarative window plan on fixture documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for ((k, w) <- Seq((20, 21), (5, 4), (3, 8)))
      assert(sortedRows(viaExpr(docs, k, w)) ==
        sortedRows(declarative(docs, k, w)),
        s"winnow_fps($k, $w) diverged from the declarative definition")
  }

  test("expression ≡ declarative on crafted edges: ties, repeats, " +
      "multi-byte code points, exact-threshold lengths") {
    val k = 3; val w = 4
    val docs = Seq(
      (1L, "aaaaaaaaaaaa"),            // all grams equal (tie storm)
      (2L, "abcabcabcabcabc"),         // period < window
      (3L, "a" * (k + w - 1)),         // exactly one full window
      (4L, "a" * (k + w - 2)),         // one short of a full window
      (5L, "zyxwvutsrqponm"),          // strictly decreasing grams
      (6L, "abcdefghijklmn"),          // strictly increasing grams
      (7L, "naïve café — déjà vu ✓"),  // multi-byte: substr is code-point
      (8L, ""),                        // empty
      (9L, "ab"))                      // shorter than k
      .toDF("doc_id", "text")
    assert(sortedRows(viaExpr(docs, k, w)) ==
      sortedRows(declarative(docs, k, w)))
    // too-short docs contribute nothing, not empty-string fingerprints
    assert(viaExpr(docs.filter(col("doc_id") >= 4 && col("doc_id") <= 4),
      k, w).count() == 0)
  }

  test("per-doc fingerprints arrive distinct (no downstream dedup)") {
    val docs = Seq((1L, "abababababababababab")).toDF("doc_id", "text")
    val out = viaExpr(docs, 3, 4).collect()
    assert(out.length == out.distinct.length)
  }

  test("winnowing guarantee: a shared substring of length ≥ k+w-1 " +
      "yields a shared fingerprint at ANY offset alignment") {
    val k = 5; val w = 6
    val shared = "THESHAREDRUNOFCHARS" // length 19 ≥ k+w-1 = 10
    val docs = (0 until 7).map(off =>
        (off.toLong, ("x" * off) + shared + ("q" * (7 - off))))
      .toDF("doc_id", "text")
    val fp = viaExpr(docs, k, w)
    val byDoc = fp.groupBy("wm").agg(countDistinct("doc_id").as("n"))
      .filter(col("n") === 7).count()
    assert(byDoc >= 1,
      "every offset-shifted copy must share at least one fingerprint")
  }
}
