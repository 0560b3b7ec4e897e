package graft

import org.apache.spark.sql.functions._
import graft.operators.NbClassifier
import graft.sources.Tables

/** The classifier-at-rest contract beyond the oracle equality: scoring
  * a NEW batch (the deployment path the stored model exists for) must
  * emit one prediction per INPUT document — out-of-vocabulary documents
  * fall back to the prior argmax instead of silently vanishing through
  * the token join. */
class NbClassifierSpec extends SparkSpec {

  test("scoreStored keeps OOV-only docs with the prior-argmax prediction") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_nb_oov").toString
    NbClassifier.store(docs, root)
    // a batch with one in-vocab doc and one doc of pure OOV tokens
    val real = docs.limit(1).collect().head
    val batch = Seq(
      (real.getLong(0), real.getString(1), real.getString(2)),
      (999999L, "en", "zzzz qqqq xxxx"))
      .toDF("doc_id", "lang", "text")
    val out = NbClassifier.scoreStored(spark, root, batch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 2, "an input doc vanished from the predictions")
    // expected OOV prediction: argmax of the QUANTIZED log-priors with
    // the lexicographic tie-break — recomputed independently here
    val counts = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val priorQ = counts.map { case (c, k) =>
      c -> math.round(math.log(k.toDouble / n) * 1e6)
    }
    val want = priorQ.toSeq.sortBy { case (c, p) => (-p, c) }.head._1
    assert(out(999999L) === want,
      s"OOV doc predicted ${out(999999L)}, expected prior argmax $want")
  }

  test("in-corpus scoring is unchanged by the left-join fallback") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text")
    val classes = NbClassifier.classesOf(docs)
    val (grid, priors) = NbClassifier.train(docs, classes)
    val scored = NbClassifier.score(docs, grid, priors, classes)
    assert(scored.count() === docs.count())
  }
}
