package graft

import org.apache.spark.sql.functions._

/** DSIR selection contract: the declared key must reproduce the published
  * estimator (hashed-bigram importance log-ratios, add-one smoothing,
  * occurrence-order summation) BIT-EXACTLY, pull toward the target
  * domain, and keep the scoring stage map-only. */
class DsirSpec extends SparkSpec {

  private val B = 4096

  /** Replay tokenization: Spark's split(text, ' ') keeps every empty
    * field (Java split with limit -1); bigrams pair adjacent tokens. */
  private def bigrams(text: String): Seq[(String, String)] = {
    val t = text.split(" ", -1).toSeq
    if (t.length < 2) Seq.empty
    else t.sliding(2).map(p => (p(0), p(1))).toSeq
  }

  /** Independent replay of the portable bucket hash: char fold
    * (acc·31 + codepoint) mod 1e9+7 per token, (c1·31 + c2) mod 1e9+7
    * mod B per bigram — pure Scala, no Spark expression shared. */
  private def code(t: String): Long =
    t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
  private def bucket(t1: String, t2: String): Int =
    (((code(t1) * 31 + code(t2)) % 1000000007L) % B).toInt

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_select_dsir: bit-exact brute-force replay of the estimator") {
    val got = SparkEntry.queries("q_select_dsir")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val nT = new Array[Long](B); val nR = new Array[Long](B)
    docs.foreach { case (_, lang, text) =>
      bigrams(text).foreach { case (t1, t2) =>
        val b = bucket(t1, t2)
        nR(b) += 1
        if (lang == "en") nT(b) += 1
      }
    }
    val tTot = nT.sum.toDouble + B
    val rTot = nR.sum.toDouble + B
    val lut = Array.tabulate(B) { i =>
      math.log((nT(i) + 1).toDouble / tTot) -
        math.log((nR(i) + 1).toDouble / rTot)
    }
    val want = docs.map { case (id, lang, text) =>
      val s = round6(bigrams(text).foldLeft(0.0d) { case (acc, (t1, t2)) =>
        acc + lut(bucket(t1, t2)) })
      (id, lang, s, if (s > 0.0d) 1L else 0L)
    }
    assert(got.toSeq == want.toSeq, "DSIR frame diverges from the replay")
  }

  test("q_select_dsir pulls toward the target domain") {
    val rows = SparkEntry.queries("q_select_dsir")(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getDouble(2)))
    val en = rows.filter(_._1 == "en").map(_._2)
    val rest = rows.filter(_._1 != "en").map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.size > rest.sum / rest.size,
      "target-language docs do not score higher on average")
  }

  test("q_select_dsir scoring is map-only (model is a literal, not a join)") {
    val p = SparkEntry.queries("q_select_dsir")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"scoring joins the model:\n${p.take(1500)}")
    assert(!p.contains("HashAggregate"),
      s"scoring shuffles an aggregate:\n${p.take(1500)}")
  }
}
