package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** The one custom Catalyst expression gets its own guard: the codegen
  * (doGenCode) and interpreted (nullSafeEval) paths must agree exactly,
  * nulls must propagate, and length mismatches must not crash. */
class VectorExprsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.5, -0.25, 8.0), Seq(-1.0, 0.0, 0.125)),
    (3L, Seq.empty[Double], Seq.empty[Double]),
    (4L, Seq(2.0), Seq(3.0, 99.0))) // length mismatch → min-length dot
    .toDF("id", "a", "b")

  private def dots(codegen: Boolean): Map[Long, Double] = {
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, codegen.toString)
    // CODEGEN_FACTORY_MODE picks the expression evaluator; NO_CODEGEN
    // forces the interpreted nullSafeEval path
    val factoryKey = "spark.sql.codegen.factoryMode"
    val prevFactory = spark.conf.get(factoryKey, "FALLBACK")
    spark.conf.set(factoryKey, if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
    try vecs.select(col("id"), VectorExprs.dot(col("a"), col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    finally { spark.conf.set(key, prev); spark.conf.set(factoryKey, prevFactory) }
  }

  test("codegen and interpreted paths agree bit-for-bit") {
    val gen = dots(codegen = true)
    val interp = dots(codegen = false)
    assert(gen === interp)
    assert(gen(1L) === (4.0 + 10.0 + 18.0))
    assert(gen(2L) === (-0.5 + 0.0 + 1.0))
    assert(gen(3L) === 0.0)      // empty vectors → 0
    assert(gen(4L) === 6.0)      // min-length semantics
  }

  test("null inputs propagate to null") {
    val withNull = Seq((1L, Some(Seq(1.0)), None: Option[Seq[Double]]))
      .toDF("id", "a", "b")
    val out = withNull.select(VectorExprs.dot(col("a"), col("b"))).collect()
    assert(out.head.isNullAt(0))
  }

  test("norm is sqrt of self-dot") {
    val out = vecs.filter(col("id") === 1)
      .select(VectorExprs.norm(col("a"))).collect().head.getDouble(0)
    assert(out === math.sqrt(1.0 + 4.0 + 9.0))
  }

  test("graft_dot is SQL-callable via GraftExtensions") {
    // the session is built with spark.sql.extensions=graft.GraftExtensions,
    // so pure-SQL users reach the same codegen expression
    val d = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(d === 32.0)
    // …and agrees with the Column API on real data
    vecs.createOrReplaceTempView("t_vecs")
    val sqlSide = spark.sql("SELECT id, graft_dot(a, b) AS d FROM t_vecs")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val colSide = vecs.select(col("id"), VectorExprs.dot(col("a"), col("b")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sqlSide === colSide)
  }

  test("graft_topk is SQL-callable and matches a rank-window top-k") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 7L), (1L, 0.5, 3L), (1L, 0.95, 4L),
      (2L, 0.1, 1L), (2L, 0.2, 2L),
      (3L, 0.3, 9L))
      .toDF("grp", "score", "id")
    rows.createOrReplaceTempView("t_topk")
    val got = spark.sql(
      """SELECT grp, t.id, t.score
         FROM (SELECT grp, graft_topk(score, id, 2) AS top
               FROM t_topk GROUP BY grp)
         LATERAL VIEW explode(top) AS t
         ORDER BY grp, t.score DESC, t.id""")
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id").asc)
    val want = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("grp", "id", "score")
      .orderBy(col("grp"), col("score").desc, col("id"))
      .collect().map(_.toString).toSeq
    assert(got === want)
  }

  // --- IvfProbe edge semantics (round-13 ADVICE): the pure-map cell
  // expressions must either mirror the replaced window forms exactly or
  // fail loudly — never silently diverge or AIOOBE.

  private val cents2 = Array(
    org.apache.spark.sql.Row(1, Seq(1.0, 0.0), 1.0),
    org.apache.spark.sql.Row(2, Seq(0.0, 1.0), 1.0))
  private val centsL = Array(
    org.apache.spark.sql.Row(1L, Seq(1.0, 0.0), 1.0),
    org.apache.spark.sql.Row(2L, Seq(0.0, 1.0), 1.0))

  test("nearest_cell sim mode ranks a NaN sim first, like orderBy(desc)") {
    // zero-norm vector → sim = 0/0 = NaN for every cell; Spark's desc
    // ordering puts NaN FIRST, so the pick must be the lowest cent_id
    // with a NaN score — not the last finite cell
    val df = Seq((1L, Seq(0.0, 0.0), 0.0), (2L, Seq(3.0, 4.0), 5.0))
      .toDF("id", "v", "nrm")
    val got = df.select(col("id"),
        graft.functions.IvfProbe.nearestCell(
          col("v"), col("nrm"), centsL, emitTheta = false).as("nc"))
      .select(col("id"), col("nc.cell"), col("nc.score"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(1L)._1 === 1L && got(1L)._2.isNaN)
    assert(got(2L) === ((2L, 4.0 / 5.0)))
  }

  test("ivf probes fail loudly on vector/centroid dim mismatch") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0), 1.0)).toDF("id", "v", "nrm")
    val ex = intercept[Exception] {
      df.select(graft.functions.IvfProbe.cellProbes(
        col("v"), col("nrm"), cents2, nprobe = 2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("centroid dim")))
  }

  test("ivf expressions reject an empty centroid table at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.IvfProbe.cellProbes(
        col("v"), col("nrm"), Array.empty, nprobe = 2)
    }
    intercept[IllegalArgumentException] {
      graft.functions.IvfProbe.nearestCell(
        col("v"), col("nrm"), Array.empty, emitTheta = true)
    }
  }
}
