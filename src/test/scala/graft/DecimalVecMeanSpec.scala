package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.DecimalVecMean
import graft.sources.Tables

/** The fused Lloyd-round mean (functions.DecimalVecMean) must be
  * BIT-IDENTICAL to the posexplode + decimal-sum + regroup form it
  * replaced in IvfKMeans.centroids / ProductQuantizer.codebooks — the
  * r18 optimization is exchange-count only, never arithmetic. */
class DecimalVecMeanSpec extends SparkSpec {

  /** The exact pre-r18 form: posexplode → groupBy(g, pos) decimal mean
    * → regroup into a pos-sorted array. */
  private def oldForm(df: DataFrame, g: String, v: String): DataFrame =
    df.select(col(g), posexplode(col(v)).as(Seq("pos", "x")))
      .groupBy(g, "pos")
      .agg((sum(col("x").cast(DecimalType(30, 12))).cast("double") /
            count(lit(1))).as("m"))
      .groupBy(g)
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        e => e("m")).as("cv"))

  private def newForm(df: DataFrame, g: String, v: String): DataFrame =
    df.groupBy(g).agg(DecimalVecMean.mean(col(v)).as("cv"))

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("fused mean ≡ posexplode decimal mean on the fixture embeddings") {
    val emb = queries.LlmOps.embDouble(Tables.embeddings(spark, sf0001))
      .select(pmod(col("vec_id"), lit(7L)).as("g"), col("v"))
    assert(canon(newForm(emb, "g", "v")) == canon(oldForm(emb, "g", "v")))
  }

  test("fused mean ≡ posexplode decimal mean on adversarial doubles") {
    // values that stress the double→decimal(30,12) HALF_UP rounding and
    // the sum order: tiny magnitudes, sign flips, repeating fractions
    val rows = (0 until 400).map { i =>
      val g = i % 5
      val v = Array.tabulate(8) { j =>
        val x = (i * 31 + j * 17 + 3).toDouble
        math.sin(x) * math.pow(10.0, (i % 9) - 4) +
          (if ((i + j) % 3 == 0) 1e-13 else 0.0)
      }
      (g, v)
    }
    val df = spark.createDataFrame(rows).toDF("g", "v")
    assert(canon(newForm(df, "g", "v")) == canon(oldForm(df, "g", "v")))
  }

  test("fused mean survives partial-buffer serialization (repartitioned)") {
    val emb = queries.LlmOps.embDouble(Tables.embeddings(spark, sf0001))
      .select(pmod(col("vec_id"), lit(3L)).as("g"), col("v"))
    val one = canon(newForm(emb.coalesce(1), "g", "v"))
    val many = canon(newForm(emb.repartition(7), "g", "v"))
    assert(one == many, "decimal sums must be partition-order-independent")
  }
}
