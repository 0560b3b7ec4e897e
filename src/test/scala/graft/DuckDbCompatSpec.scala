package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Each DuckDB-compat shim (GraftExtensions / functions.DuckDbCompat)
  * must be EXACTLY its documented Spark-native twin — same values on
  * fixture data, via spark.sql against the DataFrame-API expression. */
class DuckDbCompatSpec extends SparkSpec {

  private def check(sqlExpr: String, native: org.apache.spark.sql.Column,
                    table: String): Unit = {
    val df = table match {
      case "orders"    => Tables.orders(spark, sf0001)
      case "events"    => Tables.events(spark, sf0001)
      case "documents" => Tables.documents(spark, sf0001)
    }
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql(s"SELECT $sqlExpr AS x FROM t")
      .collect().map(_.get(0)).toSeq
    val viaDf = df.select(native.as("x")).collect().map(_.get(0)).toSeq
    assert(viaSql === viaDf, s"shim '$sqlExpr' diverges from its twin")
  }

  test("epoch_us / epoch_ms == unix_micros / unix_millis on cast timestamps") {
    check("epoch_us(CAST(o_orderdate AS TIMESTAMP))",
      unix_micros(col("o_orderdate").cast("timestamp")), "orders")
    check("epoch_ms(CAST(o_orderdate AS TIMESTAMP))",
      unix_millis(col("o_orderdate").cast("timestamp")), "orders")
    // and on TIMESTAMP_NTZ inputs the shim's inner cast applies (UTC
    // session — value-preserving), matching the Det.epochUs discipline
    check("epoch_us(o_orderdate)",
      unix_micros(col("o_orderdate").cast("timestamp")), "orders")
  }

  test("week == weekofyear (ISO-8601 on both engines)") {
    check("week(o_orderdate)", weekofyear(col("o_orderdate")), "orders")
  }

  test("sha256 == sha2(x, 256)") {
    check("sha256(text)", sha2(col("text"), 256), "documents")
  }

  test("xor == ^") {
    check("xor(o_orderkey, o_custkey)",
      col("o_orderkey").bitwiseXOR(col("o_custkey")), "orders")
  }

  test("json_extract_string == get_json_object") {
    check("json_extract_string(props, '$.source')",
      get_json_object(col("props"), "$.source"), "events")
  }

  test("array_to_string == array_join") {
    check("array_to_string(split(text, ' '), '-')",
      array_join(split(col("text"), " "), "-"), "documents")
  }

  test("quantile_cont == percentile (continuous interpolation)") {
    Tables.orders(spark, sf0001).createOrReplaceTempView("t25")
    val viaSql = spark.sql(
      "SELECT quantile_cont(o_totalprice, 0.25) AS x FROM t25")
    val viaDf = Tables.orders(spark, sf0001)
      .select(percentile(col("o_totalprice"), lit(0.25)).as("x"))
    assert(viaSql.collect().map(_.get(0)).toSeq ===
           viaDf.collect().map(_.get(0)).toSeq)
  }
}
