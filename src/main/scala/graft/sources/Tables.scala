package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every declared query reads ONLY through these — one place to change if
  * the physical layout evolves (partitioned dirs, bucketed tables, a real
  * catalog). At cluster scale these would be catalog tables with
  * statistics; here they are bare parquet scans, which Spark's vectorized
  * reader + Catalyst pushdown already handle well.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String)     = load(s, d, "region")
  def nation(s: SparkSession, d: String)     = load(s, d, "nation")
  def customer(s: SparkSession, d: String)   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String)   = load(s, d, "supplier")
  def part(s: SparkSession, d: String)       = load(s, d, "part")
  def orders(s: SparkSession, d: String)     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String)   = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless the legacy conf maps it to a long. Read
    * the raw ns-since-epoch long, then integer-divide to µs (identical
    * truncation to DuckDB's epoch_us; `div` is exact on int64 where a
    * double division would lose ULPs at 1.7e18). Exposed `ts` is a regular
    * µs TIMESTAMP, so window()/session_window()/epochUs work unchanged. */
  def events(s: SparkSession, d: String): DataFrame = {
    // Set once in the Bench/Verify/SparkSpec session builders; kept here
    // DEFENSIVELY so an external caller's vanilla session still reads the
    // ns fixture (idempotent, but hidden session-global state — builders
    // are the proper home).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String)  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}
