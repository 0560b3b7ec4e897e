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
  def events(s: SparkSession, d: String)     = load(s, d, "events")
  def documents(s: SparkSession, d: String)  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = load(s, d, "embeddings")
}
