package object graft {
  /** A declared query: (session, scale-factor dir) => result frame.
    * Pure function of the parquet under `sfDir` — no other I/O.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame
}
