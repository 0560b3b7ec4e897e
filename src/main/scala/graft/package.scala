package object graft {
  /** A declared query: (session, scale-factor dir) => result frame.
    * RESULT must be a pure function of the parquet under `sfDir`.
    * Exemption: the `q_sink_*` / `q_source_*` keys exist to exercise the
    * sink/source boundary itself — they stage intermediate files under
    * the SPARK_GRAFT_SCRATCH contract (see queries.Scans.scratch), with
    * per-(sfDir, session) leaf names so concurrent runs never clobber.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame
}
