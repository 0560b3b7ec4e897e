package object graft {
  /** A declared query: (session, scale-factor dir) => result frame.
    * RESULT must be a pure function of the parquet under `sfDir`.
    * Exemption: any key that exercises the sink/source boundary or a
    * persist-and-reload cycle (the `q_sink_*` / `q_source_*` family and
    * q_agg_sketch_table's sketch-table round trip) may stage intermediate
    * files — always via the SPARK_GRAFT_SCRATCH contract
    * (queries.Scans.scratch), whose per-(sfDir, session) leaf names keep
    * concurrent runs from clobbering each other; the RESULT must still be
    * a pure function of the `sfDir` parquet.
    */
  type Q = (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame
}
