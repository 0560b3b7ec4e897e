package graft

import org.apache.spark.sql.DataFrame
import graft.sources.Tables

/** Entry-2 (SQL string) equivalence — SURVEY §3.2: for the oracle SQL
  * written in the ANSI subset BOTH engines parse, `spark.sql(oracleSql(k))`
  * must produce exactly the rows `queries(k)` produces. This drives the
  * `spark.sql` entry point end-to-end (parser → analyzer → same Catalyst
  * pipeline) and triple-checks those oracles: DataFrame ≡ Spark SQL ≡
  * DuckDB (the driver's hash gate being the third leg).
  *
  * Keys whose oracle uses DuckDB-only surface (list_* lambdas,
  * string_split, sha256, epoch_us, `//`, WITH RECURSIVE) are exercised
  * through the driver's DuckDB leg only — listed here as excluded, not
  * silently skipped.
  */
class SqlEntrySpec extends SparkSpec {

  /** Oracle SQL that is valid in both dialects (verified by this spec).
    * Membership is maintained by the SqlEntryScan diagnostic
    * (Test/runMain graft.SqlEntryScan), which classifies every declared
    * oracle as OK / MISMATCH / parse-error against spark.sql. */
  private val ansiCommon = Seq(
    "q_agg_hash", "q_agg_distinct", "q_agg_having", "q_agg_rollup",
    "q_agg_cube", "q_agg_pivot", "q_agg_unpivot", "q_agg_udaf",
    "q_agg_sort_fallback", "q_agg_stats", "q_agg_cogroup",
    "q_agg_argmax", "q_agg_mode",
    "q_filter_pred", "q_filter_null", "q_case_when", "q_cond_funcs",
    "q_project_arith", "q_math_funcs", "q_str_pad", "q_udf_scalar",
    "q_scan_prune",
    "q_join_inner", "q_join_left", "q_join_right", "q_join_full",
    "q_join_semi", "q_join_anti", "q_join_cross", "q_join_theta",
    "q_join_multiway", "q_join_fk_agg", "q_join_bcast",
    "q_join_bloom", "q_join_range", "q_join_salted", "q_join_nullsafe",
    "q_join_lateral",
    "q_sort_multi", "q_topk", "q_limit_offset",
    "q_union_all", "q_union_distinct", "q_intersect", "q_except",
    "q_intersect_all", "q_except_all",
    "q_win_rank", "q_win_topk_group", "q_win_dist",
    "q_sample_stratified", "q_split_train", "q_sql_entry",
    "q_mix_temperature",
    "q_sample_reservoir", "q_merge_upsert", "q_table_diff", "q_dedup",
    "q_text_lang",
    "q_sink_delete", "q_sink_roundtrip", "q_sink_partitioned",
    "q_sink_json", "q_sink_csv", "q_sink_orc", "q_sink_bucketed",
    "q_sink_compact", "q_sink_zorder", "q_source_badrecords",
    // unlocked by the DuckDB-compat function pack (GraftExtensions /
    // functions.DuckDbCompat): the identical oracle text now resolves
    // on spark.sql through name shims with exact-equal semantics
    // (epoch_us/epoch_ms/sha256/xor/json_extract_string/quantile_cont)
    "q_scan_full", "q_scan_filter_pushdown", "q_join_interval",
    "q_session", "q_scd2",
    "q_win_analytic", "q_win_frame_rows", "q_win_frame_time",
    "q_events_session", "q_events_transitions", "q_events_funnel",
    "q_agg_percentile", "q_bit_funcs", "q_dedup_exact", "q_json_funcs")
  // Excluded, with the DuckDB-only construct that blocks Spark's parser /
  // resolver (classification maintained by the SqlEntryScan diagnostic):
  // q_agg_grouping_sets (2-arg GROUPING), q_agg_collect (string_agg
  // ORDER BY — DuckDB 1.0 has no WITHIN GROUP), the string_split/
  // list-lambda/UNNEST-table family (q_tok_hist, text/dedup/quality/
  // pack/multimodal oracles — UNNEST(...) AS t(x) is not Spark table
  // syntax, so function shims cannot help), list_max/list_reduce/range
  // list builtins, 1-arg encode, `//` integer division (q_mix_sources),
  // WITH RECURSIVE (q_dedup_cluster), DOUBLE[]-style array casts of the
  // vector keys (q_knn_*, q_sim_join, q_dedup_embed, q_embed_*),
  // interval/time_bucket syntax (q_tumbling, q_sliding, asof, date
  // funcs), and q_date_extract — a true dialect TRAP, not a gap:
  // dayofweek exists in BOTH engines with different numbering (DuckDB
  // 0=Sunday, Spark 1=Sunday), and shimming would shadow a builtin.

  private def registerViews(): Unit =
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      (t match {
        case "events" => Tables.events(spark, sf0001)
        case other    => Tables.load(spark, sf0001, other)
      }).createOrReplaceTempView(t)

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
  }

  test("spark.sql(oracleSql) ≡ queries(k) for the ANSI-common subset") {
    registerViews()
    val failures = ansiCommon.flatMap { k =>
      try {
        val viaDf = rows(SparkEntry.queries(k)(spark, sf0001))
        val viaSql = rows(spark.sql(SparkEntry.oracleSql(k)))
        if (viaDf == viaSql) None
        else Some(s"$k: ${viaDf.size} DataFrame rows vs ${viaSql.size} SQL rows, " +
          s"first diff: ${viaDf.zipAll(viaSql, "<none>", "<none>")
            .find { case (a, b) => a != b }}")
      } catch {
        case e: Throwable => Some(s"$k: ${String.valueOf(e.getMessage)
          .linesIterator.filter(_.trim.nonEmpty).take(3).mkString(" / ")}")
      }
    }
    assert(failures.isEmpty, s"SQL-entry mismatches:\n${failures.mkString("\n")}")
  }
}
