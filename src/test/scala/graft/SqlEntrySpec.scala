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

  /** Oracle SQL that is valid in both dialects (verified by this spec). */
  private val ansiCommon = Seq(
    "q_agg_hash", "q_agg_distinct", "q_agg_having", "q_agg_rollup",
    "q_agg_cube",
    "q_filter_pred", "q_filter_null", "q_case_when",
    "q_join_inner", "q_join_left", "q_join_right", "q_join_full",
    "q_join_semi", "q_join_anti", "q_join_cross", "q_join_theta",
    "q_join_multiway", "q_join_fk_agg", "q_join_bcast",
    "q_sort_multi", "q_topk", "q_limit_offset",
    "q_union_all", "q_union_distinct", "q_intersect", "q_except",
    "q_win_rank", "q_win_topk_group", "q_win_dist",
    "q_sample_stratified", "q_split_train", "q_sql_entry",
    "q_sample_reservoir", "q_merge_upsert", "q_sink_delete")
  // Excluded, with the DuckDB-only construct that blocks Spark's parser /
  // resolver: q_agg_grouping_sets (2-arg GROUPING), q_win_analytic +
  // every epoch_us oracle, the string_split/list-lambda family
  // (q_tok_hist, text/dedup oracles), sha256 (Spark: sha2), `//` integer
  // division (q_mix_sources), WITH RECURSIVE (q_dedup_cluster).

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
