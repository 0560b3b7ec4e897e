package graft.util

import org.apache.spark.sql.DataFrame

/** Driver-side materialization for trained MODEL frames (k-means
  * centroids, PQ codebooks — k·m rows of a few KB).
  *
  * A model produced as a lazy DataFrame drags its whole training lineage
  * behind it: every later action that broadcasts it (corpus assignment,
  * query probe, encode, ADC table) replays the full Lloyd iteration DAG,
  * because exchange reuse only applies WITHIN one executed plan and
  * checkpoints split the consumers into separate jobs. Collecting the
  * trained rows once and re-injecting them as a LocalRelation makes every
  * subsequent broadcast a zero-job driver-side copy — the train-once /
  * publish-the-artifact discipline a 100-TB deployment uses anyway (the
  * codebook is an index artifact, not a query-time dataset).
  *
  * Only ever call this on bounded model-sized frames. */
object Local {
  def model(df: DataFrame): DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    df.sparkSession.createDataFrame(rows, df.schema)
  }

  /** Model-sized artifact pulled to the driver AS ROWS — for baking a
    * trained table into an expression literal (e.g. the PQ inter-codeword
    * distance array an SDC join scores through). Same discipline and
    * bound as [[model]]; the literal then ships with the plan like any
    * broadcast model. */
  def modelRows(df: DataFrame): Array[org.apache.spark.sql.Row] = df.collect()
}
