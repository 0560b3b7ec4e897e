package graft.util

import org.apache.spark.sql.DataFrame

/** Materialization for ITERATIVE fixpoints (DedupCluster's label
  * propagation, BpeTrain's merge rounds) — the places where a truncated
  * lineage lives across many driver-coordinated jobs.
  *
  * Default: `localCheckpoint(eager = true)` — blocks live on executors,
  * zero filesystem round-trips, right for the single-JVM harness and
  * short fixpoints. The trade: Spark cannot recompute a truncated
  * lineage, so an executor loss mid-fixpoint fails the job.
  *
  * Opt-in: set `spark.graft.checkpointDir` (session conf) to a
  * cluster-visible path and the same call sites switch to RELIABLE
  * `checkpoint()` — each round's state writes through to the checkpoint
  * filesystem (HDFS/S3), so a lost executor re-reads instead of killing
  * a multi-hour 1000-executor fixpoint. One conf, no signature changes:
  * exactly how a deployment flips the durability dial per job. */
object Fixpoint {

  /** Session conf key: when set (non-empty), fixpoint rounds use
    * reliable `checkpoint()` against this directory. */
  val ConfKey = "spark.graft.checkpointDir"

  /** Truncate `df`'s lineage eagerly — locally by default, reliably
    * when [[ConfKey]] is set. */
  def materialize(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = s.sparkContext
        // setCheckpointDir appends a per-context UUID subdir, so "is it
        // already set to OUR dir" is not string-comparable — set it only
        // when unset and leave an explicit caller-set dir alone.
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
