package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap for stored-index compaction — shared by
  * [[graft.operators.DedupIndex]], [[graft.operators.InvertedIndex]] and
  * [[graft.operators.AnnIndex]].
  *
  * The naive swap (`delete(root); rename(staging, root)`) has a window
  * where a crash leaves NO artifact at `root` at all: every committed
  * ingest plus the high-water mark sit orphaned under the staging dir
  * with nothing pointing at them, and the owning index's `exists()`
  * reads false — a caller following the usual `if (!exists) build`
  * pattern would then REBUILD from whatever frame it has on hand (for a
  * streaming deployment: one batch, not the corpus). So the swap is
  * two renames with a recovery protocol instead:
  *
  *   1. staging is built COMPLETELY, its marker file written last —
  *      marker presence ⇒ the fold finished;
  *   2. `rename(root, root.old)`   (the old artifact steps aside);
  *   3. `rename(staging, root)`    (the fold takes its place);
  *   4. `delete(root.old)`         (cleanup, not correctness).
  *
  * Directory rename is atomic on HDFS and on local filesystems, so a
  * crash can only land BETWEEN steps, and every landing spot is
  * recoverable from directory state alone:
  *
  *   - crash in 1: root intact, staging missing its marker →
  *     [[recover]] is a no-op; the next compact() deletes the stale
  *     staging and starts over;
  *   - crash between 2 and 3: root absent, staging complete →
  *     [[recover]] finishes the promote (staging → root, drop root.old);
  *   - crash between 3 and 4: root intact, root.old left behind →
  *     [[recover]] deletes the leftover;
  *   - the theoretically-unreachable "root absent, staging incomplete,
  *     root.old present" state rolls BACK (root.old → root) — service
  *     beats fold-freshness.
  *
  * An object-store deployment replaces the renames with a manifest
  * swap; the staging/marker/recover contract is unchanged.
  *
  * Concurrency contract: compaction is SINGLE-WRITER — at most one
  * [[promote]] (one `compact()`) per index root at a time; two
  * concurrent folds of the same root are a caller bug. [[recover]],
  * however, runs from every reader (`exists()` on all four indexes
  * calls it), so a reader CAN race the writer inside promote's
  * two-rename window: the reader sees root absent + staging complete
  * and finishes the promote itself. Both sides therefore tolerate a
  * LOST rename — when a rename fails they re-check whether the other
  * party already put an artifact at root (the index content is
  * identical whichever side won) instead of require-failing.
  */
object AtomicSwap {

  def stagingPath(root: Path): Path = new Path(root.toString + ".compact")
  private def oldPath(root: Path): Path = new Path(root.toString + ".old")

  /** Steps 2–4 above. `staging` MUST be complete (marker written) —
    * callers write the marker as the last staging step. */
  def promote(fs: FileSystem, root: Path): Unit = {
    val staging = stagingPath(root)
    val old = oldPath(root)
    if (fs.exists(old)) fs.delete(old, true)
    require(fs.rename(root, old),
      s"compaction swap failed: could not set $root aside as $old")
    if (!fs.rename(staging, root)) {
      // a concurrent reader's recover() saw root absent + staging
      // complete inside our window and finished the promote for us —
      // the artifact at root IS the fold; anything else is a real
      // failure (the previous artifact is intact at root.old).
      require(fs.exists(root) && !fs.exists(staging),
        s"compaction swap failed: could not promote $staging to $root " +
          s"(the previous artifact is intact at $old — rename it back)")
    }
    fs.delete(old, true)
  }

  /** Repair any torn [[promote]] (see the object Scaladoc's case table).
    * `marker` is the staging-relative file written LAST during the fold
    * (the high-water mark file for all three indexes). Returns true iff
    * an artifact was restored at `root` — callers' `exists()` invoke
    * this before answering, so a torn swap heals on first touch instead
    * of reading as "no index". Idempotent and cheap (three exists
    * probes) when there is nothing to repair. */
  def recover(fs: FileSystem, root: Path, marker: String): Boolean = {
    val staging = stagingPath(root)
    val old = oldPath(root)
    val stagingComplete =
      fs.exists(staging) && fs.exists(new Path(staging, marker))
    if (!fs.exists(root) && stagingComplete) {
      // the rename can lose a race with the writer's own promote (or a
      // sibling reader's recover) completing first — root existing
      // afterwards means the identical artifact landed either way
      if (!fs.rename(staging, root))
        require(fs.exists(root),
          s"swap recovery failed: could not promote $staging to $root")
      fs.delete(old, true)
      true
    } else if (!fs.exists(root) && fs.exists(old)) {
      if (!fs.rename(old, root))
        require(fs.exists(root),
          s"swap recovery failed: could not roll $old back to $root")
      true
    } else {
      if (fs.exists(root) && fs.exists(old)) fs.delete(old, true)
      false
    }
  }
}
