package graft

import org.apache.hadoop.fs.Path
import graft.util.AtomicSwap

/** The crash-safety contract of the shared compaction swap: every spot
  * a crash can land between promote's renames is recoverable from
  * directory state alone, and recovery always prefers a COMPLETE
  * artifact (fold if finished, else the old root) over none. Exercised
  * directly on a local FS here; the index-level integration (a torn
  * swap healing through exists()) is pinned in AnnIndexSpec. */
class AtomicSwapSpec extends SparkSpec {

  private val marker = "compacted_through"

  private def mkRoot(tag: String): Path = new Path(
    java.nio.file.Files.createTempDirectory(s"graft_swap_$tag").toString,
    "idx")

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** A directory with one content file so we can tell artifacts apart. */
  private def mkArtifact(f: org.apache.hadoop.fs.FileSystem, dir: Path,
                         content: String, withMarker: Boolean): Unit = {
    f.mkdirs(dir)
    val out = f.create(new Path(dir, "data"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (withMarker) f.create(new Path(dir, marker), true).close()
  }

  private def contentOf(f: org.apache.hadoop.fs.FileSystem,
                        dir: Path): String = {
    val in = f.open(new Path(dir, "data"))
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  test("promote: staging replaces root, old artifact cleaned up") {
    val root = mkRoot("happy"); val f = fs(root)
    mkArtifact(f, root, "old", withMarker = true)
    mkArtifact(f, AtomicSwap.stagingPath(root), "new", withMarker = true)
    AtomicSwap.promote(f, root)
    assert(contentOf(f, root) === "new")
    assert(!f.exists(AtomicSwap.stagingPath(root)))
    assert(!f.exists(new Path(root.toString + ".old")))
  }

  test("recover: crash before the swap (staging incomplete) is a no-op") {
    val root = mkRoot("pre"); val f = fs(root)
    mkArtifact(f, root, "old", withMarker = true)
    mkArtifact(f, AtomicSwap.stagingPath(root), "partial",
      withMarker = false)
    assert(!AtomicSwap.recover(f, root, marker))
    assert(contentOf(f, root) === "old", "recover touched an intact root")
    assert(f.exists(AtomicSwap.stagingPath(root)),
      "recover deleted a staging the next compact() would restart from")
  }

  test("recover: crash between the renames promotes the completed fold") {
    // root stepped aside (rename 1 done), fold never promoted (rename 2
    // not reached): root is ABSENT — the exact window ADVICE flagged
    val root = mkRoot("mid"); val f = fs(root)
    mkArtifact(f, new Path(root.toString + ".old"), "old",
      withMarker = true)
    mkArtifact(f, AtomicSwap.stagingPath(root), "new", withMarker = true)
    assert(AtomicSwap.recover(f, root, marker))
    assert(contentOf(f, root) === "new",
      "recovery did not promote the completed fold")
    assert(!f.exists(new Path(root.toString + ".old")))
    assert(!f.exists(AtomicSwap.stagingPath(root)))
  }

  test("recover: root absent with an INCOMPLETE staging rolls back to old") {
    // theoretically unreachable via promote() (staging is complete
    // before rename 1 ever runs), but recoverable anyway: service
    // beats fold-freshness
    val root = mkRoot("back"); val f = fs(root)
    mkArtifact(f, new Path(root.toString + ".old"), "old",
      withMarker = true)
    mkArtifact(f, AtomicSwap.stagingPath(root), "partial",
      withMarker = false)
    assert(AtomicSwap.recover(f, root, marker))
    assert(contentOf(f, root) === "old",
      "recovery did not roll back to the old artifact")
  }

  test("recover: crash after the swap just clears the leftover old dir") {
    val root = mkRoot("post"); val f = fs(root)
    mkArtifact(f, root, "new", withMarker = true)
    mkArtifact(f, new Path(root.toString + ".old"), "old",
      withMarker = true)
    assert(!AtomicSwap.recover(f, root, marker))
    assert(contentOf(f, root) === "new")
    assert(!f.exists(new Path(root.toString + ".old")),
      "recovery left the superseded artifact behind")
  }

  test("recover: nothing anywhere is a clean false") {
    val root = mkRoot("none"); val f = fs(root)
    assert(!AtomicSwap.recover(f, root, marker))
    assert(!f.exists(root))
  }
}
