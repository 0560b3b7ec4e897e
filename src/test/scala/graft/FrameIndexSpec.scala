package graft

import org.apache.spark.sql.functions._
import graft.operators.{FrameIndex, PHash}
import graft.sources.Tables

/** The frame-index-at-rest contract — the fourth stored index's
  * lifecycle laws (DedupIndexSpec / RetrievalSpec / AnnIndexSpec are
  * the siblings): append ≡ rebuild, replay exactly-once, compaction
  * preserves rows and answers while folding the layout, the high-water
  * mark refuses folded replays, and a torn compaction swap heals on
  * first touch. */
class FrameIndexSpec extends SparkSpec {

  private def tmpRoot(tag: String): String = new java.io.File(
    java.nio.file.Files.createTempDirectory(s"graft_fidx_$tag").toFile,
    "idx").toString

  private def docs = Tables.documents(spark, sf0001).select("doc_id", "text")

  private def storedRows(root: String): Seq[String] =
    FrameIndex.stored(spark, root)
      .collect().map(_.toString).sorted.toSeq

  private def screen(root: String): Seq[String] =
    PHash.screenFrames(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        FrameIndex.stored(spark, root))
      .collect().map(_.toString).sorted.toSeq

  test("append == rebuild: batching never changes the stored rows or answers") {
    val m5 = pmod(col("doc_id"), lit(5))
    val rootSplit = tmpRoot("apsplit")
    FrameIndex.build(docs.filter(m5 === 1 || m5 === 2), rootSplit)
    FrameIndex.append(docs.filter(m5 === 3), rootSplit, ingestId = 1)
    FrameIndex.append(docs.filter(m5 === 4), rootSplit, ingestId = 2)
    val rootOne = tmpRoot("apone")
    FrameIndex.build(docs.filter(m5 =!= 0), rootOne)
    assert(storedRows(rootSplit) === storedRows(rootOne),
      "stored rows depend on how the admissions were batched")
    assert(screen(rootSplit) === screen(rootOne))
    // replay ingest 2 verbatim: store must not change
    val before = storedRows(rootSplit)
    FrameIndex.append(docs.filter(m5 === 4), rootSplit, ingestId = 2)
    assert(storedRows(rootSplit) === before,
      "replaying a committed ingest changed the store")
  }

  test("compact: rows and screen answers preserved, ingests fold to one") {
    val m5 = pmod(col("doc_id"), lit(5))
    val root = tmpRoot("cpt")
    FrameIndex.build(docs.filter(m5 === 1 || m5 === 2), root)
    FrameIndex.append(docs.filter(m5 === 3), root, ingestId = 1)
    FrameIndex.append(docs.filter(m5 === 4), root, ingestId = 2)
    val (beforeRows, beforeAns) = (storedRows(root), screen(root))
    assert(beforeAns.nonEmpty, "fixture produced no screen hits")
    FrameIndex.compact(spark, root)
    assert(storedRows(root) === beforeRows,
      "compaction changed the stored rows")
    assert(screen(root) === beforeAns,
      "compaction changed the screen answer")
    val ingests = new java.io.File(s"$root/frames").listFiles().toSeq
      .map(_.getName).filter(_.startsWith("ingest=")).sorted
    assert(ingests === Seq("ingest=0"),
      s"compaction left non-folded ingest partitions: $ingests")
    // folded replay refused on the batch face…
    assert(FrameIndex.compactedThrough(spark, root) === 2L)
    val err = intercept[IllegalArgumentException] {
      FrameIndex.append(docs.filter(m5 === 4), root, ingestId = 2)
    }
    assert(err.getMessage.contains("high-water"))
    // …and a NEW ingest above the mark still lands
    FrameIndex.append(docs.filter(m5 === 0), root, ingestId = 3)
    assert(storedRows(root).size > beforeRows.size)
  }

  test("screen branches: forced shuffle ≡ broadcast, bit-for-bit") {
    // the backfill-wave safety valve: a corpus-scale batch must cross
    // the doc-count gate and take the plain equi-join, and that branch
    // must answer exactly like the broadcast one (limit 0 forces it;
    // the default is the production gate)
    val m5 = pmod(col("doc_id"), lit(5))
    val root = tmpRoot("branches")
    FrameIndex.build(docs.filter(m5 === 0), root)
    val wave = docs.filter(m5 =!= 0)
    def run(limit: Long): Seq[String] =
      PHash.screenFrames(wave, FrameIndex.stored(spark, root),
          docBroadcastLimit = limit)
        .collect().map(_.toString).sorted.toSeq
    val bcast = run(Long.MaxValue)
    assert(bcast.nonEmpty, "fixture produced no backfill-wave hits")
    assert(run(0L) === bcast,
      "shuffle branch diverges from the broadcast branch")
    // same law for the both-direction admit screen
    def runAdmit(limit: Long): Seq[String] =
      PHash.screenAdmit(wave, FrameIndex.stored(spark, root),
          excludeStored = wave, docBroadcastLimit = limit)
        .collect().map(_.toString).sorted.toSeq
    assert(runAdmit(0L) === runAdmit(Long.MaxValue),
      "admit-screen shuffle branch diverges from the broadcast branch")
  }

  test("a compaction swap torn mid-rename heals on the next exists()") {
    val m5 = pmod(col("doc_id"), lit(5))
    val root = tmpRoot("torn")
    FrameIndex.build(docs.filter(m5 =!= 0 && m5 =!= 4), root)
    FrameIndex.append(docs.filter(m5 === 4), root, ingestId = 1)
    FrameIndex.compact(spark, root)
    val beforeAns = screen(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootP = new org.apache.hadoop.fs.Path(root)
    val staging = graft.util.AtomicSwap.stagingPath(rootP)
    assert(fs.rename(rootP, staging), "test setup: rename to staging")
    assert(FrameIndex.exists(spark, root),
      "torn swap read as 'no index' instead of healing")
    assert(screen(root) === beforeAns, "healed index answers differently")
  }
}
