package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.DedupIndex
import graft.sources.Tables

/** The dedup-index-at-rest contract: the stored band+profile artifact
  * dedups an incoming batch (a) identically to the exhaustive exact-
  * Jaccard pair set restricted to the batch/corpus split, (b) purely
  * from storage on repeat queries, (c) incrementally via append —
  * indexing a batch costs O(batch), never a corpus re-signature — and
  * (d) without ever shuffling the stored corpus (broadcast-batch plan
  * shape, the 100-TB property the artifact exists for). */
class DedupIndexSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  private def tmpRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_didx_$tag").toString

  private def shingles(sfDir: String, pred: org.apache.spark.sql.Column) =
    graft.Graft.shingleRows(
      Tables.documents(spark, sfDir).filter(pred), "doc_id", "text", n = 3)

  /** Exhaustive ground truth: exact Jaccard >= t over batch×corpus pairs
    * via the shared shingle equi-join path (no banding involved). */
  private def exhaustive(sfDir: String, t: Double): Seq[String] = {
    val sh = graft.Graft.shingleRows(
      Tables.documents(spark, sfDir), "doc_id", "text", n = 3)
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_list(col("shingle"))).as("ss"),
           count(lit(1)).as("n_sh"))
    val batch = sets.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id").as("batch_doc"), col("ss").as("sa"),
              col("n_sh").as("n_a"))
    val corpus = sets.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id").as("corpus_doc"), col("ss").as("sb"),
              col("n_sh").as("n_b"))
    batch.crossJoin(corpus)
      .withColumn("n_inter",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("j", col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("j") >= t)
      .select(col("batch_doc"), col("corpus_doc"),
              round(col("j"), 6).as("jaccard"))
      .orderBy("batch_doc", "corpus_doc")
      .collect().map(_.toString).toSeq
  }

  private def declared(sfDir: String): Seq[String] =
    SparkEntry.queries("q_dedup_index_query")(spark, sfDir)
      .collect().map(_.toString).toSeq

  test("q_dedup_index_query == exhaustive batch×corpus Jaccard at two tiers") {
    for (sf <- Seq(sf0001, sf001))
      assert(declared(sf) === exhaustive(sf, 0.8), s"mismatch at $sf")
  }

  test("repeat queries answer purely from storage (no rebuild, identical)") {
    // first declared call built the artifact; a second must return the
    // identical pair set without re-signaturing the corpus
    val first = declared(sf0001)
    val second = declared(sf0001)
    assert(first === second && first.nonEmpty)
  }

  test("append == rebuild: incremental indexing matches a full build") {
    val docs = Tables.documents(spark, sf001)
    val corpusPred = pmod(col("doc_id"), lit(5)) =!= 0
    // full build over the whole corpus
    val full = tmpRoot("full")
    DedupIndex.build(shingles(sf001, corpusPred), full)
    // half-then-append: initial backfill + an incremental day
    val incr = tmpRoot("incr")
    DedupIndex.build(
      shingles(sf001, corpusPred && col("doc_id") < 250), incr)
    DedupIndex.append(
      shingles(sf001, corpusPred && col("doc_id") >= 250), incr, ingestId = 1)
    val batch = shingles(sf001, pmod(col("doc_id"), lit(5)) === 0)
      .localCheckpoint(true)
    def ask(root: String) =
      DedupIndex.queryBatch(spark, root, batch)
        .orderBy("batch_doc", "corpus_doc").collect().map(_.toString).toSeq
    assert(ask(incr) === ask(full) && ask(full).nonEmpty)
  }

  test("the query path never shuffles the stored corpus (broadcast-batch shape)") {
    val root = tmpRoot("shape")
    DedupIndex.build(shingles(sf001, pmod(col("doc_id"), lit(5)) =!= 0), root)
    val q = DedupIndex.queryBatch(spark, root,
      shingles(sf001, pmod(col("doc_id"), lit(5)) === 0))
    q.collect()
    // AQE-final section only (toString repeats scans in "== Initial Plan ==")
    val full = q.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i  => full.substring(0, i)
    }
    // both stored-artifact joins must be broadcast joins (batch side
    // built): an Exchange hashpartitioning over a stored-table scan
    // would mean the corpus is shuffled per batch
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    val scanLines = plan.linesIterator
      .filter(l => l.contains("FileScan parquet") &&
        (l.contains("/bands") || l.contains("/profiles"))).toSeq
    assert(scanLines.size == 2, s"expected 2 artifact scans:\n$plan")
  }
}
