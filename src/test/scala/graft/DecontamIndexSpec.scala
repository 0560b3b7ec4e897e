package graft

import org.apache.spark.sql.functions._
import graft.operators.DecontamIndex
import graft.sources.Tables

/** The contamination-index-at-rest contract: the stored Bloom + shingle
  * artifact screens a training corpus (a) identically to the in-flight
  * exact join (candidate-first: the sketch only prunes, the exact join
  * decides), (b) through a map-side might_contain filter on the corpus
  * scan (no corpus shuffle for the join), and (c) purely from storage
  * on repeat queries. */
class DecontamIndexSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("q_decontam_index == q_decontaminate (stored sketch ≡ in-flight) at two tiers") {
    for (sf <- Seq(sf0001, sf001)) {
      val inflight = SparkEntry.queries("q_decontaminate")(spark, sf)
        .collect().map(_.toString).toSeq
      val stored = SparkEntry.queries("q_decontam_index")(spark, sf)
        .collect().map(_.toString).toSeq
      assert(stored === inflight, s"index/in-flight divergence at $sf")
    }
  }

  test("the corpus side filters through might_contain before the join") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dcidx").toString
    val docs = Tables.documents(spark, sf0001)
    val isBench = pmod(col("doc_id"), lit(50L)) === 7L
    DecontamIndex.build(
      Graft.shingleRows(docs.filter(isBench), "doc_id", "text"), root)
    val q = DecontamIndex.query(
      Graft.shingleRows(docs.filter(!isBench), "doc_id", "text"), root)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"corpus scan lost its Bloom pre-filter:\n${plan.take(2000)}")
    assert(q.count() > 0)
  }

  test("an empty bench suite yields an empty report (null-sketch guard)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_dcidx_empty").toString
    val docs = Tables.documents(spark, sf0001)
    DecontamIndex.build(
      Graft.shingleRows(docs.filter(lit(false)), "doc_id", "text"), root)
    val out = DecontamIndex.query(
      Graft.shingleRows(docs, "doc_id", "text"), root)
    assert(out.count() === 0)
  }
}
