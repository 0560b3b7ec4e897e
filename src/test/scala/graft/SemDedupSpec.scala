package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfKMeans, SemDedup}
import graft.queries.LlmOps
import graft.sources.Tables

/** SemDeDup contract: the cluster-scoped decision frame must equal a
  * brute-force replay of the documented rule (same centroids, same
  * left-to-right float arithmetic), and the keep policy's invariants
  * must hold independently of the replay. */
class SemDedupSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def normalized(d: String) =
    LlmOps.embDouble(Tables.embeddings(spark, d))
      .select(col("vec_id"),
        transform(col("v"), x => x / col("nrm")).as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("v")))

  private def cents(emb: org.apache.spark.sql.DataFrame) =
    IvfKMeans.centroids(
      emb.filter(pmod(xxhash64(col("vec_id"), lit(7)), lit(2L)) === 0L),
      k = 8, iters = 2)

  /** Left-to-right dot — the exact summation order VectorExprs.dot uses,
    * so brute-force doubles are bit-equal to the query's. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def bruteForce(d: String, tau: Double)
      : Seq[(Long, Int, Double, Long)] = {
    val emb = normalized(d)
    val cs = cents(emb).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val vs = emb.select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // argmax-cosine assignment, ties to the smaller cent_id
    val assigned = vs.map { case (id, v) =>
      val best = cs.map { case (cid, cv, cnrm) => (dot(v, cv) / cnrm, cid) }
        .reduceLeft((a, b) => if (b._1 > a._1 || (b._1 == a._1 && b._2 < a._2)) b else a)
      (id, best._2, best._1, v)
    }
    val byCell = assigned.groupBy(_._2)
    val dropped = assigned.filter { case (id, cell, cSim, v) =>
      byCell(cell).exists { case (oid, _, oSim, ov) =>
        oid != id && dot(ov, v) >= tau &&
          (oSim < cSim || (oSim == cSim && oid < id))
      }
    }.map(_._1).toSet
    assigned.map { case (id, cell, cSim, _) =>
      (id, cell, cSim, if (dropped(id)) 1L else 0L)
    }.sortBy(_._1).toSeq
  }

  private def viaOperator(d: String, tau: Double)
      : Seq[(Long, Int, Double, Long)] = {
    val emb = normalized(d)
    SemDedup.decisions(emb, cents(emb), tau)
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .toSeq
  }

  test("decisions == brute-force replay of the documented rule (two tiers)") {
    for (d <- Seq(sf0001, sf01)) {
      val got = viaOperator(d, tau = 0.4)
      val want = bruteForce(d, tau = 0.4)
      assert(got === want, s"decision frame diverges at $d")
      assert(want.exists(_._4 == 1L), s"fixture at $d produced no drops")
      assert(want.exists(_._4 == 0L), s"fixture at $d dropped everything")
    }
  }

  test("keep-policy laws: partition, per-cell anchor kept, drops have beaters") {
    val rows = viaOperator(sf0001, tau = 0.4)
    // every vector decided exactly once
    assert(rows.map(_._1).distinct.size === rows.size)
    // the per-cell keep-priority anchor (min cent_sim, ties min id) has
    // no preceding item, so it can never be dropped
    for ((_, cellRows) <- rows.groupBy(_._2)) {
      val anchor = cellRows.minBy(r => (r._3, r._1))
      assert(anchor._4 === 0L,
        s"cell ${anchor._2}: farthest-from-centroid anchor was dropped")
    }
  }

  test("declared q_dedup_semantic: deterministic, rounded, ordered") {
    val a = SparkEntry.queries("q_dedup_semantic")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q_dedup_semantic")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.size === 500)
  }

  test("pair search is an equi-join on the cell id (no corpus nested loop)") {
    val q = SparkEntry.queries("q_dedup_semantic")(spark, sf0001)
    val p = q.queryExecution.executedPlan.toString
    val bad = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filter(l => "(u_id|v_id)#".r.findFirstIn(l).isDefined)
      .toSeq
    assert(bad.isEmpty, s"pair nested loop:\n${bad.mkString("\n")}")
    assert(p.contains("cell#") || p.contains("hashpartitioning(cell"),
      s"no cell equi-join in:\n${p.take(2000)}")
  }
}
