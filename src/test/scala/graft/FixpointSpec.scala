package graft

import org.apache.spark.sql.functions._

/** util.Fixpoint's durability dial: by default fixpoint rounds truncate
  * lineage with executor-local checkpoints; with
  * `spark.graft.checkpointDir` set they must (a) produce IDENTICAL
  * results and (b) actually write through to the reliable checkpoint
  * directory — the path a 1000-executor deployment depends on to
  * survive executor loss mid-fixpoint. */
class FixpointSpec extends SparkSpec {
  import spark.implicits._

  test("DedupCluster: reliable-checkpoint run ≡ local run, and writes to the dir") {
    // a chain component (forces pointer-jump rounds) + a clique + a singleton
    val pairs = (1L to 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (20L, 22L), (21L, 22L))
    val pairsDf = pairs.toDF("doc_a", "doc_b")
    val allIds = ((1L to 10L) ++ Seq(20L, 21L, 22L, 30L)).toDF("doc_id")
    def run(): Map[Long, Long] =
      graft.operators.DedupCluster.clusters(allIds, pairsDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run()
    assert((1L to 10L).forall(local(_) === 1L))
    assert(Seq(20L, 21L, 22L).forall(local(_) === 20L))
    assert(local(30L) === 30L)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixpoint-ckpt").toString
    spark.conf.set(graft.util.Fixpoint.ConfKey, dir)
    try {
      val reliable = run()
      assert(reliable === local,
        "reliable-checkpoint fixpoint diverged from the local-checkpoint run")
      // proof the reliable path executed: checkpoint part-files exist
      // under the configured directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(wrote > 0, s"no reliable checkpoint data written under $dir")
    } finally spark.conf.unset(graft.util.Fixpoint.ConfKey)
  }

  test("DedupCluster: a 300-deep chain converges under default maxIters") {
    // THE regression shape: min-label + pointer jumping converged on
    // every clique-shaped near-dup graph and on pure chains, but
    // degraded to O(diameter) on sprawling components — the sf0.1 ANN
    // mutual graph needed 26 of 25 budgeted rounds and failed only at
    // that one tier. Star contraction (large-star/small-star) is
    // O(log² n) regardless of shape; a deep chain with shuffled ids is
    // the depth-adversarial case and must converge comfortably.
    val n = 300
    // shuffle ids deterministically so labels do not align with the
    // chain direction (the alignment is what made pure chains easy for
    // the old jump)
    val ids = (0L until n.toLong).map(i => (i * 173L) % n.toLong)
    val pairs = (0 until n - 1).map(i => (ids(i), ids(i + 1)))
      .toDF("doc_a", "doc_b")
    val allIds = (0L until n.toLong).toDF("doc_id")
    val out = graft.operators.DedupCluster.clusters(allIds, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === n)
    assert(out.values.forall(_ === 0L), "chain not fully contracted to min id")
  }

  test("DedupCluster: pure-distributed path (gate=0) ≡ hybrid local finish") {
    // chain (depth-adversarial) + clique + singleton, shuffled ids —
    // the same labels must come out of the driver-side union-find
    // finish (default gate: these graphs fit from round 0) and the
    // pure-distributed star fixpoint (gate forced to 0, every round
    // and the stars-exit predicate exercised distributed).
    val n = 40
    val ids = (0L until n.toLong).map(i => (i * 173L) % n.toLong)
    val pairs = ((0 until n - 1).map(i => (ids(i), ids(i + 1))) ++
      Seq((50L, 51L), (50L, 52L), (51L, 52L)))
      .toDF("doc_a", "doc_b")
    val allIds = ((0L until n.toLong) ++ Seq(50L, 51L, 52L, 60L))
      .toDF("doc_id")
    def run(): Map[Long, Long] =
      graft.operators.DedupCluster.clusters(allIds, pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hybrid = run()
    assert((0L until n.toLong).forall(hybrid(_) === 0L))
    assert(Seq(50L, 51L, 52L).forall(hybrid(_) === 50L))
    assert(hybrid(60L) === 60L)
    spark.conf.set(graft.operators.DedupCluster.LocalThresholdKey, "0")
    try {
      val distributed = run()
      assert(distributed === hybrid,
        "pure-distributed star fixpoint diverged from the hybrid finish")
    } finally
      spark.conf.unset(graft.operators.DedupCluster.LocalThresholdKey)
  }

  test("BpeTrain: reliable-checkpoint training ≡ local training") {
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low new low new lowest")).toDF("doc_id", "text")
    def train(): Seq[(Long, String, String, String, Long)] =
      graft.operators.BpeTrain.merges(docs, nMerges = 8)
        .orderBy("step").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
    val local = train()
    assert(local.nonEmpty)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-fixpoint-bpe").toString
    spark.conf.set(graft.util.Fixpoint.ConfKey, dir)
    try assert(train() === local,
      "reliable-checkpoint BPE training diverged from the local run")
    finally spark.conf.unset(graft.util.Fixpoint.ConfKey)
  }
}
