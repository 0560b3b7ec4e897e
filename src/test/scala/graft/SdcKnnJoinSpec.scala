package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfKMeans, SdcKnnJoin}

/** SDC batch-ANN-join contract: quantized all-pairs ranking must recall
  * the true neighborhoods where ANN is meaningful (clustered data,
  * computed ground truth), and the plan must stay a cell equi-join with
  * literal-lookup scoring — no pair nested loop, no per-sub join. */
class SdcKnnJoinSpec extends SparkSpec {

  /** Deterministic clustered corpus (the AnnIndexSpec generator): 20
    * centers × 25 members, aperiodic noise. */
  private def clustered(dim: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val pts = for (j <- 0 until 20; i <- 0 until 25) yield {
      val id = (j * 25 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = ((j * 37 + d * 17) % 101 - 50) / 50.0
        val noise = ((id * 7919 + d * 104729) % 997 - 498) / 4000.0
        center + noise
      }
      (id, v)
    }
    val raw = pts.toDF("vec_id", "v")
    val nrm = graft.functions.VectorExprs.norm(col("v"))
    raw.select(col("vec_id"), transform(col("v"), x => x / nrm).as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("v")))
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("mean recall@3 >= 0.8 vs computed brute-force truth on clustered data") {
    graft.util.Confs.ensureObjectHashHeadroom(spark)
    val e = clustered(64).localCheckpoint(true)
    val cents = IvfKMeans.centroids(
      e.filter(pmod(xxhash64(col("vec_id"), lit(7)), lit(2L)) === 0L),
      k = 8, iters = 2)
    val approx = SdcKnnJoin.join(e, cents, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSet }
    val vs = e.select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val truth = vs.map { case (id, v) =>
      id -> vs.filter(_._1 != id)
        .map { case (oid, ov) => (dot(v, ov), oid) }
        .sortBy { case (s, oid) => (-s, oid) }
        .take(3).map(_._2).toSet
    }.toMap
    // diagnostic: candidate-coverage ceiling — recall if every same-cell
    // candidate pair were ranked by EXACT distance (isolates coverage
    // loss from quantization noise)
    val cellOf = e.crossJoin(broadcast(cents))
      .withColumn("sim", graft.functions.VectorExprs.dot(col("v"), col("cv"))
        / (col("nrm") * col("cnrm")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(col("sim").desc, col("cent_id").asc)))
      .filter(col("rk") <= 2)
      .select("vec_id", "cent_id").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getInt(1)).toSet }
    val ceilTop = vs.map { case (id, v) =>
      id -> vs.filter { case (oid, _) =>
          oid != id && (cellOf(id) & cellOf(oid)).nonEmpty }
        .map { case (oid, ov) => (dot(v, ov), oid) }
        .sortBy { case (s, oid) => (-s, oid) }.take(3).map(_._2).toSet
    }.toMap
    val ceil = truth.toSeq.map { case (id, t) =>
      (ceilTop.getOrElse(id, Set.empty) & t).size.toDouble / t.size }
    info(f"candidate ceiling recall@3 = ${ceil.sum / ceil.size}%.3f")
    val recalls = truth.toSeq.map { case (id, t) =>
      (approx.getOrElse(id, Set.empty) & t).size.toDouble / t.size
    }
    val mean = recalls.sum / recalls.size
    info(f"sdc recall@3 = $mean%.3f")
    assert(mean >= 0.8, f"mean recall@3 = $mean%.3f")
    // every vector with same-cell company gets a neighbor list
    assert(approx.size >= vs.length * 9 / 10)
  }

  test("index-backed joinWithModels is bit-identical to in-flight training") {
    graft.util.Confs.ensureObjectHashHeadroom(spark)
    import graft.operators.AnnIndex
    val e = clustered(64).localCheckpoint(true)
    val root = java.nio.file.Files
      .createTempDirectory("sdc_annidx").toString + "/idx"
    // the q_knn_join_ann deployment shape: models trained ONCE into the
    // stored index, every call answers with assignment+encode+scoring
    AnnIndex.build(e.select("vec_id", "v"), root, k = 8, m = 16,
      dim = 64, kCodes = 32)
    val cents = AnnIndex.centroids(spark, root)
    val cb = AnnIndex.codebooks(spark, root)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._3, t._2)).toSeq
    val stored = rows(SdcKnnJoin.joinWithModels(e, cents, cb, k = 3))
    // identical samples/seeds/expressions ⟹ the training form over the
    // SAME centroids must reproduce the stored-index ranking exactly
    val trained = rows(SdcKnnJoin.join(e, cents, k = 3))
    assert(stored == trained,
      "stored-index SDC ranking diverged from the in-flight training form")
    // recall gate holds through the stored-index path (same 0.8 bar as
    // the training-form test above, same clustered truth)
    import org.apache.spark.sql.functions.col
    val approx = stored.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(_._2).toSet }
    val vs = e.select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val truth = vs.map { case (id, v) =>
      id -> vs.filter(_._1 != id)
        .map { case (oid, ov) => (dot(v, ov), oid) }
        .sortBy { case (s, oid) => (-s, oid) }
        .take(3).map(_._2).toSet
    }.toMap
    val recalls = truth.toSeq.map { case (id, t) =>
      (approx.getOrElse(id, Set.empty) & t).size.toDouble / t.size }
    val mean = recalls.sum / recalls.size
    info(f"stored-index sdc recall@3 = $mean%.3f")
    assert(mean >= 0.8, f"mean recall@3 = $mean%.3f")
  }

  test("block path ≡ general pair-row path bit-for-bit at nprobe = 2") {
    // The block scorer decides multi-probe canonicality LOCALLY (each
    // copy carries its vector's other probed cell); the general path
    // resolves it with the cross-cell (np, cell) pick. Same corpus,
    // same models ⇒ the two formulations must agree on every
    // (vec_id, nbr_id, approx_d2) triple, including pairs that meet in
    // two shared cells (the clustered corpus + nprobe 2 produces them).
    graft.util.Confs.ensureObjectHashHeadroom(spark)
    val e = clustered(64).localCheckpoint(true)
    val cents = IvfKMeans.centroids(
      e.filter(pmod(xxhash64(col("vec_id"), lit(7)), lit(2L)) === 0L),
      k = 8, iters = 2)
    val assigned = SdcKnnJoin.multiAssign(e, cents, nprobe = 2)
    val cb = graft.operators.ProductQuantizer.codebooks(
      graft.operators.ProductQuantizer.subvectors(
        assigned.filter(col("primary"))
          .filter(pmod(xxhash64(col("vec_id"), lit(99)), lit(4L)) === 0L)
          .select(col("vec_id"), col("rv").as("v")), 16, 64),
      32, iters = 2)
    val packed = SdcKnnJoin.packedOf(assigned, cb, 16, 64)
      .localCheckpoint(true)
    val flat = SdcKnnJoin.sdcTable(cb, 16, 32)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._3, x._2)).toSeq
    val blockOut = rows(SdcKnnJoin.blockScore(packed, flat, 32, 3))
    val generalOut = rows(SdcKnnJoin.generalScore(packed, flat, 32, 3))
    assert(blockOut === generalOut,
      "block SDC path diverged from the general pair-row path")
    assert(blockOut.nonEmpty)
  }

  test("cell-id packing guard rejects centroid tables with >= 1024 cells") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = clustered(64)
    // a centroid table whose ids overflow the 1024 packing headroom must
    // fail FAST with the invariant named, not corrupt unpacked pair ids
    val bad = Seq((1024, Array.fill(64)(0.1), 0.8)).toDF("cent_id", "cv", "cnrm")
    val ex = intercept[IllegalArgumentException] {
      SdcKnnJoin.join(e, bad, k = 3).collect()
    }
    assert(ex.getMessage.contains("1024"))
  }

  test("declared q_knn_join_ann: k rows per covered vector, plan stays equi-join") {
    val q = SparkEntry.queries("q_knn_join_ann")(spark, sf0001)
    val rows = q.collect()
    assert(rows.length > 0)
    // ≤ k neighbors per vector, all distances rounded and non-negative
    val byVec = rows.groupBy(_.getLong(0))
    assert(byVec.values.forall(_.length <= 3))
    assert(rows.forall(_.getDouble(2) >= 0.0))
    val p = q.queryExecution.executedPlan.toString
    val bad = p.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin"))
      .filter(l => "(id_a|id_b|vec_id|nbr_id)#".r.findFirstIn(l).isDefined)
      .toSeq
    assert(bad.isEmpty, s"pair nested loop:\n${bad.mkString("\n")}")
    // scoring is literal-lookup: no join keyed on the PQ code id
    assert(!p.linesIterator.exists(l =>
        l.contains("Join") && l.contains("code_id#")),
      "SDC scoring regressed to a per-code join")
  }
}
