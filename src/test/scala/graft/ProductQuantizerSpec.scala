package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuantizer._
import graft.sources.Tables

/** PQ structural laws + the recall floor vs the exact cosine oracle —
  * the checks the rows-only driver record cannot make. */
class ProductQuantizerSpec extends SparkSpec {

  private lazy val emb = graft.queries.LlmOps
    .embDouble(Tables.embeddings(spark, sf0001))
    .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
    .cache()

  test("every vector gets exactly m codes, all within [1, k]") {
    val subs = subvectors(emb, m = 8, dim = 64)
    val cb = codebooks(subs, k = 16, iters = 2)
    val codes = graft.operators.ProductQuantizer.encode(subs, cb)
    val n = emb.count()
    assert(codes.count() == n * 8)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 8).count() == 0)
    val bad = codes.filter(col("code_id") < 1 || col("code_id") > 16).count()
    assert(bad == 0, "code ids must index the k=16 codebook")
  }

  test("codebook training is deterministic (bit-identical across runs)") {
    val subs = subvectors(emb, m = 8, dim = 64)
    def rows = codebooks(subs, k = 16, iters = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(rows == rows, "two trainings diverged")
  }

  test("Lloyd iterations do not increase total quantization error") {
    val subs = subvectors(emb, m = 8, dim = 64).localCheckpoint(true)
    def sse(iters: Int): Double = {
      val cb = codebooks(subs, k = 16, iters = iters)
      subs.join(broadcast(cb), Seq("sub"))
        .withColumn("d2",
          graft.functions.VectorExprs.dot(col("sv"), col("sv"))
            - lit(2.0) * graft.functions.VectorExprs.dot(col("sv"), col("cv"))
            + graft.functions.VectorExprs.dot(col("cv"), col("cv")))
        .groupBy("vec_id", "sub").agg(min("d2").as("m"))
        .agg(sum("m")).collect()(0).getDouble(0)
    }
    val e0 = sse(0); val e2 = sse(2)
    assert(e2 <= e0 + 1e-9,
      s"two Lloyd rounds must not raise quantization error: $e0 -> $e2")
  }

  /** Deterministic clustered corpus: 20 distinct centers × 25 members
    * with aperiodic per-point noise. The moduli are chosen so no two
    * centers coincide (37 invertible mod 101, j < 20) and no two ids
    * share a noise pattern (940 = 7919 mod 997 generates all residues
    * over id < 500) — an earlier periodic generator silently made
    * clusters 0/13 identical and produced duplicate points, which
    * invalidated an assumed ground truth. Ground truth is therefore
    * COMPUTED by brute force below, never assumed. */
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
  }

  /** Brute-force exact top-10 neighbor ids of vec 0 (normalized L2). */
  private def exactTop10(e: org.apache.spark.sql.DataFrame): Set[Long] = {
    val q0 = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= 0).crossJoin(q0)
      .select(col("vec_id"),
        (lit(2.0) - lit(2.0) * graft.functions.VectorExprs
          .dot(col("v"), col("qv"))).as("d2"))
      .orderBy(col("d2").asc, col("vec_id").asc)
      .limit(10).collect().map(_.getLong(0)).toSet
  }

  test("recall@10 >= 0.8 on clustered data (where ANN is meaningful)") {
    // the fixture's embeddings are quasi-random (vec 0's top-10 cosines
    // are 0.27–0.33, gaps far below ANY quantizer's error — the PQ
    // pathological case), so the recall law runs on the clustered corpus
    val dim = 64
    val e = clustered(dim).cache()
    val subs = subvectors(e, m = 16, dim = dim).localCheckpoint(true)
    // train on the same deterministic quarter-sample the declared query
    // uses — the recall floor must hold on the SAMPLED path
    val train = subs.filter(
      pmod(xxhash64(col("vec_id"), lit(99)), lit(4L)) === 0L)
    val cb = codebooks(train, k = 16, iters = 2)
    val codes = graft.operators.ProductQuantizer
      .encode(subs.filter(col("vec_id") =!= 0), cb)
    val approx = adcTopK(codes, cb, subs.filter(col("vec_id") === 0), n = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (approx & exactTop10(e)).size
    assert(recall >= 8, s"PQ recall@10 on clustered data: $recall/10")
    e.unpersist()
  }

  test("IVF+PQ recall@10 >= 0.8 on clustered data (residual quantization)") {
    val dim = 64
    val e0 = clustered(dim)
    val e = e0.withColumn("nrm", graft.functions.VectorExprs.norm(col("v")))
      .cache()
    val cents = graft.operators.IvfKMeans.centroids(e, k = 8, iters = 2)
    val approx = graft.operators.ProductQuantizer.ivfpqTopK(
        e, cents, m = 16, dim = dim, kCodes = 16, nprobe = 3,
        queryId = 0, n = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (approx & exactTop10(e)).size
    assert(recall >= 8, s"IVF+PQ recall@10 on clustered data: $recall/10")
    e.unpersist()
  }

  test("q_knn_pq finds closer-than-average vectors even on the random fixture") {
    // no recall floor is honest on quasi-random data; the weak law that
    // must still hold: the PQ top-10's mean TRUE distance beats the
    // corpus mean by a wide margin
    val chosen = SparkEntry.queries("q_knn_pq")(spark, sf0001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val q0 = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val exactD = emb.filter(col("vec_id") =!= 0).crossJoin(q0)
      .select(col("vec_id"),
        (lit(2.0) - lit(2.0) * graft.functions.VectorExprs
          .dot(col("v"), col("qv"))).as("d2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val chosenMean = chosen.toSeq.map(exactD).sum / chosen.size
    val corpusMean = exactD.values.sum / exactD.size
    assert(chosenMean < corpusMean - 0.2,
      s"PQ picks must beat the corpus mean distance: $chosenMean vs $corpusMean")
  }
}
