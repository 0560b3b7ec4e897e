package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorSimJoin
import graft.sources.Tables

/** The centroid-cell exact similarity join must be EXACTLY the all-pairs
  * result (the angular bound is sound — it prunes only cell pairs that
  * cannot contain a qualifying pair), and must actually prune on
  * clustered data. */
class VectorSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(sf: String, threshold: Double): Set[(Long, Long, Double)] = {
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), v.as("v"),
              graft.functions.VectorExprs.norm(v).as("n"))
    val a = emb.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val b = emb.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        graft.functions.VectorExprs.dot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b")), 4))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("cell-pruned exact join equals brute-force all-pairs at two tiers") {
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val got = VectorSimJoin
        .pairs(Tables.embeddings(spark, sf), "vec_id", "embedding", 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === bruteForce(sf, 0.4), s"cell join diverged at $sf")
    }
  }

  test("block-scored knnJoin ≡ pair-row formulation bit-for-bit at two tiers") {
    // knnJoin now scores packed cell blocks inside BlockTopK's primitive
    // loop; the reference here is the OLD pair-row plan — canonical
    // scored pairs from pairs() at threshold −1, both orientations, the
    // same TopKByScore merge. Every double must match exactly: the block
    // kernel reproduces the left-to-right dot, the nrm division, and
    // Catalyst's HALF_UP 4-dp round.
    for (sf <- Seq(sf0001, "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val got = VectorSimJoin.knnJoin(emb, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val scored = VectorSimJoin
        .pairs(emb, "vec_id", "embedding", threshold = -1.0)
      val expect = scored.select(explode(array(
          struct(col("id_a").as("vec_id"), col("id_b").as("nbr_id"),
                 col("cos_sim")),
          struct(col("id_b").as("vec_id"), col("id_a").as("nbr_id"),
                 col("cos_sim")))).as("p"))
        .select("p.vec_id", "p.nbr_id", "p.cos_sim")
        .groupBy("vec_id")
        .agg(graft.functions.TopKByScore
          .topk(col("cos_sim"), col("nbr_id"), 3).as("top"))
        .select(col("vec_id"), explode(col("top")).as("t"))
        .select(col("vec_id"), col("t.id"), col("t.score"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got === expect, s"block knnJoin diverged from pair rows at $sf")
    }
  }

  test("Graft.similarityJoin facade routes through the cell join unchanged") {
    val got = Graft.similarityJoin(Tables.embeddings(spark, sf0001),
        "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === bruteForce(sf0001, 0.4))
  }

  test("angular bound prunes most cell pairs on clustered vectors") {
    // two tight orthogonal clusters: radii ≈ 0.06 rad, inter-centroid
    // angle ≈ π/2 ≫ θ(0.9) + r_a + r_b → cross-cluster cells must prune
    val base1 = Array.fill(8)(0.0).updated(0, 1.0)
    val base2 = Array.fill(8)(0.0).updated(1, 1.0)
    def jitter(base: Array[Double], i: Int): Array[Double] =
      base.zipWithIndex.map { case (x, j) =>
        x + 0.02 * (((i * 31 + j * 17) % 7) - 3) / 3.0 }
    // interleave clusters so the lowest-id centroid sample sees both —
    // centroid quality affects only pruning, but this test asserts pruning
    val rows = (0L until 40L).map { i =>
      val v = if (i % 2 == 0) jitter(base1, i.toInt) else jitter(base2, i.toInt)
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (surviving, total) = VectorSimJoin
      .pruningStats(df, "vec_id", "embedding", threshold = 0.9, k = 4)
    assert(surviving < total,
      s"no pruning: $surviving of $total cell pairs survived")
    // correctness under pruning: exact equality with brute force
    val got = VectorSimJoin.pairs(df, "vec_id", "embedding", 0.9, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val v = col("embedding").cast("array<double>")
    val e = df.select(col("vec_id").as("id"), v.as("v"),
                      graft.functions.VectorExprs.norm(v).as("n"))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"), col("n").as("n_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"), col("n").as("n_b"))
    val exact = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("c", round(
        graft.functions.VectorExprs.dot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b")), 4))
      .filter(col("c") >= 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exact)
    assert(got.nonEmpty, "clustered fixture should produce within-cluster pairs")
  }

  test("skewed-cell corpus: hot cells are SLICED to bounded blocks, result exact") {
    import spark.implicits._
    // the 100-TB failure mode the cell join must survive: a clustered
    // corpus where ONE cell holds most of the corpus. Under the old
    // per-pair equi-join this leaned on AQE's skew-join rewrite; the
    // block-product form packs each cell into ONE row, which AQE cannot
    // split — so skew is now handled STRUCTURALLY: packedBlocks slices
    // any cell past MaxBlockRows into hash-slices, bounding every
    // scoring task by construction whatever the cell distribution.
    val dim = 8
    def h(i: Long, j: Int): Double =
      (((i * 2654435761L + j.toLong * 40503L + 7L) >>> 16) & 0xffffL)
        .toDouble / 65535.0
    val rows = (0L until 4000L).map { i =>
      val v =
        // ids < 16 are the centroid sample (lowest ids) — keep them
        // ISOTROPIC so the tight cluster has no dedicated centroid and
        // all its members collapse onto the single nearest one: a
        // genuinely hot cell, the regime this test exists to provoke
        if (i >= 16L && i % 5 != 0) // 80% in one tight cluster
          Array.tabulate(dim)(j =>
            (if (j == 0) 1.0 else 0.0) + 0.05 * (h(i, j) - 0.5))
        else                        // isotropic background
          Array.tabulate(dim)(j => 2.0 * (h(i, j) - 0.5))
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    // (1) the structural bound: with k=16 cells the hot cluster (3200
    // rows) lands in one cell, which packedBlocks must split into ≥ 2
    // hash-slices, every block ≤ MaxBlockRows
    val v = col("embedding").cast("array<double>")
    val e = df.select(col("vec_id").as("id"), v.as("v"),
      graft.functions.VectorExprs.norm(v).as("nrm"))
    val cents = e.orderBy("id").limit(16)
      .select(col("id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    val blocks = VectorSimJoin.packedBlocks(
        VectorSimJoin.assignments(e, cents))
      .select(col("cell"), col("slice"), size(col("blk")).as("n"))
      .collect()
    val maxBlock = blocks.map(_.getAs[Int]("n")).max
    assert(maxBlock <= VectorSimJoin.MaxBlockRows,
      s"a block exceeds the bound: $maxBlock > ${VectorSimJoin.MaxBlockRows}")
    val slicesPerCell = blocks.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(slicesPerCell.values.max >= 2,
      s"hot cell was not sliced: $slicesPerCell")
    // (2) slicing must be invisible in the output: exact equality with
    // brute force on the skewed corpus at k=16 (the hot-cell regime)
    val got = VectorSimJoin.pairs(df, "vec_id", "embedding",
        threshold = 0.95, k = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        graft.functions.VectorExprs.dot(col("v_a"), col("v_b")) /
          (col("n_a") * col("n_b")), 4))
      .filter(col("cos_sim") >= 0.95)
      .select("id_a", "id_b", "cos_sim")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet
    assert(got.nonEmpty, "hot-cluster pairs must qualify")
    assert(got === brute, "sliced block join diverged from brute force")
  }
}
