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

  test("skewed-cell corpus: AQE splits the hot cell partition (skew=true)") {
    import spark.implicits._
    // the 100-TB failure mode the cell join must survive: a clustered
    // corpus where ONE cell holds most of the corpus, so one shuffle
    // partition of the cell equi-join dwarfs the rest. AQE's skew-join
    // rewrite must split that partition (thresholds lowered to make the
    // small fixture exhibit what 100 TB exhibits at defaults).
    val dim = 8
    def h(i: Long, j: Int): Double =
      (((i * 2654435761L + j.toLong * 40503L + 7L) >>> 16) & 0xffffL)
        .toDouble / 65535.0
    val rows = (0L until 4000L).map { i =>
      val v =
        if (i % 5 != 0) // 80% of vectors in one tight cluster → one hot cell
          Array.tabulate(dim)(j =>
            (if (j == 0) 1.0 else 0.0) + 0.05 * (h(i, j) - 0.5))
        else            // 20% isotropic background
          Array.tabulate(dim)(j => 2.0 * (h(i, j) - 0.5))
      (i, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val confs = Map(
      // force shuffle joins (broadcast would sidestep the skew machinery)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale AQE's skew thresholds down to fixture size (shuffle sizes
      // are COMPRESSED bytes, so they run far below the in-memory size)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      // coalescing would re-merge the sub-advisory background partitions
      // and muddy the assertion — turn it off for the probe
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // k pinned at 16: the adaptive √N default (64 cells here) spreads
      // the hot cluster over many near-identical centroids and genuinely
      // removes the skew this test exists to provoke — a SMALL fixed cell
      // count is exactly the regime where one cell goes hot and AQE must
      // carry the split
      val out = VectorSimJoin.pairs(df, "vec_id", "embedding",
        threshold = 0.95, k = 16)
      // execute THIS DataFrame's plan (count() would plan its own query
      // and the skew decision would land there, not here), then read the
      // finalized adaptive plan
      assert(out.queryExecution.toRdd.count() > 0, "hot-cluster pairs must qualify")
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"plan did not finalize:\n${p.take(500)}")
      assert(p.contains("skew=true"),
        s"AQE did not split the hot cell partition:\n${p.take(3000)}")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
