package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** EXACT cosine-threshold similarity self-join over dense vectors, with
  * candidate generation via centroid cells and a sound angular
  * triangle-inequality bound — the distributed replacement for the
  * broadcast all-pairs nested loop.
  *
  * Plan shape: assign every vector to its nearest of `k` centroids (one
  * broadcast + one map-side-combined shuffle), compute each cell's
  * angular radius, prune cell PAIRS with the bound
  * θ(ca,cb) − r_a − r_b > θ_threshold (no member pair of a pruned cell
  * pair can reach the threshold, by two applications of the spherical
  * triangle inequality), then join vectors through the surviving cell
  * pairs — a Catalyst-native shuffle EQUI-join on cell ids — and verify
  * every candidate with the exact codegen dot product. Output is
  * provably identical to the all-pairs form (the bound only ever prunes
  * pairs that cannot qualify), but the plan is shuffle-partitioned and
  * memory-bounded instead of broadcast-bounded: at 100 TB the cell id is
  * the partition key, k scales with corpus size, and AQE's skew handling
  * splits oversized cells.
  *
  * Pruning is data-adaptive: on clustered corpora (real embedding sets)
  * most of the k² cell pairs are pruned and per-pair work collapses to
  * overlapping-cluster blocks; on an isotropic corpus (this fixture's
  * Gaussian-tail pairs at τ=0.4) little can be pruned and the join
  * degrades gracefully to a distributed block-partitioned exact join —
  * still O(N²) compute, because NO exact sub-quadratic algorithm exists
  * for low-threshold dense cosine (at τ=0.4 a random hyperplane agrees
  * with probability 0.63 vs 0.50 for unrelated pairs, so recall-1 LSH
  * would need ~10⁵ hash tables or admit ~every pair as a candidate).
  * Sub-quadratic similarity at that threshold is *approximate* by
  * nature — see q_knn_lsh / q_knn_ivf — while THIS operator is the
  * honest exact form.
  *
  * Caller contract: vectors must have non-zero norm — a zero vector
  * yields NaN cosines, which Spark's ordering treats as LARGEST (they
  * would outrank real matches in knnJoin). Filter degenerate rows
  * upstream.
  */
object VectorSimJoin {

  /** acos with the argument clamped to [-1, 1] (FP noise in
    * dot/(|a||b|) can stray a few ULPs outside the domain). */
  private def ang(c: Column): Column =
    acos(least(lit(1.0), greatest(lit(-1.0), c)))

  /** Normalize the input to (id, v: array<double>, nrm). */
  private def prepare(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("v"), VectorExprs.norm(v).as("nrm"))
  }

  /** Deterministic coarse quantizer: the k lowest-id vectors. Centroid
    * QUALITY only affects pruning, never output correctness. */
  private def centroids(e: DataFrame, k: Int): DataFrame =
    e.orderBy("id").limit(k)
      .select(col("id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))

  /** Data-adaptive cell count: ~√N cells, clamped to [16, 512]. The
    * block join's parallelism is bounded by the number of DISTINCT cell
    * keys and its per-task buffers by cell size, so a FIXED k caps a
    * growing corpus at k-way parallelism with O(N/k)-row cells — at the
    * 10x replica tier (20k vectors) moving 16 → √N cells measured
    * knnJoin 49.2 → 20.5 s and the τ=0.4 pair join 22.4 → 10.7 s with
    * bit-identical output. √N keeps cell size AND cell count growing as
    * √N (balanced blocks); the 512 cap keeps the k² cell-pair frame
    * broadcastable and the N·k assignment cost ≪ the N²/2 pair work. */
  private def cellsFor(n: Long): Int =
    math.max(16, math.min(512, math.ceil(math.sqrt(n.toDouble)).toInt))

  private def adaptiveCells(e: DataFrame): Int = cellsFor(e.count())

  /** Broadcast the b-side block set when it fits comfortably in executor
    * memory — the DedupIndex.queryBatch adaptive-pick discipline. */
  private val MaxBroadcastBlockBytes = 256L << 20

  /** (id, v, nrm, cell, theta): nearest-centroid assignment. The
    * crossJoin is a k-row broadcast and the min_by groupBy
    * partial-aggregates map-side, so the shuffle carries N rows, not
    * N·k. */
  private[graft] def assignments(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("theta",
        ang(VectorExprs.dot(col("v"), col("cv")) / (col("nrm") * col("cn"))))
      .groupBy("id")
      .agg(min_by(col("cent_id"), col("theta")).as("cell"),
           min(col("theta")).as("theta"),
           first(col("v")).as("v"), first(col("nrm")).as("nrm"))

  /** Surviving ordered cell pairs (cell_a, cell_b) under the angular
    * bound — ≤ k² rows, both orientations plus the diagonal (the
    * downstream id_a < id_b filter canonicalizes pairs, so each
    * candidate pair is produced exactly once). The slack terms keep the
    * bound sound under FP noise: they only ADMIT extra candidates. */
  private[graft] def survivingCellPairs(assign: DataFrame, cents: DataFrame,
                                        threshold: Double): DataFrame = {
    val radii = assign.groupBy("cell").agg(max(col("theta")).as("r"))
    val meta = radii.join(cents, col("cell") === col("cent_id"))
      .select(col("cell"), col("r"), col("cv"), col("cn"))
    // round(c,4) >= t admits c >= t - 5e-5; widen to t - 1e-3 for safety
    val thetaT = math.acos(math.max(-1.0, math.min(1.0, threshold - 1e-3)))
    val m1 = meta.select(col("cell").as("cell_a"), col("r").as("r_a"),
                         col("cv").as("cv_a"), col("cn").as("cn_a"))
    val m2 = meta.select(col("cell").as("cell_b"), col("r").as("r_b"),
                         col("cv").as("cv_b"), col("cn").as("cn_b"))
    m1.crossJoin(broadcast(m2))
      .filter(ang(VectorExprs.dot(col("cv_a"), col("cv_b")) /
                  (col("cn_a") * col("cn_b")))
                - col("r_a") - col("r_b") <= lit(thetaT + 1e-6))
      .select("cell_a", "cell_b")
  }

  /** All pairs (id_a < id_b) with round(cos, 4) ≥ threshold — exact.
    * `k` ≤ 0 (the default) picks the adaptive √N cell count. */
  def pairs(df: DataFrame, idCol: String, vecCol: String,
            threshold: Double, k: Int = -1): DataFrame = {
    val e = prepare(df, idCol, vecCol)
    val cents = centroids(e, if (k > 0) k else adaptiveCells(e))
    val assign = assignments(e, cents)
    val cellPairs = survivingCellPairs(assign, cents, threshold)
    val a = assign.select(col("id").as("id_a"), col("v").as("v_a"),
                          col("nrm").as("n_a"), col("cell").as("cell_a"))
    val b = assign.select(col("id").as("id_b"), col("v").as("v_b"),
                          col("nrm").as("n_b"), col("cell").as("cell_b"))
    // no broadcast hint on cellPairs: it is bounded by k² rows, which a
    // caller sizing k for a huge corpus can push past broadcast limits —
    // AQE broadcasts it when small (always, at the default k=16)
    a.join(cellPairs, Seq("cell_a"))
      .join(b, Seq("cell_b"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(
        VectorExprs.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 4))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** Exact k-nearest-neighbor JOIN: the top `k` neighbors of EVERY
    * vector by cosine (self excluded) — the batch shape a training
    * pipeline runs corpus-wide, vs the single-query probe of knnCosine.
    * Candidates flow through the same cell equi-join as [[pairs]] but
    * with NO cell-pair pruning: exact top-k has no similarity floor, so
    * every block pair must be scored (exact kNN join is Ω(N²) compute —
    * the cell structure provides the memory-bounded distributed
    * block-join shape, and the ANN surfaces are the sub-quadratic
    * alternative). Ranking totalized by (rounded cosine desc, id asc). */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
              k: Int, cells: Int = -1): DataFrame = {
    // BLOCK product, not pair rows: pack each cell into ONE row and
    // score whole cell pairs inside functions.BlockTopK's primitive
    // loop. The old form streamed one JOIN ROW per candidate pair — N²
    // rows of hash-probe + UnsafeRow + aggregate-update machinery around
    // a 64-multiply kernel (72 s at the 10× tier, machinery-bound). Now
    // the join streams cells² block rows (≤ 512² by the adaptiveCells
    // cap), each eval runs |A|·|B| fused dots on primitive arrays, and
    // only ≤ |A|·k result structs per block pair reach the exchange —
    // operator-row volume drops from N² to N·cells·k while the
    // arithmetic (left-to-right dot, nrm division, HALF_UP 4-dp round)
    // stays bit-identical (VectorSimJoinSpec pins new ≡ old).
    // At 100 TB: the block frames shuffle-join on cell id (AQE
    // broadcasts the cells-sized pair list), per-task memory is two
    // √N-sized blocks, and the final merge is the same bounded
    // TopKByScore partial reduce — the exchange never scales with N².
    // NOTE: needs spark.sql.objectHashAggregate.sortBased
    // .fallbackThreshold above the per-partition group count (builders
    // set 500000) or ObjectHashAggregate silently falls back to sort.
    val s = df.sparkSession
    val e = prepare(df, idCol, vecCol)
    val n = e.count()
    val cents = centroids(e, if (cells > 0) cells else cellsFor(n))
    val assign = assignments(e, cents)
    // collect_list order is partition-dependent — harmless: BlockTopK
    // selects under the (score desc, id asc) TOTAL order, so block
    // content order never reaches the output. localCheckpoint: the
    // blocks frame is cells-sized (√N rows) and feeds THREE consumers
    // below — materialize once instead of recomputing the assignment
    // pipeline per consumer.
    val blocks = assign.groupBy("cell")
      .agg(collect_list(struct(col("id"), col("v"), col("nrm"))).as("blk"))
      .localCheckpoint(true)
    // cell ids are model-sized (≤ 512 longs) — the util.Local collect
    // discipline, same as AnnIndex's probed-cell list
    val cellIds = graft.util.Local.model(blocks.select("cell"))
      .collect().map(_.getLong(0)).sorted
    // Fan each a-block out to every partner cell WITHOUT a join: the
    // pair frame is byte-tiny but carries ALL the compute, and left to
    // AQE it coalesces into one partition (measured: the 10× tier
    // serialized at 57 s; as a shuffle join it instead sort-exchanged
    // 3 GB of block payloads twice). An EXPLICIT repartition of the
    // cells-sized block frame (exempt from AQE coalescing) spreads the
    // a-blocks, then exploding the literal cell list multiplies rows
    // in place — no exchange touches a block row after this point.
    val p = s.sessionState.conf.numShufflePartitions
    val aSide = blocks
      .repartition(p, col("cell"))
      .select(col("blk").as("blk_a"),
        explode(typedLit(cellIds.toSeq)).as("cell_b"))
    // b-blocks attach by equi-join on cell_b. Pick the join shape the
    // way DedupIndex.queryBatch does: when the whole block set is
    // executor-memory-sized (it is whenever exact kNN is sane to run —
    // this operator is the documented Ω(N²) reference; the ANN twin is
    // the 100-TB path), BROADCAST it so the probe is map-side; only a
    // corpus too big to broadcast falls back to the shuffle join, which
    // is then dwarfed by its own N² scoring anyway.
    val b = blocks.select(col("cell").as("cell_b"), col("blk").as("blk_b"))
    val dim = {
      val one = graft.util.Local.model(
        e.limit(1).select(size(col("v")).as("d"))).collect()
      if (one.isEmpty) 0L else one.head.getInt(0).toLong
    }
    // id + norm + array header ≈ 24 B/vector on top of 8 B per component
    val bBytes = (dim * 8L + 24L) * n
    val bJoined =
      if (bBytes <= MaxBroadcastBlockBytes) aSide.join(broadcast(b), Seq("cell_b"))
      else aSide.join(b, Seq("cell_b"))
    bJoined
      .select(explode(graft.functions.BlockKnn
        .topkPerBlockPair(col("blk_a"), col("blk_b"), k)).as("p"))
      .select("p.vec_id", "p.nbr_id", "p.cos_sim")
      .groupBy("vec_id")
      .agg(graft.functions.TopKByScore
        .topk(col("cos_sim"), col("nbr_id"), k).as("top"))
      .select(col("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.id").as("nbr_id"),
              col("t.score").as("cos_sim"))
  }

  /** Test/diagnostic hook: (surviving cell pairs, total possible k²). */
  private[graft] def pruningStats(df: DataFrame, idCol: String,
                                  vecCol: String, threshold: Double,
                                  k: Int): (Long, Long) = {
    val e = prepare(df, idCol, vecCol)
    val cents = centroids(e, k)
    val assign = assignments(e, cents)
    val nCells = assign.select("cell").distinct().count()
    (survivingCellPairs(assign, cents, threshold).count(), nCells * nCells)
  }
}
