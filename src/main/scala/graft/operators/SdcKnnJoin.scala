package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Approximate ALL-PAIRS kNN join via IVF cells + PQ SYMMETRIC distance
  * (SDC, Jégou et al. 2011 §IV-A) — the sub-quadratic sibling of
  * VectorSimJoin.knnJoin, and the shape batch retrieval takes at 100 TB
  * where exact Ω(N²) scoring is off the table.
  *
  * Exact kNN join must score every within-block pair of FLOAT VECTORS
  * (dim multiplies per pair). Here every vector is PQ-encoded once to m
  * codes (O(N·kCodes) one-time work), and a pair is scored by m array
  * LOOKUPS into the precomputed inter-codeword distance table
  * d(sub, ca, cb) = ‖cv[sub][ca] − cv[sub][cb]‖² — m·kCodes² doubles, a
  * model-sized artifact baked into the scoring expression as a literal
  * (util.Local.modelRows), so scoring needs NO per-sub join, NO explode,
  * and NO exchange beyond the single cell equi-join. Per-pair cost drops
  * dim→m (64→16 here, and the lookups are adds, not multiplies). BOTH
  * sides are quantized (SDC error ≈ 2× ADC's), so the default codebook
  * is finer than the ADC surfaces' (kCodes 32 vs 16) — measured on the
  * clustered spec corpus, 16 codewords rank at 0.74 recall@3 against a
  * 1.00 candidate ceiling; 32 clears the 0.8 gate at 0.81.
  *
  * Candidates are same-cell pairs (residual codes are only comparable
  * against the same coarse centroid, the IVF invariant), with MULTIPLE
  * ASSIGNMENT (Jégou et al.'s multi-probe for symmetric search): each
  * vector is encoded in its `nprobe` nearest cells, so a natural
  * cluster split across a cell boundary still meets itself in the
  * second assignment — pair and encode work scale ×nprobe, the
  * standard recall/cost dial. A pair found in several shared cells
  * keeps ONE canonical estimate chosen by assignment priority (see the
  * dedup aggregate below — a noisy secondary estimate never displaces
  * a primary one), then
  * ranking reuses the TopKByScore partial-reduce (shuffle ≤ k rows per
  * group per map task — the q_knn_join discipline; needs the
  * ObjectHashAggregate headroom conf). The spec pins recall ≥ 0.8 on
  * clustered data against computed brute-force truth. Training follows
  * the deterministic-sample discipline: coarse centroids from the
  * caller (half-sample), codebooks on residuals from the
  * quarter-sample — constant model cost as the corpus grows.
  */
object SdcKnnJoin {

  /** Multiple assignment: each vector carries a residual PER probed
    * cell — (vec_id, cell, primary, other_cell, rv), localCheckpointed
    * (consumed by both the encode and, in the training form, codebook
    * fitting). Executed as a PURE MAP (functions.IvfCellProbes): the
    * model-sized centroid table bakes into the expression and one eval
    * scans all cells in a primitive loop. The crossJoin + row_number
    * form this replaces shuffled and sorted N·cells join rows (90M at
    * the 100× tier) just to pick top-nprobe — the machinery that made
    * the ANN join lose to its exact twin on wall-clock (round-11
    * verdict); outputs are bit-identical (same left-to-right sims, same
    * (sim desc, cent_id asc) tie order — SdcKnnJoinSpec's block ≡
    * general and index ≡ training pins re-prove it).
    * Guards the cell-id headroom invariant: cell ids must stay below
    * 1024 (callers may hand in any centroid table; generalScore's
    * packed priority and the block scorer's canonicality math assume
    * it), checked against the model-sized `cents` rows. */
  private[graft] def multiAssign(emb: DataFrame, cents: DataFrame,
                          nprobe: Int): DataFrame = {
    val centRows = graft.util.Local
      .modelRows(cents.select("cent_id", "cv", "cnrm"))
    val maxCell = if (centRows.isEmpty) -1 else centRows.map(_.getInt(0)).max
    require(maxCell < 1024,
      s"cell ids must be < 1024 for the packed copy key (got $maxCell)")
    val probes = graft.functions.IvfProbe
      .cellProbes(col("v"), col("nrm"), centRows, nprobe)
    emb.select(col("vec_id"), explode(probes).as("p"))
      .select(col("vec_id"), col("p.cell").as("cell"),
        col("p.primary").as("primary"), col("p.other_cell").as("other_cell"),
        col("p.rv").as("rv"))
      .localCheckpoint(true)
  }

  /** Top-`k` approximate neighbors of EVERY vector, TRAINING the PQ
    * codebooks in flight (spec/exploration form — deployments should
    * train once and call [[joinWithModels]] with stored artifacts).
    * `emb` = (vec_id, v: L2-normalized array<double>, nrm); `cents` =
    * (cent_id, cv, cnrm). Returns (vec_id, nbr_id, approx_d2) with
    * approx_d2 rounded to 6 dp, squared L2 between residual
    * reconstructions (monotone with cosine within a cell). */
  def join(emb: DataFrame, cents: DataFrame, m: Int = 16, dim: Int = 64,
           kCodes: Int = 32, k: Int = 3, nprobe: Int = 2): DataFrame = {
    val assigned = multiAssign(emb, cents, nprobe)
    // codebooks train on PRIMARY-cell residuals only (the canonical
    // distribution), from the deterministic quarter-sample — the exact
    // training path AnnIndex.build persists, so index-backed calls
    // produce bit-identical rankings
    val cb = ProductQuantizer.codebooks(
      ProductQuantizer.subvectors(
        assigned.filter(col("primary"))
          .filter(pmod(xxhash64(col("vec_id"), lit(99)), lit(4L)) === 0L)
          .select(col("vec_id"), col("rv").as("v")), m, dim),
      kCodes, iters = 2)
    score(assigned, cb, m, dim, kCodes, k, nprobe)
  }

  /** [[join]] with PRE-TRAINED models — the deployment form: coarse
    * centroids and PQ codebooks come from a stored index (e.g.
    * [[AnnIndex]] artifacts), so a call does assignment + encode +
    * scoring only, never k-means. At 100 TB the models are index-build
    * outputs; retraining them per query would dominate the query. */
  def joinWithModels(emb: DataFrame, cents: DataFrame, cb: DataFrame,
                     m: Int = 16, dim: Int = 64, kCodes: Int = 32,
                     k: Int = 3, nprobe: Int = 2): DataFrame =
    score(multiAssign(emb, cents, nprobe), cb, m, dim, kCodes, k, nprobe)

  /** Encode every (vector, probed cell) copy with `cb`, build the SDC
    * lookup literal, score same-cell pairs, partial-reduce top-`k`.
    * Dispatch: at nprobe ≤ 2 the BLOCK path (functions.BlockSdcTopK —
    * whole coded slices scored in primitive loops, canonicality decided
    * locally via each copy's other probed cell); at nprobe > 2 a pair
    * can meet in 3+ cells and canonicality needs the cross-cell
    * aggregate, so the general pair-row path runs. The two paths are
    * spec-pinned identical at nprobe = 2 (SdcKnnJoinSpec). */
  private def score(assigned: DataFrame, cb: DataFrame, m: Int, dim: Int,
                    kCodes: Int, k: Int, nprobe: Int): DataFrame = {
    // materialized once: both scoring paths read the coded copies twice
    // (block counts + block build, or the a/b pair sides), and the
    // coded frame is tiny (ids + m ints per copy)
    val packed = packedOf(assigned, cb, m, dim).localCheckpoint(true)
    val flat = sdcTable(cb, m, kCodes)
    if (nprobe <= 2) blockScore(packed, flat, kCodes, k)
    else generalScore(packed, flat, kCodes, k)
  }

  /** One packed code array per (vector, probed cell) copy —
    * (vec_id, cell, primary, other_cell, codes). Executed as a PURE MAP
    * (functions.PqEncodeCodes): the model-sized codebook bakes into the
    * expression, one eval emits the m-code array with the exact
    * (d2 asc, code_id asc) argmin of ProductQuantizer.encode. The
    * explode→join→window→groupBy form this replaces shuffled m·kCodes
    * rows per copy and needed a (vec_id, cell, other_cell, primary)
    * long-packing scheme (with its 2^41 id headroom trap) just to carry
    * the copy key through the re-assembly — with a map there is no
    * re-assembly and no packed key at all. */
  private[graft] def packedOf(assigned: DataFrame, cb: DataFrame, m: Int,
                       dim: Int): DataFrame = {
    val cbRows = graft.util.Local
      .modelRows(cb.select("sub", "code_id", "cv"))
    // kCodes from the max surviving code id — per-sub counts vary
    // (Lloyd rounds can empty a cluster), so length/m under-counts
    val kCodes = if (cbRows.isEmpty) 0 else cbRows.map(_.getInt(1)).max
    assigned.select(col("vec_id"), col("cell"), col("primary"),
      col("other_cell"),
      graft.functions.IvfProbe
        .pqEncode(col("rv"), cbRows, m, kCodes, dim).as("codes"))
  }

  /** The SDC model: flat [sub][code_a][code_b] distance array published
    * as an expression literal (m·kCodes² doubles — model-sized). */
  private[graft] def sdcTable(cb: DataFrame, m: Int, kCodes: Int): Array[Double] = {
    val kk = kCodes * kCodes
    val flat = new Array[Double](m * kk)
    graft.util.Local.modelRows(
      cb.select(col("sub"), col("code_id").as("ca"), col("cv").as("va"))
        .join(cb.select(col("sub"), col("code_id").as("cb_id"),
          col("cv").as("vb")), Seq("sub"))
        .select(col("sub"), col("ca"), col("cb_id"),
          ProductQuantizer.dist2(col("va"), col("vb")).as("d")))
      .foreach { r =>
        flat(r.getInt(0) * kk + (r.getInt(1) - 1) * kCodes +
          (r.getInt(2) - 1)) = r.getDouble(3)
      }
    flat
  }

  /** BLOCK path (nprobe ≤ 2): cells packed into ≤ MaxBlockRows coded
    * slices, every ordered slice pair of a cell scored inside
    * functions.BlockSdcTopK — m lookups per pair in a primitive loop,
    * canonical multi-probe duplicates skipped locally, ≤ |slice|·k
    * emitted rows per eval. The join-row form streamed ~N²/cells pair
    * rows through a hash join and a nearly-no-reduction cross-cell
    * aggregate; this path's exchanges carry only block rows and top-k
    * partials (measured 7.8 → see BENCH_10x at the 10× tier). */
  private[graft] def blockScore(packed: DataFrame, flat: Array[Double],
                                kCodes: Int, k: Int): DataFrame = {
    val s = packed.sparkSession
    val cnts = packed.groupBy("cell").agg(count(lit(1)).as("n"))
      .select(col("cell"),
        ceil(col("n").cast("double") / 2048.0).cast("long").as("ns"))
    // hot IVF cells slice like VectorSimJoin.packedBlocks — the largest
    // eval is bounded by construction whatever the cell distribution
    val blocks = packed.join(broadcast(cnts), Seq("cell"))
      .withColumn("slice", pmod(xxhash64(col("vec_id")), col("ns")))
      .groupBy("cell", "slice")
      .agg(collect_list(struct(col("vec_id"), col("codes"),
        col("primary"), col("other_cell"))).as("blk"))
      .localCheckpoint(true)
    val slicePairs = blocks.select(col("cell"), col("slice").as("slice_a"))
      .join(blocks.select(col("cell"), col("slice").as("slice_b")),
        Seq("cell"))
      .repartition(s.sessionState.conf.numShufflePartitions,
        col("cell"), col("slice_a"), col("slice_b"))
    val a = blocks.select(col("cell"), col("slice").as("slice_a"),
      col("blk").as("blk_a"))
    val b = blocks.select(col("cell"), col("slice").as("slice_b"),
      col("blk").as("blk_b"))
    slicePairs.join(a, Seq("cell", "slice_a")).join(b, Seq("cell", "slice_b"))
      .select(explode(graft.functions.BlockSdc.topkPerSlicePair(
        col("blk_a"), col("blk_b"), col("cell").cast("long"),
        flat, kCodes, k)).as("p"))
      .select("p.*")
      .groupBy("vec_id")
      .agg(graft.functions.TopKByScore
        .topk(-col("approx_d2"), col("nbr_id"), k).as("top"))
      .select(col("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.id").as("nbr_id"),
        (-col("t.score")).as("approx_d2"))
  }

  /** GENERAL path (any nprobe): canonical same-cell pairs scored by m
    * lookups inside the pair row. */
  private[graft] def generalScore(packed: DataFrame, flat: Array[Double],
                                  kCodes: Int, k: Int): DataFrame = {
    val a = packed.select(col("cell"), col("vec_id").as("id_a"),
      col("codes").as("codes_a"), col("primary").as("pa"))
    val b = packed.select(col("cell"), col("vec_id").as("id_b"),
      col("codes").as("codes_b"), col("primary").as("pb"))
    // the m-term lookup sum is a custom codegen'd expression
    // (functions.SdcLookupSum): one primitive double[] reference and a
    // fused loop. The previous 16-unrolled element_at-into-typedLit form
    // shipped a boxed copy of the 16384-double literal PER occurrence —
    // 13.7 MiB task binaries deserialized per task made the scoring
    // stage cost 6.5 s warm at sf0.1 for ~3M adds of real work.
    val score = VectorExprs.sdcSum(col("codes_a"), col("codes_b"),
      flat, kCodes)
    // a multi-assigned pair can meet in up to nprobe shared cells with
    // estimates of very different quality (secondary residuals sit far
    // from their centroid, where the primary-trained quantizer is
    // coarse). Keep ONE canonical estimate per pair: highest assignment
    // priority (both-primary > one-primary > none) first, then lowest
    // cell id — a deterministic pick that never lets a noisy secondary
    // estimate displace a primary one. The pick is min_by over a PACKED
    // PRIMITIVE priority (np·2048 + cell — injective and
    // order-preserving since cell < 1024, so ≡ the lexicographic
    // (np, cell) struct min it replaces): a primitive two-field buffer
    // keeps the agg in codegen'd HashAggregate, where the struct-MIN
    // form forced ObjectHashAggregate over ~N²/cells nearly-unique pair
    // groups — together with the per-pair BigDecimal inside Catalyst's
    // round (→ functions.FastRound), the actual cost of this stage
    // (measured 4.5 → 1.5 s at the 10× tier, identical output).
    val scored = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("prio",
        (lit(2) - col("pa").cast("long") - col("pb").cast("long"))
          * lit(2048L) + col("cell").cast("long"))
      .groupBy("id_a", "id_b")
      .agg(min_by(score.as("d"), col("prio")).as("d"))
      .select(col("id_a"), col("id_b"),
        graft.functions.FastRound.round(col("d"), 6).as("approx_d2"))
    // both orientations from one scored pass, then partial-reduce top-k
    scored.select(explode(array(
        struct(col("id_a").as("vec_id"), col("id_b").as("nbr_id"),
          col("approx_d2")),
        struct(col("id_b").as("vec_id"), col("id_a").as("nbr_id"),
          col("approx_d2")))).as("p"))
      .select("p.*")
      .groupBy("vec_id")
      .agg(graft.functions.TopKByScore
        .topk(-col("approx_d2"), col("nbr_id"), k).as("top"))
      .select(col("vec_id"), explode(col("top")).as("t"))
      .select(col("vec_id"), col("t.id").as("nbr_id"),
        (-col("t.score")).as("approx_d2"))
  }
}
