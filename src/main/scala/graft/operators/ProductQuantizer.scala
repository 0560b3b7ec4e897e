package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.VectorExprs

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search") — the compression half of the canonical
  * IVF+PQ ANN stack: split each d-dim vector into m subvectors, learn a
  * small L2 codebook per subspace, store each vector as m byte-sized
  * codes (here m=8, k=16 → 8 codes ≈ 4 bytes per 64-dim vector, a 64×
  * compression over float32), and score queries with an Asymmetric
  * Distance Computation table: one k×m table of exact query-to-centroid
  * distances, then each candidate's approximate distance is m table
  * lookups — no float vector is ever touched at query time.
  *
  * Everything is Catalyst-native and deterministic:
  *  - subspace rows via ONE posexplode of sliced arrays;
  *  - seeding by smallest xxhash64(vec_id, seed) per subspace (no RNG);
  *  - Lloyd assignment = a pure-map argmin expression over the baked-in
  *    codebook literal (ties to the lowest code id — total order;
  *    functions.PqNearestCode), centroid update = component-wise
  *    decimal-exact mean (partition-order-independent, bit-identical
  *    run to run);
  *  - ADC sums go through DECIMAL(28,12), so the m-term additions are
  *    order-independent too.
  *
  * At 100 TB: codebooks train on a hash-sample and broadcast (k×m×sub
  * doubles — bytes); encoding is an embarrassingly parallel map; the
  * codes table is what the cluster stores and shuffles, at ~4 bytes a
  * vector instead of 256.
  */
object ProductQuantizer {

  /** (vec_id, [keep…,] sub, sv: array<double>) — vector split into m
    * contiguous subvectors. `dim` must be divisible by m. `keep` columns
    * ride along through the explode so downstream consumers (the IVF
    * cell id, r18) never need a vec_id re-attach join. */
  def subvectors(emb: DataFrame, m: Int, dim: Int,
                 keep: Seq[String] = Nil): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val w = dim / m
    emb.select(col("vec_id") +: keep.map(col) :+ posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(v, s * $w + 1, $w))"))
      .as(Seq("sub", "sv")): _*)
  }

  /** Squared L2 distance via three codegen'd dots. */
  private[operators] def dist2(a: org.apache.spark.sql.Column,
                               b: org.apache.spark.sql.Column) =
    VectorExprs.dot(a, a) - lit(2.0) * VectorExprs.dot(a, b) +
      VectorExprs.dot(b, b)

  /** Per-subspace L2 codebooks: (sub, code_id, cv: array<double>) after
    * `iters` Lloyd rounds from hash-sampled seeds. */
  def codebooks(subs: DataFrame, k: Int, iters: Int,
                seed: Int = 7): DataFrame = {
    val seedW = Window.partitionBy("sub")
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
    var cb = subs.withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= k)
      .select(col("sub"), col("rn").as("code_id"), col("sv").as("cv"))
    for (_ <- 1 to iters) {
      // per-subvector argmin as a PURE MAP (functions.PqNearestCode):
      // the in-training codebook is m·k rows — pulled to the driver per
      // round and scanned in a primitive loop per row, (d2 asc, code_id
      // asc) tie order preserved bit-for-bit. The join + row_number
      // form pushed N·m·kCodes rows through a window sort every round.
      val rows = graft.util.Local.modelRows(cb.select("sub", "code_id", "cv"))
      val assigned = subs.select(col("sub"),
          graft.functions.IvfProbe.pqNearestCode(col("sub"), col("sv"), rows)
            .as("code_id"),
          col("sv"))
      // codeword update as ONE decimal-exact vector-mean aggregate —
      // same rewrite as IvfKMeans's Lloyd round (one m·k-row exchange
      // where the posexplode form paid two and w rows per subvector;
      // bit-identical, DecimalVecMeanSpec)
      cb = assigned
        .groupBy("sub", "code_id")
        .agg(graft.functions.DecimalVecMean.mean(col("sv")).as("cv"))
    }
    // publish the trained codebooks as a LocalRelation (k×m rows): encode
    // and every ADC-table build then broadcast a driver-side copy instead
    // of replaying the Lloyd lineage per consumer
    graft.util.Local.model(cb)
  }

  /** (vec_id, sub, code_id) — each subvector's nearest codeword, as a
    * pure map (functions.PqNearestCode — same (d2 asc, code_id asc)
    * pick as the join + window form it replaces, bit for bit). */
  def encode(subs: DataFrame, cb: DataFrame,
             keep: Seq[String] = Nil): DataFrame = {
    val rows = graft.util.Local.modelRows(cb.select("sub", "code_id", "cv"))
    subs.select(col("vec_id") +: keep.map(col) :+ col("sub") :+
      graft.functions.IvfProbe.pqNearestCode(col("sub"), col("sv"), rows)
        .as("code_id"): _*)
  }

  /** ADC top-`n`: query subvectors → k×m distance table → each encoded
    * vector scored by m table lookups, decimal-exact sum, ties to the
    * lowest vec_id. Returns (vec_id, approx_d2). */
  def adcTopK(codes: DataFrame, cb: DataFrame, qsubs: DataFrame,
              n: Int): DataFrame = {
    val dtab = qsubs.select(col("sub"), col("sv").as("qv"))
      .join(broadcast(cb), Seq("sub"))
      .select(col("sub"), col("code_id"),
              dist2(col("qv"), col("cv")).as("d"))
    codes.join(broadcast(dtab), Seq("sub", "code_id"))
      .groupBy("vec_id")
      .agg(round(sum(col("d").cast(DecimalType(28, 12))).cast("double"), 6)
        .as("approx_d2"))
      .orderBy(col("approx_d2").asc, col("vec_id").asc)
      .limit(n)
  }

  /** The composed IVF+PQ index (FAISS IVFPQ shape): coarse cells from
    * `cents` = (cent_id, cv, cnrm), PQ codebooks trained on RESIDUALS
    * (v − coarse centroid — residuals concentrate near 0, so the same
    * k codewords quantize them far better than raw vectors), and a
    * per-probed-cell ADC table (the query residual differs per cell).
    * Only the `nprobe` probed cells' members are scored — the IVF
    * pruning — and each is scored by m table lookups on its 8-byte
    * code row. Returns (vec_id, approx_d2) top-`n`.
    *
    * At 100 TB: the corpus artifact is (cell, codes) — cell id is the
    * partition key, codes are ~8 bytes/vector; a query broadcasts
    * nprobe k×m tables and reads only the probed cells' partitions. */
  def ivfpqTopK(emb: DataFrame, cents: DataFrame, m: Int, dim: Int,
                kCodes: Int, nprobe: Int, queryId: Long,
                n: Int): DataFrame = {
    // cell assignment: max-cosine (≡ min-L2 for unit vectors) coarse
    // cell, as a pure-map top-1 probe (functions.IvfCellProbes) — the
    // crossJoin + window form sorted N·k rows per call
    val assigned = emb
      .select(col("vec_id"),
        explode(graft.functions.IvfProbe.cellProbes(
          col("v"), col("nrm"),
          graft.util.Local.modelRows(cents.select("cent_id", "cv", "cnrm")),
          nprobe = 1)).as("p"))
      .select(col("vec_id"), col("p.cell").as("cell"), col("p.rv").as("rv"))
    // residual subvectors with the cell id CARRIED THROUGH the explode
    // (r18): the old form checkpointed `assigned`, then shuffle-joined
    // the m·N subvector rows back onto it just to recover `cell` — one
    // whole exchange of the widest frame in the query for a column the
    // explode can keep for free (guide §2.4). One checkpoint remains:
    // `subs` feeds the codebook trainer's per-round collects AND the
    // encode below.
    val subs = subvectors(
        assigned.select(col("vec_id"), col("cell"), col("rv").as("v")),
        m, dim, keep = Seq("cell"))
      .localCheckpoint(true)
    val cb = codebooks(
      subs.filter(pmod(xxhash64(col("vec_id"), lit(99)), lit(4L)) === 0L),
      kCodes, iters = 2)
    // probe cells + per-cell query-residual ADC tables
    val q = emb.filter(col("vec_id") === queryId)
    val probed = q.crossJoin(broadcast(cents))
      .withColumn("sim",
        VectorExprs.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cent_id").asc)))
      .filter(col("rk") <= nprobe)
      .select(col("cent_id").as("cell"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("qrv"))
    // encode ONLY the probed cells' members: per-vector codes are
    // independent and the ADC join drops every other cell anyway, so the
    // cell prefilter is result-neutral and runs the encode window on
    // ~nprobe/k of the corpus (a prebuilt index encodes all cells once
    // offline; a one-shot query need not). Codebooks still train on the
    // all-cell sample above — the published artifact is corpus-wide.
    val codes = encode(
      subs.join(broadcast(probed.select("cell")), Seq("cell"))
        .filter(col("vec_id") =!= queryId), cb, keep = Seq("cell"))
    val qsubs = probed.select(col("cell"), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice(qrv, s * ${dim / m} + 1, ${dim / m}))"))
      .as(Seq("sub", "qv")))
    val dtab = qsubs.join(broadcast(cb), Seq("sub"))
      .select(col("cell"), col("sub"), col("code_id"),
              dist2(col("qv"), col("cv")).as("d"))
    codes.join(broadcast(dtab), Seq("cell", "sub", "code_id"))
      .groupBy("vec_id")
      .agg(round(sum(col("d").cast(DecimalType(28, 12))).cast("double"), 6)
        .as("approx_d2"))
      .orderBy(col("approx_d2").asc, col("vec_id").asc)
      .limit(n)
  }
}
