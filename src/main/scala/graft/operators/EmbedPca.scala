package graft.operators

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs
import graft.util.Local

/** PCA whitening over an embedding column — the "embedding hygiene"
  * stage of a retrieval/dedup pipeline (whitening is the standard
  * pre-step before product quantization and cosine indexing: it
  * decorrelates dimensions so PQ subspaces carry equal information).
  *
  * 100-TB shape: the corpus-sized work is ONE map-side-combinable
  * aggregate producing a MODEL-SIZED frame — the d-vector of sums and
  * the d×d Gram matrix as (i, j, Σ xᵢxⱼ) cells (d²+d rows total,
  * d=64 → 4,160 cells regardless of corpus size; partial aggregation
  * collapses every task's slice before the exchange, so the shuffle
  * carries ≤ d² rows per task). The eigendecomposition runs on the
  * DRIVER over the 64×64 covariance (breeze `eigSym` — public Spark
  * ships breeze with MLlib), exactly the model-fold discipline of
  * DsirSelect/SdcKnnJoin: corpus → tiny model → literal → map-only
  * apply. Projection is k dot products per row against broadcast
  * component literals (codegen'd DotProduct), no shuffle.
  *
  * Determinism: `eigSym` is deterministic for a fixed matrix; the
  * remaining ambiguity (eigenvector sign) is pinned by forcing the
  * largest-|coordinate| entry of each component positive. Distributed
  * float sums re-associate under different partitionings — results are
  * replay-stable on a fixed plan+fixture (the PreflightSpec contract)
  * and the spec asserts the INVARIANTS (orthonormality, decreasing
  * variance, unit whitened variance) rather than golden floats.
  */
object EmbedPca {

  /** (vec_id, z0..z{k-1}: double) — embeddings projected onto the top-k
    * principal components and whitened (unit variance per component).
    * Components are emitted as k SCALAR columns, not one array column:
    * downstream hash/sort harnesses (and columnar sinks) handle scalars
    * uniformly — the same §7.6 flatten discipline as q_multimodal. */
  def whiten(s: SparkSession, emb: DataFrame, dim: Int, k: Int): DataFrame = {
    val rows = emb.select(col("vec_id"), col("v"))
    // ONE GramAgg fold: [n, per-dim sums, upper-triangle Σxxᵀ] in a flat
    // 2,145-double buffer — zero intermediate rows (the explode+groupBy
    // form it replaces churned d²/2 rows per input row; 2.8 s → see
    // GramAgg Scaladoc)
    val flat = Local.modelRows(
      rows.agg(graft.functions.GramAgg.gram(col("v"), dim).as("g")))
      .head.getSeq[Double](0).toArray
    val n = flat(0)
    require(n >= 2, s"PCA needs >= 2 vectors, got ${n.toLong}")
    val gram = DenseMatrix.zeros[Double](dim, dim)
    var t = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      gram(i, j) = flat(t); gram(j, i) = flat(t); t += 1
    }
    val mean = DenseVector(flat.slice(1, 1 + dim).map(_ / n))
    val cov = (gram - (mean * mean.t) * n) / (n - 1.0)
    val es = eigSym(cov) // ascending eigenvalues
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps: Seq[(Array[Double], Double)] = order.map { idx =>
      val v = es.eigenvectors(::, idx).toArray
      // sign pin: largest-|coordinate| entry positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      val sgn = if (v(m) < 0) -1.0 else 1.0
      (v.map(_ * sgn), math.max(es.eigenvalues(idx), 1e-12))
    }
    // z_c = (v·comp_c − mean·comp_c)/σ_c: the mean term is a per-component
    // SCALAR folded on the driver (same left-to-right dot the row side
    // runs), so the per-row work is k fused dot products — no per-row
    // mean-centering zip_with allocating a 64-element array per
    // component per row (HOF lambdas are not reliably CSE'd; the first
    // form paid that 16×)
    val meanArr = mean.toArray
    val zCols = comps.zipWithIndex.map { case ((vec, lam), c) =>
      var meanDot = 0.0
      var i = 0
      while (i < dim) { meanDot += meanArr(i) * vec(i); i += 1 }
      ((VectorExprs.dot(col("v"), typedLit(vec.toSeq)) - meanDot)
        / math.sqrt(lam)).as(s"z$c")
    }
    rows.select(col("vec_id") +: zCols: _*)
      .select(col("vec_id") +:
        comps.indices.map(c => round(col(s"z$c"), 4).as(s"z$c")): _*)
  }
}
