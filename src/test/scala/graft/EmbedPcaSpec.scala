package graft

import breeze.linalg.{eigSym, DenseMatrix, DenseVector}
import org.apache.spark.sql.functions._

/** PCA whitening contract (operators/EmbedPca.scala): the distributed
  * Gram-fold + driver eigen must match an in-memory breeze replay, and
  * the whitened output must satisfy the invariants that DEFINE
  * whitening — per-component mean ≈ 0, variance ≈ 1, cross-correlation
  * ≈ 0 — independent of any replay. */
class EmbedPcaSpec extends SparkSpec {

  private val dim = 64
  private val k = 16

  private lazy val raw: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  // Output is k scalar columns z0..z{k-1} (flattened for hash-stable
  // sinks) — reassemble per-row arrays for the replay compare.
  private lazy val got: Map[Long, Array[Double]] =
    SparkEntry.queries("q_embed_pca")(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        Array.tabulate(k)(c => r.getDouble(r.fieldIndex(s"z$c")))).toMap

  test("q_embed_pca ≡ in-memory breeze replay (4-dp outputs, 2e-3 tol)") {
    val n = raw.length.toDouble
    val mean = new Array[Double](dim)
    raw.foreach { case (_, v) => var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
    (0 until dim).foreach(i => mean(i) /= n)
    val cov = DenseMatrix.zeros[Double](dim, dim)
    raw.foreach { case (_, v) =>
      for (i <- 0 until dim; j <- 0 until dim)
        cov(i, j) += (v(i) - mean(i)) * (v(j) - mean(j))
    }
    cov :/= (n - 1.0)
    val es = eigSym(cov)
    val order = (0 until dim).sortBy(i => -es.eigenvalues(i)).take(k)
    val comps = order.map { idx =>
      val v = es.eigenvectors(::, idx).toArray
      val m = v.indices.maxBy(i => math.abs(v(i)))
      (v.map(_ * (if (v(m) < 0) -1.0 else 1.0)),
        math.sqrt(math.max(es.eigenvalues(idx), 1e-12)))
    }
    raw.foreach { case (id, v) =>
      val z = got(id)
      assert(z.length == k)
      comps.zipWithIndex.foreach { case ((c, sd), ci) =>
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += c(i) * (v(i) - mean(i)); i += 1 }
        assert(math.abs(z(ci) - dot / sd) < 2e-3,
          s"vec $id comp $ci: spark ${z(ci)} vs replay ${dot / sd}")
      }
    }
  }

  test("whitened output: zero mean, unit variance, decorrelated") {
    val zs = got.values.toArray
    val n = zs.length.toDouble
    for (c <- 0 until k) {
      val col = zs.map(_(c))
      val m = col.sum / n
      val v = col.map(x => (x - m) * (x - m)).sum / (n - 1)
      assert(math.abs(m) < 0.05, s"component $c mean $m")
      assert(math.abs(v - 1.0) < 0.05, s"component $c variance $v")
    }
    for (a <- 0 until 4; b <- a + 1 until 4) {
      val ca = zs.map(_(a)); val cb = zs.map(_(b))
      val ma = ca.sum / n; val mb = cb.sum / n
      val cab = ca.zip(cb).map { case (x, y) => (x - ma) * (y - mb) }.sum / (n - 1)
      assert(math.abs(cab) < 0.05, s"components $a,$b covariance $cab")
    }
  }
}
