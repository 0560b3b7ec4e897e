package graft

import org.apache.spark.sql.functions._

/** Two-stage retrieval + clustering contracts.
  *
  * q_knn_rerank: within the candidate pool the ranking must be EXACT
  * (that is the whole point of re-ranking — PQ error affects only which
  * candidates are nominated), and end-to-end recall@10 vs brute force
  * must clear the same 0.8 gate the ADC-only surfaces carry — with the
  * re-rank never BELOW the ADC-only ordering's recall.
  *
  * q_cluster_kmeans: each vector's reported cluster is the argmax-cosine
  * centroid of the published deterministic model (replayed in Scala),
  * and more Lloyd rounds cannot worsen the spherical objective.
  */
class RerankSpec extends SparkSpec {

  private def normalized: Array[(Long, Array[Double])] =
    spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        (r.getLong(0), v.map(_ / n))
      }

  test("q_knn_rerank: exact order within pool; recall@10 >= 0.8 and >= ADC") {
    val vecs = normalized.toMap
    val q = vecs(0L)
    def cos(a: Array[Double]) = a.zip(q).map { case (x, y) => x * y }.sum
    val truth = normalized.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet

    val got = SparkEntry.queries("q_knn_rerank")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // exact order within the pool: rounded cosine desc, id asc, and the
    // reported cosines are the true cosines (re-rank is exact)
    got.foreach { case (id, c) =>
      assert(math.abs(c - cos(vecs(id))) < 1e-6, s"vec $id: stale cosine")
    }
    assert(got.sortBy { case (id, c) => (-c, id) }.toSeq == got.toSeq,
      "pool ranking not exact-ordered")
    val recall = got.map(_._1).count(truth) / 10.0
    assert(recall >= 0.8, s"re-rank recall@10 $recall < 0.8")

    val adc = SparkEntry.queries("q_knn_index_query")(spark, sf0001)
      .collect().map(_.getLong(0))
    val adcRecall = adc.count(truth) / 10.0
    assert(recall >= adcRecall,
      s"re-rank recall $recall below ADC-only $adcRecall")
  }

  test("q_cluster_kmeans: assignment is argmax-cosine over the published model") {
    val cents = graft.operators.IvfKMeans.centroids(
      graft.queries.LlmOps.embDouble(
        spark.read.parquet(s"$sf0001/embeddings.parquet")), k = 8, iters = 5)
      .collect().map { r =>
        val cv = r.getSeq[Double](1).toArray
        (r.getInt(0), cv, math.sqrt(cv.map(x => x * x).sum))
      }
    val got = SparkEntry.queries("q_cluster_kmeans")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(got.size == vecs.size, "not every vector was assigned")
    got.foreach { case (id, cluster, cohesion) =>
      val v = vecs(id)
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val sims = cents.map { case (cid, cv, cnrm) =>
        (cid, v.zip(cv).map { case (x, y) => x * y }.sum / (nrm * cnrm))
      }
      val best = sims.minBy { case (cid, s) => (-s, cid) }
      assert(best._1.toLong == cluster, s"vec $id: cluster $cluster != argmax ${best._1}")
      assert(math.abs(cohesion - best._2) < 1e-4, s"vec $id: cohesion off")
    }
    assert(got.map(_._2).distinct.size >= 2, "degenerate clustering")
  }

  test("q_cluster_assign ≡ q_cluster_kmeans (stored model, identical output)") {
    val live = SparkEntry.queries("q_cluster_kmeans")(spark, sf0001)
      .collect().map(_.toString).toSeq
    val atRest = SparkEntry.queries("q_cluster_assign")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(atRest == live,
      "assignment from the stored centroid table diverges from in-flight training")
    // second call must answer WITHOUT retraining (artifact already there)
    val again = SparkEntry.queries("q_cluster_assign")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(again == live)
  }

  test("q_cluster_kmeans: Lloyd objective is monotone in iterations") {
    val emb = graft.queries.LlmOps.embDouble(
      spark.read.parquet(s"$sf0001/embeddings.parquet"))
    def objective(iters: Int): Double = {
      val cents = graft.operators.IvfKMeans.centroids(emb, k = 8, iters)
      emb.crossJoin(broadcast(cents))
        .withColumn("sim", graft.functions.VectorExprs.dot(col("v"), col("cv"))
          / (col("nrm") * col("cnrm")))
        .groupBy("vec_id").agg(max("sim").as("best"))
        .agg(sum("best")).collect()(0).getDouble(0)
    }
    assert(objective(5) >= objective(1) - 1e-6,
      "more Lloyd rounds worsened the spherical k-means objective")
  }
}
