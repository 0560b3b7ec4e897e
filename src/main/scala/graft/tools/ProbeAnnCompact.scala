package graft.tools


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies what AnnIndex.compact buys: probe latency against the
  * SAME code rows stored as (a) 40 accumulated ingest `batch=`
  * partition sets (what s_knn_index_ingest leaves behind) vs (b) the
  * compacted one-file-per-cell layout — plus the file counts, so the
  * small-file-trap claim is a measured number, not narrative (the
  * DedupIndex stream-bench discipline, round 14).
  *
  * Usage: runMain graft.ProbeAnnCompact [nVecs] [nBatches] [nQueries]
  */
object ProbeAnnCompact {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(40)
    val nQueries = args.lift(2).map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the BenchStream deterministic clustered-vector corpus formula
    val vecs = (0 until nVecs).map { k =>
      (k.toLong, (0 until 64).map { dd =>
        ((k % 20) * 37 + dd * 17) % 101 / 50.0 - 1.0 +
          ((k.toLong * 7919 + dd * 104729) % 997 - 498) / 4000.0
      })
    }.toDF("vec_id", "v")
    val nrm = graft.functions.VectorExprs.norm(col("v"))
    val e = vecs.select(col("vec_id"),
      transform(col("v"), x => x / nrm).as("v")).localCheckpoint(true)

    val root = s"${System.getProperty("java.io.tmpdir")}/graft_probe_anncpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val base = e.filter(col("vec_id") % 3 =!= 0)
    graft.operators.AnnIndex.build(base, root)
    val rest = e.filter(col("vec_id") % 3 === 0)
    for (b <- 1 to nBatches)
      graft.operators.AnnIndex.append(
        rest.filter(pmod(col("vec_id"), lit(3L * nBatches)) === 3L * (b - 1)),
        root, batchId = b.toLong)

    def files(): Int = {
      def walk(f: java.io.File): Int =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1 else 0
      walk(new java.io.File(s"$root/codes"))
    }
    def probeSec(): Double = {
      val qvs = (0 until nQueries).map { i =>
        e.filter(col("vec_id") === i * 37L).select("v")
          .first().getSeq[Double](0)
      }
      // warm-up pass (footer caches, codegen), then the timed pass
      qvs.foreach(q => graft.operators.AnnIndex
        .query(spark, root, q, nprobe = 3, n = 10).count())
      val t0 = System.nanoTime()
      qvs.foreach(q => graft.operators.AnnIndex
        .query(spark, root, q, nprobe = 3, n = 10).count())
      (System.nanoTime() - t0) / 1e9 / nQueries
    }

    val filesBefore = files(); val secBefore = probeSec()
    graft.operators.AnnIndex.compact(spark, root)
    val filesAfter = files(); val secAfter = probeSec()
    println(f"[probe-anncpt] vecs=$nVecs batches=$nBatches " +
      f"files $filesBefore -> $filesAfter, probe " +
      f"${secBefore * 1000}%.0f ms -> ${secAfter * 1000}%.0f ms " +
      f"(${secBefore / secAfter}%.1fx)")
    spark.stop()
  }
}
