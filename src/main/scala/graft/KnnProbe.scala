package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY diagnostic: stage breakdown of the exact kNN join at a
  * given tier — scored-pairs only vs +explode vs full topk — to locate
  * where the 10x-tier wall time goes. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val k = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.sources.Tables.embeddings(spark, d)
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[knnprobe] $tag%-12s rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    t(s"scored k=$k") {
      graft.operators.VectorSimJoin.pairs(emb, "vec_id", "embedding",
        threshold = -1.0, k).count()
    }
    t(s"sim04 k=$k") {
      graft.operators.VectorSimJoin.pairs(emb, "vec_id", "embedding",
        threshold = 0.4, k).count()
    }
    t(s"full k=$k") {
      graft.util.Confs.ensureObjectHashHeadroom(spark)
      graft.operators.VectorSimJoin.knnJoin(emb, "vec_id", "embedding",
        k = 3, cells = k).count()
    }
    spark.stop()
  }
}
