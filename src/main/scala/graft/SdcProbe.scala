package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.operators.{AnnIndex, ProductQuantizer}

/** TEMPORARY diagnostic: phase breakdown of the SDC approximate kNN
  * join at a given tier — assignment / encode / SDC-table / pair-score /
  * topk — to locate where the wall time goes (mirrors SdcKnnJoin's
  * internals with timers; throwaway, not a declared surface). */
object SdcProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.util.Confs.ensureObjectHashHeadroom(spark)
    val m = 16; val dim = 64; val kCodes = 32; val k = 3; val nprobe = 2

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sdcprobe] $tag%-16s t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val embN = t("read+norm") {
      graft.queries.LlmOps.embDouble(graft.sources.Tables.embeddings(spark, d))
        .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
        .localCheckpoint(true)
    }
    val root = System.getProperty("java.io.tmpdir") + "/sdcprobe_idx_" + d.hashCode
    if (!AnnIndex.exists(spark, root)) t("index build") {
      val nCells = math.max(8, math.min(512,
        math.ceil(math.sqrt(embN.count().toDouble)).toInt))
      AnnIndex.build(embN, root, k = nCells, m = m, dim = dim, kCodes = kCodes)
    }
    for (rnd <- 1 to 2) {
      println(s"--- round $rnd")
      val cents = t("load cents")(graft.util.Local.model(AnnIndex.centroids(spark, root)))
      val cb = t("load cb")(graft.util.Local.model(AnnIndex.codebooks(spark, root)))
      val emb = embN.withColumn("nrm", VectorExprs.norm(col("v")))
      val assigned = t("multiAssign") {
        val aw = Window.partitionBy("vec_id")
          .orderBy(col("sim").desc, col("cent_id").asc)
        emb.crossJoin(broadcast(cents))
          .withColumn("sim",
            VectorExprs.dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
          .withColumn("rk", row_number().over(aw))
          .filter(col("rk") <= nprobe)
          .select(col("vec_id"), col("cent_id").as("cell"),
            (col("rk") === 1).as("primary"),
            zip_with(col("v"), col("cv"), (x, c) => x - c).as("rv"))
          .localCheckpoint(true)
      }
      val copyId = (col("vec_id") * lit(1024L) + col("cell")) * lit(2L) +
        col("primary").cast("long")
      val subs = t("subvectors") {
        ProductQuantizer.subvectors(
          assigned.select(copyId.as("vec_id"), col("rv").as("v")), m, dim)
          .localCheckpoint(true)
      }
      val packed = t("encode+pack") {
        ProductQuantizer.encode(subs, cb)
          .groupBy("vec_id")
          .agg(transform(
            array_sort(collect_list(struct(col("sub"), col("code_id")))),
            e => e("code_id")).as("codes"))
          .withColumn("primary", pmod(col("vec_id"), lit(2L)) === 1L)
          .withColumn("rest", expr("vec_id div 2"))
          .withColumn("cell", pmod(col("rest"), lit(1024L)).cast("int"))
          .withColumn("vec_id", expr("rest div 1024"))
          .drop("rest")
          .localCheckpoint(true)
      }
      println(s"[sdcprobe] packed rows=${packed.count()}")
      val kk = kCodes * kCodes
      val flat = new Array[Double](m * kk)
      t("sdc table") {
        graft.util.Local.modelRows(
          cb.select(col("sub"), col("code_id").as("ca"), col("cv").as("va"))
            .join(cb.select(col("sub"), col("code_id").as("cb_id"),
              col("cv").as("vb")), Seq("sub"))
            .select(col("sub"), col("ca"), col("cb_id"),
              aggregate(zip_with(col("va"), col("vb"), (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, x) => acc + x).as("d")))
          .foreach { r =>
            flat(r.getInt(0) * kk + (r.getInt(1) - 1) * kCodes +
              (r.getInt(2) - 1)) = r.getDouble(3)
          }
      }
      val a = packed.select(col("cell"), col("vec_id").as("id_a"),
        col("codes").as("codes_a"), col("primary").as("pa"))
      val b = packed.select(col("cell"), col("vec_id").as("id_b"),
        col("codes").as("codes_b"), col("primary").as("pb"))
      val score = VectorExprs.sdcSum(col("codes_a"), col("codes_b"),
        flat, kCodes)
      val scored = t("pair score") {
        val df = a.join(b, Seq("cell"))
          .filter(col("id_a") < col("id_b"))
          .withColumn("np",
            lit(2) - col("pa").cast("int") - col("pb").cast("int"))
          .groupBy("id_a", "id_b")
          .agg(min(struct(col("np"), col("cell"), score.as("d"))).as("best"))
          .select(col("id_a"), col("id_b"),
            round(col("best.d"), 6).as("approx_d2"))
          .localCheckpoint(true)
        println(s"[sdcprobe] scored pairs=${df.count()}")
        df
      }
      t("topk+count") {
        val n = scored.select(explode(array(
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
          .count()
        println(s"[sdcprobe] topk rows=$n")
      }
    }
    spark.stop()
  }
}
