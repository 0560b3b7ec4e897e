package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: stage decomposition of q_sim_join (VectorSimJoin.pairs) at
  * a given tier — input count/prepare, centroid assignment, block
  * packing, cell-pair pruning, and the block-product scorer, timed
  * separately so a regression (or an optimization) can be attributed to
  * the stage that actually moved.
  * Usage: runMain graft.tools.ProbeSimJoin <sfDir> [reps]
  */
object ProbeSimJoin {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "500000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t(label: String)(body: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s min=${xs.map(_._1).min}%.2f rows=${xs.head._2} " +
        s"all=${xs.map(x => f"${x._1}%.2f").mkString(",")}")
    }

    val emb = graft.sources.Tables.embeddings(spark, d)
    t("full pairs") {
      graft.operators.VectorSimJoin
        .pairs(emb, "vec_id", "embedding", 0.4).count()
    }

    // replicate pairs() stage by stage (same private shapes, via the
    // package-private test hooks)
    val e = emb.select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", graft.functions.VectorExprs.norm(col("v")))
    val n = e.count()
    println(s"n=$n")
    val k = math.max(16, math.min(512, math.ceil(math.sqrt(n.toDouble)).toInt))
    val cents = e.orderBy("id").limit(k)
      .select(col("id").as("cent_id"), col("v").as("cv"), col("nrm").as("cn"))
    t("assignments")(
      graft.operators.VectorSimJoin.assignments(e, cents).count())
    val assign = graft.operators.VectorSimJoin.assignments(e, cents)
    t("packedBlocks ckpt") {
      val b = graft.operators.VectorSimJoin.packedBlocks(assign)
        .localCheckpoint(true)
      val c = b.count()
      b.unpersist(true)
      c
    }
    val blocks = graft.operators.VectorSimJoin.packedBlocks(assign)
      .localCheckpoint(true)
    t("cellPairs") {
      graft.operators.VectorSimJoin
        .survivingCellPairs(assign, cents, 0.4).count()
    }
    val cellPairs = graft.operators.VectorSimJoin
      .survivingCellPairs(assign, cents, 0.4).localCheckpoint(true)
    val keysA = blocks.select(col("cell").as("cell_a"),
      col("slice").as("slice_a"))
    val keysB = blocks.select(col("cell").as("cell_b"),
      col("slice").as("slice_b"))
    val blockPairs = cellPairs
      .join(broadcast(keysA), Seq("cell_a"))
      .join(broadcast(keysB), Seq("cell_b"))
    t("blockPairs")(blockPairs.count())
    val p = spark.sessionState.conf.numShufflePartitions
    val spread = blockPairs.repartition(p,
      col("cell_a"), col("slice_a"), col("cell_b"), col("slice_b"))
    val a = blocks.select(col("cell").as("cell_a"),
      col("slice").as("slice_a"), col("blk").as("blk_a"))
    val b = blocks.select(col("cell").as("cell_b"),
      col("slice").as("slice_b"), col("blk").as("blk_b"))
    t("scorer (broadcast blocks)") {
      spread.join(broadcast(a), Seq("cell_a", "slice_a"))
        .join(broadcast(b), Seq("cell_b", "slice_b"))
        .select(explode(graft.functions.BlockKnn
          .simPairsPerBlockPair(col("blk_a"), col("blk_b"), 0.4)).as("p"))
        .count()
    }
    spark.stop()
  }
}
