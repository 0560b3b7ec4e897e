package graft.tools


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: the text-index family under a REALISTIC vocabulary
  * (verdict r16 #6). The driver fixture's ~60-token vocabulary makes
  * every postings bucket dense — 17/32 buckets populated and >1M rows
  * matched for a 4-term probe at the 100× tier — so every committed
  * index number is measured at an adversarial density no real corpus
  * has. This probe synthesizes a corpus with a Zipf(s≈1) vocabulary
  * (rank = V^u is the exact inverse CDF of p(r) ∝ 1/r), builds the
  * SAME InvertedIndex artifact, and times the standard probe at head /
  * mid / tail term ranks — the density-sensitivity curve PLANS_r17
  * records. Purely a measurement harness: correctness of the index is
  * pinned by RetrievalSpec + the DuckDB oracles on driver fixtures.
  *
  * Usage: runMain graft.ProbeZipf <nDocs> [vocab] [reps]
  */
object ProbeZipf {
  def main(args: Array[String]): Unit = {
    val nDocs = args(0).toInt
    val vocab = if (args.length > 1) args(1).toInt else 60000
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.InvertedIndex

    // ~190 tokens/doc, token rank log-uniform in [1, vocab] (= Zipf s=1):
    // u from a per-(doc, pos) xxhash64 → rank = exp(u · ln V). All
    // column expressions — the corpus generates distributed, no driver
    // loop, no Random.
    val lnV = math.log(vocab.toDouble)
    val docs = spark.range(0, nDocs.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1), lit(160) + pmod(col("id"), lit(60)).cast("int")),
          i => {
            val h = xxhash64(col("id"), i)
            val u = (pmod(h, lit(1000003L)).cast("double") / 1000003.0)
            concat(lit("t"),
              ceil(exp(u * lnV)).cast("long").cast("string"))
          })).as("text"))
      .localCheckpoint(true) // freeze the corpus; builds/probes re-read it

    def t(label: String)(body: => Long): Unit = {
      val xs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[zipf] $label%-26s min=${xs.map(_._1).min}%.2f " +
        s"rows=${xs.head._2} all=${xs.map(x => f"${x._1}%.2f").mkString(",")}")
    }

    val root = java.nio.file.Files.createTempDirectory("graft_zipf")
      .toString + "/idx"
    val tb0 = System.nanoTime()
    InvertedIndex.build(docs, root)
    println(f"[zipf] build ${(System.nanoTime() - tb0) / 1e9}%.1f s " +
      s"($nDocs docs, vocab $vocab)")

    // probe sets across the frequency spectrum: head ranks saturate
    // every doc, tail ranks match a handful — the density axis the
    // fixture cannot exercise
    val probes = Seq(
      "head (r 1-4)"    -> Seq("t1", "t2", "t3", "t4"),
      "mid  (r ~1k)"    -> Seq("t1000", "t1013", "t1047", "t1111"),
      "tail (r ~40k)"   -> Seq("t40007", "t40013", "t40047", "t40111"),
      "fixture-shape"   -> Seq("t3", "t7", "t1000", "t40007"))
    for ((label, terms) <- probes)
      t(s"query $label")(InvertedIndex.query(spark, root, terms, k = 20)
        .count())
    t("multi 3-queries") {
      InvertedIndex.queryMulti(spark, root,
        Seq(1L -> Seq("t1", "t1000"), 2L -> Seq("t2", "t40013"),
            3L -> Seq("t1013", "t40047")), k = 5).count()
    }
    // density stats: postings rows matched per probe tier
    for ((label, terms) <- probes) {
      val n = spark.read.parquet(s"$root/postings")
        .filter(col("term").isin(terms: _*)).count()
      println(s"[zipf] matched postings $label: $n")
    }
    spark.stop()
  }
}
