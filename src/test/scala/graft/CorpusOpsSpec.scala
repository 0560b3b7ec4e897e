package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder
import graft.sources.Tables

/** Round-6 second-batch specs: retention/transition invariants, the
  * containment prefix-filter soundness law, reservoir-sample contract,
  * LM-score bounds, int8 quantization quality, and the Z-order layout
  * locality win (the part of q_sink_zorder the SQL oracle cannot see —
  * the oracle pins the RESULT, this spec pins the LAYOUT). */
class CorpusOpsSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("containment prefix candidates lose no qualifying pair (exact law)") {
    // brute force: full shingle self-join, directed, tau = 0.8
    val sh = Graft.shingleRows(Tables.documents(spark, sf0001),
      "doc_id", "text", n = 3).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
            Seq("doc_a"))
      .filter(col("n_inter") * 5 >= col("n_a") * 4)
      .select("doc_a", "doc_b")
    val viaPrefix = run("q_dedup_containment").select("doc_a", "doc_b")
    assert(brute.exceptAll(viaPrefix).isEmpty,
      "prefix filtering dropped a qualifying containment pair")
    assert(viaPrefix.exceptAll(brute).isEmpty,
      "containment emitted a pair below threshold")
    sh.unpersist()
  }

  test("containment is directed: sub-document found one way, not the reverse") {
    // doc 1's shingle set is a strict subset of doc 2's (a paragraph
    // quoted inside a larger doc) — C(1→2) = 1 but C(2→1) well under 0.8,
    // the case symmetric Jaccard misses entirely
    import spark.implicits._
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = small + " " + (13 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = Graft.shingleRows(docs, "doc_id", "text", n = 3)
    val pairs = graft.queries.CorpusOps.containmentPairs(sh, 4, 5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), "the contained doc must be flagged")
    assert(!pairs.contains((2L, 1L)),
      "the containing doc is NOT a near-dup of its quoted paragraph")
  }

  test("transition counts conserve: sum = n_events - n_active_users") {
    val ev = Tables.events(spark, sf0001)
    val total = ev.count()
    val users = ev.select("user_id").distinct().count()
    val trans = run("q_events_transitions")
      .agg(sum("n_trans")).collect()(0).getLong(0)
    assert(trans == total - users,
      s"each user must contribute exactly (n_i - 1) transitions: " +
        s"$trans != $total - $users")
  }

  test("retention offset-0 row counts every cohort member") {
    val ret = run("q_events_retention").collect()
    val byCohort = ret.groupBy(_.getLong(0))
    for ((cohort, rows) <- byCohort) {
      val off0 = rows.find(_.getLong(1) == 0L)
      assert(off0.isDefined, s"cohort $cohort missing its offset-0 row")
      assert(rows.forall(r => r.getLong(2) <= off0.get.getLong(2)),
        s"cohort $cohort retains more users than it started with")
    }
  }

  test("reservoir sample: exactly min(k, group size) rows, deterministic") {
    val docs = Tables.documents(spark, sf0001)
    val groupSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = run("q_sample_reservoir").collect()
    val byLang = got.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    for ((lang, n) <- groupSizes)
      assert(byLang.getOrElse(lang, 0) == math.min(20L, n),
        s"lang $lang sampled ${byLang.getOrElse(lang, 0)} of $n (k=20)")
    val again = run("q_sample_reservoir").collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "re-running the sampler must return the identical rows in order")
  }

  test("bigram LM scores are valid mean probabilities in (0, 1]") {
    val rows = run("q_text_ngram_lm").collect()
    assert(rows.length > 0)
    for (r <- rows) {
      val score = r.getDouble(2)
      assert(score > 0.0 && score <= 1.0,
        s"doc ${r.getLong(0)} lm_score $score outside (0, 1]")
    }
    // a doc whose every bigram is corpus-unique has score exactly 1 only
    // if each of its first-words appears once — spot the invariant on the
    // fixture's highest scorer instead of asserting an exact value
    assert(rows.map(_.getDouble(2)).max <= 1.0)
  }

  test("int8 quantization: codes bounded, top-10 cosine recall >= 0.8") {
    val q = run("q_embed_quantize").collect()
    assert(q.forall(r => r.getLong(3) <= 127L * r.getLong(1)),
      "l1 of int8 codes cannot exceed 127 per dimension")
    // recall: quantized-space cosine top-10 of vec 0 vs exact top-10
    val v = col("embedding").cast("array<double>")
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), v.as("v"))
      .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      .withColumn("q", transform(col("v"),
        x => round(x * lit(127.0) / col("maxabs"), 0).cast("long")))
      .cache()
    def top10(vecCol: String): Set[Long] = {
      val base = emb.filter(col("vec_id") === 0)
        .select(col(vecCol).as("qv")).crossJoin(emb.filter(col("vec_id") =!= 0))
      val dot = expr(s"aggregate(zip_with(qv, $vecCol, (a, b) -> a * b), " +
        "0D, (acc, x) -> acc + x)")
      val nrm = (c: String) => sqrt(expr(
        s"aggregate(zip_with($c, $c, (a, b) -> a * b), 0D, (acc, x) -> acc + x)"))
      base.withColumn("cos",
          dot / (nrm("qv") * nrm(vecCol)))
        .orderBy(col("cos").desc, col("vec_id").asc)
        .limit(10).select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val exact = top10("v")
    val quant = top10("q")
    assert((exact & quant).size >= 8,
      s"quantized recall@10 too low: ${(exact & quant).size}/10")
    emb.unpersist()
  }

  test("z-order layout clusters a 2-d box into fewer files than 1-d sort") {
    import java.nio.file.Files
    // the box is selective on BOTH dimensions; the 1-d twin is sorted on
    // the orderkey dimension only, so the partkey half of the predicate
    // cannot prune its layout — the z-curve prunes on both
    val li = Tables.lineitem(spark, sf0001)
      .withColumn("zx", pmod(col("l_orderkey"), lit(65536L)))
      .withColumn("zy", pmod(col("l_partkey"), lit(65536L)))
      .cache()
    val stats = li.agg(min("zx").as("mnx"), max("zx").as("mxx"),
                       min("zy").as("mny"), max("zy").as("mxy"))
    val Array(mnx, mxx, mny, mxy) =
      stats.collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val box = (df: org.apache.spark.sql.DataFrame) => {
      val midX = (mnx + mxx) / 2; val midY = (mny + mxy) / 2
      df.filter(col("zx").between(mnx, midX) && col("zy").between(mny, midY))
        .select(input_file_name().as("f")).distinct().count()
    }
    val zdir = Files.createTempDirectory("graft_zorder_z").toString
    val ldir = Files.createTempDirectory("graft_zorder_lin").toString
    li.withColumn("z", ZOrder.morton(
        ZOrder.scaleTo16(col("zx"), lit(mnx), lit(mxx)),
        ZOrder.scaleTo16(col("zy"), lit(mny), lit(mxy))))
      .repartitionByRange(8, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(zdir)
    li.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(ldir)
    val zFiles = box(spark.read.parquet(zdir))
    val linFiles = box(spark.read.parquet(ldir))
    li.unpersist()
    assert(zFiles < linFiles,
      s"z-order should confine the box to fewer files: z=$zFiles lin=$linFiles")
  }

  test("morton interleave is monotone on each axis within the other's value") {
    // z(x, y) with y fixed is strictly increasing in x (and vice versa) —
    // the property row-group min/max skipping relies on
    val df = spark.range(0, 256).select(
      col("id").as("x"),
      ZOrder.morton(col("id"), lit(7L)).as("zx"),
      ZOrder.morton(lit(7L), col("id")).as("zy"))
    val rows = df.orderBy("x").collect()
    val zxs = rows.map(_.getLong(1)); val zys = rows.map(_.getLong(2))
    assert(zxs.zip(zxs.tail).forall { case (a, b) => a < b })
    assert(zys.zip(zys.tail).forall { case (a, b) => a < b })
  }

  test("global shuffle is a permutation: every doc once, dense shard positions") {
    val docs = Tables.documents(spark, sf0001)
    val out = run("q_shuffle_global").cache()
    try {
      // bijection over doc_ids
      assert(out.count() === docs.count())
      assert(out.select("doc_id").distinct().count() === docs.count())
      // positions within a shard are dense 1..n (a gap would mean a
      // writer task skipped an offset)
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
             min(col("pos")).as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      assert(bad.count() === 0)
      // deterministic: a second run is row-identical
      val again = run("q_shuffle_global")
      assert(out.exceptAll(again).count() === 0)
      assert(again.exceptAll(out).count() === 0)
    } finally out.unpersist()
  }

  test("soft-dedup weights: keepers of singletons get full ppm, copies split it") {
    val out = SparkEntry.queries("q_dedup_soft")(spark, sf0001).cache()
    try {
      val docs = Tables.documents(spark, sf0001)
      assert(out.count() === docs.count())       // no doc dropped
      // every doc in an n-copy group carries round(1e6/n)
      val bad = out.filter(
        col("weight_ppm") =!=
          round(lit(1000000.0) / col("n_copies")).cast("long"))
      assert(bad.count() === 0)
      // the corpus' total weight ≈ 1e6 × distinct contents (each group
      // contributes n·round(1e6/n) ≈ 1e6, off by at most n/2 rounding)
      val distinctTexts = docs.select(sha2(col("text"), 256)).distinct().count()
      val total = out.agg(sum("weight_ppm")).first().getLong(0)
      assert(math.abs(total - 1000000L * distinctTexts) <=
        out.count() / 2 + 1)
    } finally out.unpersist()
  }

  test("cluster-grain soft weights never exceed the exact-grain weights") {
    // a near-dup cluster contains every exact-copy group inside it, so
    // cluster_size >= n_copies per doc and weight_ppm can only shrink
    val exact = SparkEntry.queries("q_dedup_soft")(spark, sf0001)
      .select(col("doc_id"), col("n_copies"), col("weight_ppm").as("w_exact"))
    val clustered = SparkEntry.queries("q_dedup_soft_cluster")(spark, sf0001)
    val joined = clustered.join(exact, Seq("doc_id")).cache()
    try {
      assert(joined.count() ===
        Tables.documents(spark, sf0001).count())
      assert(joined.filter(col("cluster_size") < col("n_copies")).count() === 0)
      assert(joined.filter(col("weight_ppm") > col("w_exact")).count() === 0)
      // sizes are consistent with the decision frame itself
      val fromDecision = SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
        .groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      val bad = clustered.select("cluster_id", "cluster_size").distinct()
        .join(fromDecision, Seq("cluster_id"))
        .filter(col("cluster_size") =!= col("sz"))
      assert(bad.count() === 0)
    } finally joined.unpersist()
  }

  test("mutual-kNN clusters: edge endpoints co-labeled, non-edge vertices singletons") {
    val graph = SparkEntry.queries("q_knn_graph")(spark, sf0001)
      .select("vec_a", "vec_b").cache()
    val cl = SparkEntry.queries("q_knn_graph_cluster")(spark, sf0001).cache()
    try {
      val lab = cl.select(col("vec_id"), col("cluster_id"))
      // every mutual edge's endpoints share a component label
      val split = graph
        .join(lab.withColumnsRenamed(
          Map("vec_id" -> "vec_a", "cluster_id" -> "ca")), Seq("vec_a"))
        .join(lab.withColumnsRenamed(
          Map("vec_id" -> "vec_b", "cluster_id" -> "cb")), Seq("vec_b"))
        .filter(col("ca") =!= col("cb"))
      assert(split.count() === 0)
      // a vertex on no mutual edge is its own singleton cluster
      val onEdge = graph.select(col("vec_a").as("vec_id"))
        .unionByName(graph.select(col("vec_b").as("vec_id"))).distinct()
      val singles = cl.join(onEdge, Seq("vec_id"), "left_anti")
      assert(singles.filter(col("cluster_id") =!= col("vec_id")).count() === 0)
      // every embedding labeled exactly once
      assert(cl.count() ===
        Tables.embeddings(spark, sf0001).count())
    } finally { graph.unpersist(); cl.unpersist() }
  }

  test("curriculum order: permutation, dense in-phase positions, bands respected") {
    val docs = Tables.documents(spark, sf0001)
    val out = SparkEntry.queries("q_mix_curriculum")(spark, sf0001).cache()
    try {
      assert(out.count() === docs.count())
      assert(out.select("doc_id").distinct().count() === docs.count())
      // phase matches the fixed n_chars boundaries
      val withChars = out.join(docs.select("doc_id", "n_chars"), Seq("doc_id"))
      val expectPhase = when(col("n_chars") < 200, 0L)
        .when(col("n_chars") < 400, 1L)
        .when(col("n_chars") < 800, 2L).otherwise(3L)
      assert(withChars.filter(col("phase") =!= expectPhase).count() === 0)
      // dense 1..n positions per (phase, shard)
      val bad = out.groupBy("phase", "shard")
        .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
      assert(bad.count() === 0)
    } finally out.unpersist()
  }

  test("mutual-kNN graph edges are symmetric-membership pairs of the kNN list") {
    val knn = SparkEntry.queries("q_knn_join")(spark, sf0001)
      .select(col("vec_id").as("a"), col("nbr_id").as("b")).cache()
    val graph = SparkEntry.queries("q_knn_graph")(spark, sf0001).cache()
    try {
      // every edge appears in BOTH directions of the kNN list
      val missingFwd = graph.join(knn,
        graph("vec_a") === knn("a") && graph("vec_b") === knn("b"),
        "left_anti")
      val missingBwd = graph.join(knn,
        graph("vec_b") === knn("a") && graph("vec_a") === knn("b"),
        "left_anti")
      assert(missingFwd.count() === 0)
      assert(missingBwd.count() === 0)
      // and every mutual pair of the list IS an edge (completeness).
      // Collect the k·N-row list driver-side and intersect as sets: a
      // DataFrame self-join here silently resolved both sides to the
      // SAME attributes (trivially-true condition, 1500/1500 matched) —
      // the classic self-join ambiguity trap, avoided by leaving Spark
      // entirely for the assertion.
      val edges = knn.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mutualCnt = edges.count { case (a, b) => a < b && edges((b, a)) }
      assert(mutualCnt === graph.count())
      // edges are canonically ordered, no duplicates
      assert(graph.filter(col("vec_a") >= col("vec_b")).count() === 0)
      assert(graph.select("vec_a", "vec_b").distinct().count() ===
        graph.count())
    } finally { knn.unpersist(); graph.unpersist() }
  }
}
