package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic laws over generated micro-frames (SURVEY §5.3) — engine-level
  * invariants that hold for ANY data, complementing the fixture oracles.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genPairs: Gen[List[(Int, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 8), Gen.choose(0, 5)))

  /** scalatestplus-scalacheck isn't in the offline cache — drive ScalaCheck
    * generators directly with fixed seeds (deterministic, CI-stable). */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (1 to 10).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    }
  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    (1 to 10).foreach { i =>
      body(g1.apply(Gen.Parameters.default, Seed(i.toLong)).get,
           g2.apply(Gen.Parameters.default, Seed(i.toLong + 100)).get)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit =
    if (cond) body

  private def df(xs: List[(Int, Int)], k: String, v: String): DataFrame =
    xs.toDF(k, v)

  test("join algebra: inner ⊆ left; |left| ≥ |L|; semi ⊎ anti ≡ L-keys") {
    forAll(genPairs, genPairs) { (l, r) =>
      whenever(l.nonEmpty) {
        val L = df(l, "k", "lv")
        val R = df(r, "k", "rv")
        val inner = L.join(R, Seq("k")).count()
        val left = L.join(R, Seq("k"), "left").count()
        val semi = L.join(R, Seq("k"), "left_semi").count()
        val anti = L.join(R, Seq("k"), "left_anti").count()
        assert(left >= L.count())   // left keeps every left row
        assert(inner <= left)       // inner is a subset of left matches
        assert(semi + anti === L.count()) // semi/anti partition the left side
      }
    }
  }

  test("set ops: (A except B) ⊎ (A intersect B) ≡ distinct A") {
    forAll(genPairs, genPairs) { (a, b) =>
      val A = df(a, "k", "v").select("k")
      val B = df(b, "k", "v").select("k")
      val ex = A.except(B).count()
      val in = A.intersect(B).count()
      assert(ex + in === A.distinct().count())
    }
  }

  test("tumbling windows: per-window counts sum to the row total") {
    forAll(Gen.listOfN(40, Gen.choose(0L, 10000L))) { tsSecs =>
      whenever(tsSecs.nonEmpty) {
        val events = tsSecs.map(s => (new java.sql.Timestamp(s * 1000L), 1))
          .toDF("ts", "one")
        val windowed = events.groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n"))
        assert(windowed.agg(sum("n")).head.getLong(0) === tsSecs.size.toLong)
      }
    }
  }

  test("exact dedup is idempotent and keeps one row per distinct key") {
    forAll(genPairs) { xs =>
      whenever(xs.nonEmpty) {
        val d = df(xs, "k", "v")
        val once = d.groupBy("k").agg(min("v").as("v"))
        val twice = once.groupBy("k").agg(min("v").as("v"))
        assert(once.count() === xs.map(_._1).distinct.size.toLong)
        assert(once.collect().toSet === twice.collect().toSet)
      }
    }
  }

  test("salted join ≡ plain join for any salt fan-out") {
    forAll(genPairs, genPairs) { (l, r) =>
      whenever(l.nonEmpty && r.nonEmpty) {
        val L = l.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
          .toDF("id", "k", "lv")
        val R = r.distinct.toDF("rk", "rv")
        val plain = L.join(R, col("k") === col("rk"))
          .select("id", "k", "lv", "rk", "rv")
        for (n <- Seq(1, 4)) {
          val salted = graft.operators.SaltedJoin
            .join(L, R, "k", "rk", Seq(col("id")), n)
            .select("id", "k", "lv", "rk", "rv")
          assert(salted.collect().map(_.toString).sorted.toSeq ===
            plain.collect().map(_.toString).sorted.toSeq)
        }
      }
    }
  }

  test("as-of join: every left row survives; carried time ≤ left time") {
    forAll(genPairs, genPairs) { (l, r) =>
      whenever(l.nonEmpty && r.nonEmpty) {
        val L = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t.toLong) }
          .toDF("lid", "k", "lt")
        val R = r.distinct.map { case (k, t) => (k, t.toLong, s"v$k-$t") }
          .toDF("rk", "rt", "rv")
          .groupBy("rk", "rt").agg(first("rv").as("rv"))
        val out = graft.operators.AsOf.join(L, R, "k", "rk", "lt", "rt", Seq("rv", "rt"))
        assert(out.count() === L.count())
        // for matched rows the carried right time never exceeds left time
        val bad = out.filter(col("rv").isNotNull && col("rt") > col("lt")).count()
        assert(bad === 0L)
      }
    }
  }

  test("as-of direction duality: forward ≡ backward on the negated timeline") {
    // forward(L, R) on times t is exactly backward(L, R) on times -t —
    // both inclusive at equality, so the matched (key, |rt|) sets agree
    forAll(genPairs, genPairs) { (l, r) =>
      whenever(l.nonEmpty && r.nonEmpty) {
        val L = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t.toLong) }
          .toDF("lid", "k", "lt")
        val R = r.distinct.map { case (k, t) => (k, t.toLong) }.toDF("rk", "rt")
          .groupBy("rk", "rt").agg(count(lit(1)).as("one")).drop("one")
        val fwd = graft.operators.AsOf
          .join(L, R, "k", "rk", "lt", "rt", Seq("rt"), forward = true)
          .select(col("lid"), col("rt"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
        val Lneg = L.withColumn("lt", -col("lt"))
        val Rneg = R.withColumn("rt", -col("rt"))
        val bwdNeg = graft.operators.AsOf
          .join(Lneg, Rneg, "k", "rk", "lt", "rt", Seq("rt"))
          .select(col("lid"), (-col("rt")).as("rt"))
          .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
        assert(fwd === bwdNeg)
      }
    }
  }

  test("nearest as-of ≡ brute-force min-|Δ| with backward ties; left count preserved") {
    forAll(genPairs, genPairs) { (l, r) =>
      whenever(l.nonEmpty && r.nonEmpty) {
        val L = l.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t.toLong) }
          .toDF("lid", "k", "lt")
        val rRows = r.distinct.map { case (k, t) => (k, t.toLong, s"v$k-$t") }
          .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
        val R = rRows.toDF("rk", "rt", "rv")
        val out = graft.operators.AsOf
          .joinNearest(L, R, "k", "rk", "lt", "rt", Seq("rv", "rt"))
          .collect()
          .map(x => x.getLong(0) ->
            (Option(x.get(3)), Option(x.get(4)), Option(x.get(5)))).toMap
        assert(out.size === l.size)
        val byKey = rRows.groupBy(_._1)
        for (((k, t), i) <- l.zipWithIndex) {
          val want = byKey.get(k).flatMap { cands =>
            // min |Δ|; at equal distance the two candidates sit on
            // opposite sides (rt unique per key) — backward (rt ≤ lt) wins
            Some(cands.minBy(c =>
              (math.abs(t.toLong - c._2), if (c._2 <= t.toLong) 0 else 1)))
          }
          val got = out(i.toLong)
          assert(got._2 === want.map(_._2),
            s"lid $i k=$k t=$t: nearest time ${got._2} != ${want.map(_._2)}")
          assert(got._1 === want.map(_._3))
          assert(got._3 === want.map(c => math.abs(t.toLong - c._2)),
            s"lid $i: delta mismatch")
        }
      }
    }
  }

  test("as-of and nearest joins: NULL keys never match (SQL semantics)") {
    val L = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 10L))
      .toDF("lid", "k", "lt")
    val R = Seq((Option("a"), 8L, "x"), (Option.empty[String], 9L, "y"))
      .toDF("rk", "rt", "rv")
    val bwd = graft.operators.AsOf
      .join(L, R, "k", "rk", "lt", "rt", Seq("rv"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(bwd(1L) === Some("x"))
    assert(bwd(2L) === None, "null-keyed rows matched each other in as-of")
    val near = graft.operators.AsOf
      .joinNearest(L, R, "k", "rk", "lt", "rt", Seq("rv", "rt"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(near(1L) === Some("x"))
    assert(near(2L) === None, "null-keyed rows matched each other in nearest")
  }

  test("as-of and nearest joins: NULL left TIME never matches (SQL semantics)") {
    // A null left time sorts FIRST in the window (nulls-first asc): it
    // correctly gets no backward carry, but without the isNotNull gate it
    // would take the forward pull and "match" the earliest right row.
    val L = Seq((1L, "a", Option(10L)), (2L, "a", Option.empty[Long]))
      .toDF("lid", "k", "lt")
    val R = Seq(("a", 8L, "x"), ("a", 12L, "y")).toDF("rk", "rt", "rv")
    val fwd = graft.operators.AsOf
      .join(L, R, "k", "rk", "lt", "rt", Seq("rv"), forward = true)
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(fwd(1L) === Some("y"))
    assert(fwd(2L) === None, "null-time left row took the forward carry in as-of")
    val near = graft.operators.AsOf
      .joinNearest(L, R, "k", "rk", "lt", "rt", Seq("rv", "rt"))
      .collect()
      .map(x => x.getLong(0) -> (Option(x.get(3)), Option(x.get(5)))).toMap
    assert(near(1L) === (Some("x"), Some(2L)))
    assert(near(2L) === (None, None),
      "null-time left row matched a right row in nearest")
  }

  test("as-of and nearest joins: NULL right TIME never matches (SQL semantics)") {
    // A null-time RIGHT row sorts FIRST in the window (nulls-first asc):
    // without the right-side isNotNull filter the backward
    // last(ignoreNulls) carries its values into left rows that have no
    // real earlier right row — diverging from DuckDB ASOF, where the
    // inequality is never true on null.
    val L = Seq((1L, "a", 10L), (2L, "a", 5L)).toDF("lid", "k", "lt")
    val R = Seq(("a", Option(8L), "x"), ("a", Option.empty[Long], "ghost"))
      .toDF("rk", "rt", "rv")
    val bwd = graft.operators.AsOf
      .join(L, R, "k", "rk", "lt", "rt", Seq("rv"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(bwd(1L) === Some("x"))
    assert(bwd(2L) === None,
      "null-time right row was carried into an unmatched left row in as-of")
    val near = graft.operators.AsOf
      .joinNearest(L, R, "k", "rk", "lt", "rt", Seq("rv", "rt"))
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(near(1L) === Some("x"))
    assert(near(2L) === Some("x"), "nearest ignores the null-time ghost row")
  }

  test("prefix filter: candidates ⊇ all pairs with J ≥ t on generated docs") {
    // the SSJoin prefix theorem, checked empirically for ANY generated
    // corpus and several thresholds: restricting the self-join to each
    // doc's df-ordered prefix must lose NO qualifying pair
    val genDocs: Gen[List[String]] = Gen.listOfN(15,
      Gen.listOfN(10, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
        .map(_.mkString(" ")))
    forAll(genDocs) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val sh = Graft.shingleRows(docs, "doc_id", "text", n = 2)
        for (t <- Seq(0.5, 0.8, 1.0)) {
          val qualifying = graft.queries.DedupOps.jaccardPairs(sh, None)
            .filter(col("jaccard_raw") >= t)
            .select("doc_a", "doc_b")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val cands = graft.operators.PrefixFilter.candidatePairs(sh, t)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          assert(qualifying.subsetOf(cands),
            s"prefix filter lost pairs at t=$t: ${qualifying -- cands}")
        }
      }
    }
  }

  test("dedup clustering ≡ reference union-find on generated pair graphs") {
    val genEdges: Gen[List[(Int, Int)]] =
      Gen.listOfN(12, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)))
        .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) })
    forAll(genEdges) { edges =>
      whenever(edges.nonEmpty) {
        // reference: in-memory union-find over ids 0..9
        val parent = Array.tabulate(10)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        for ((a, b) <- edges) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = (0 until 10).map(i => i.toLong -> find(i).toLong).toMap
        val got = Graft.dedupClusters(
            (0L to 9L).toDF("doc_id"),
            edges.map { case (a, b) => (a.toLong, b.toLong) }
              .toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected)
      }
    }
  }

  test("simhash banding: recall 1 vs all-pairs on generated token docs") {
    val genDocs: Gen[List[String]] = Gen.listOfN(20,
      Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon",
        "zeta", "eta", "theta", "iota", "kappa")).map(_.mkString(" ")))
    forAll(genDocs) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val banded = graft.operators.SimHash.pairs(docs)
          .collect().map(_.toString).sorted.toSeq
        val sig = graft.operators.SimHash.signatures(docs)
        val a = sig.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
        val b = sig.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
        val allPairs = a.join(b, col("doc_a") < col("doc_b"))
          .withColumn("hamming",
            bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
          .filter(col("hamming") <= 3)
          .select("doc_a", "doc_b", "hamming")
          .collect().map(_.toString).sorted.toSeq
        assert(banded === allPairs)
      }
    }
  }

  test("sequence packing: token-conserving, contiguous chunks, budget-bound starts") {
    val genDocs: Gen[List[String]] = Gen.listOfN(25,
      Gen.choose(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))))
    forAll(genDocs) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val budget = 16
        val packed = Graft.packSequences(docs, budget = budget, shards = 3)
          .collect()
        // token conservation: every doc appears once, n_tok preserved
        assert(packed.length === texts.length)
        val totTok = packed.map(_.getAs[Long]("n_tok")).sum
        assert(totTok === texts.map(_.split(" ").length.toLong).sum)
        // per-shard: chunk ids contiguous from 0, and a doc starts in
        // chunk floor(preceding-tokens / budget) — so chunk k is reached
        // iff the shard has > k*budget preceding tokens
        for ((_, rows) <- packed.groupBy(_.getAs[Long]("shard_id"))) {
          val byDoc = rows.sortBy(_.getAs[Long]("doc_id"))
          var cum = 0L
          for (r <- byDoc) {
            assert(r.getAs[Long]("chunk_id") === cum / budget,
              s"doc ${r.getAs[Long]("doc_id")} landed in chunk " +
                s"${r.getAs[Long]("chunk_id")} with $cum tokens before it")
            cum += r.getAs[Long]("n_tok")
          }
          val ids = byDoc.map(_.getAs[Long]("chunk_id")).distinct.sorted
          assert(ids === (0L to ids.max).toArray.toSeq,
            s"chunk ids not contiguous: ${ids.toSeq}")
        }
      }
    }
  }

  test("bounded top-k buffer ≡ sort-take-k under any partitioning + serde") {
    val genEntries: Gen[List[(Double, Long)]] = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 9).map(_ / 4.0), Gen.choose(0L, 20L)))
    forAll(genEntries, Gen.choose(1, 5)) { (xs, k) =>
      whenever(xs.nonEmpty) {
        val want = xs.sortBy { case (s, i) => (-s, i) }.take(k)
        val parts = xs.grouped(math.max(1, xs.size / 3)).toList
        val bufs = parts.map { part =>
          val b = new graft.functions.TopKBuffer(k)
          part.foreach { case (s, i) => b.add(s, i) }
          // serde round-trip every partial, like a real shuffle would
          graft.functions.TopKBuffer.fromBytes(k, b.toBytes)
        }
        val merged = bufs.reduce { (a, b) => a.addAll(b); a }
        val got = (0 until merged.n).map(j => (merged.scores(j), merged.ids(j))).toList
        assert(got === want, s"k=$k xs=$xs")
      }
    }
  }

  test("decontaminate ≡ brute-force shingle intersection on generated docs") {
    val genDocs: Gen[List[String]] = Gen.listOfN(14,
      Gen.listOfN(6, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" ")))
    forAll(genDocs) { texts =>
      whenever(texts.size >= 4) {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val isBench = col("doc_id") % 4 === 0
        val got = Graft.decontaminate(docs.filter(!isBench), docs.filter(isBench))
          .collect()
          .map(r => r.getAs[Long]("doc_id") ->
            (r.getAs[Long]("n_shared"), r.getAs[Long]("n_bench_docs"))).toMap
        // brute force over driver-side 3-gram shingle sets
        def sh(t: String): Set[String] =
          t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
        val bench = texts.zipWithIndex.collect { case (t, i) if i % 4 == 0 => (i.toLong, sh(t)) }
        val want = texts.zipWithIndex.collect { case (t, i) if i % 4 != 0 =>
          val mine = sh(t)
          val shared = bench.map(_._2).foldLeft(Set.empty[String])(_ ++ _) & mine
          val nDocs = bench.count(_._2.exists(mine))
          (i.toLong, (shared.size.toLong, nDocs.toLong))
        }.filter { case (_, (s, _)) => s > 0 }.toMap
        assert(got === want)
      }
    }
  }

  test("range join ≡ naive band predicate for any values and band") {
    val genVals: Gen[List[Long]] =
      Gen.listOfN(40, Gen.choose(-300L, 300L))
    val genBand: Gen[Long] = Gen.choose(1L, 50L)
    forAll(genVals, genBand) { (vs, band) =>
      whenever(vs.nonEmpty) {
        val l = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("a_id", "a_v")
        val r = vs.reverse.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("b_id", "b_v")
        val fast = operators.RangeJoin.join(l, r, "a_v", "b_v", band)
          .select("a_id", "b_id")
        val naive = l.join(r, abs(col("a_v") - col("b_v")) <= band)
          .select("a_id", "b_id")
        assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
          s"range join diverged from naive at band=$band")
      }
    }
  }

  test("cogroup aggregate ≡ full-outer join of per-input aggregates") {
    forAll(genPairs, genPairs) { (a, b) =>
      whenever(a.nonEmpty && b.nonEmpty) {
        val A = a.map { case (k, v) => (k.toLong, v.toDouble) }.toDF("k", "v")
        val B = b.map { case (k, v) => (k.toLong, v.toDouble) }.toDF("k", "v")
        val got = Graft.cogroupAgg(Seq((A, "k", "v"), (B, "k", "v")))
        val aggA = A.groupBy(col("k").as("key"))
          .agg(count(lit(1)).as("n_0"), sum(col("v").cast("decimal(28,4)"))
            .cast("double").as("sum_0"))
        val aggB = B.groupBy(col("k").as("key"))
          .agg(count(lit(1)).as("n_1"), sum(col("v").cast("decimal(28,4)"))
            .cast("double").as("sum_1"))
        val want = aggA.join(aggB, Seq("key"), "full_outer")
          .select(col("key"), coalesce(col("n_0"), lit(0L)).as("n_0"),
            col("sum_0"), coalesce(col("n_1"), lit(0L)).as("n_1"),
            col("sum_1"))
        assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
          "cogroup diverged from join-of-aggregates")
      }
    }
  }

  test("containment candidates ⊇ all directed pairs with C ≥ t on generated docs") {
    // the directed analog of the prefix-filter law: generated token docs,
    // brute-force directed containment vs the contained-side prefix path
    val genDocs: Gen[List[List[Int]]] =
      Gen.listOfN(8, Gen.listOfN(12, Gen.choose(0, 6)))
    forAll(genDocs) { docsTok =>
      val docs = docsTok.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val sh = Graft.shingleRows(docs, "doc_id", "text", n = 2)
      val got = graft.queries.CorpusOps.containmentPairs(sh, 4, 5)
        .select("doc_a", "doc_b")
      val brute = {
        val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
        val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
        val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        a.join(b, Seq("shingle")).filter(col("doc_a") =!= col("doc_b"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
          .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh")), Seq("doc_a"))
          .filter(col("i") * 5 >= col("n_sh") * 4)
          .select("doc_a", "doc_b")
      }
      assert(brute.exceptAll(got).isEmpty && got.exceptAll(brute).isEmpty,
        "directed containment diverged from brute force")
    }
  }

  test("morton interleave is injective on the 16-bit grid") {
    val genPts: Gen[List[(Int, Int)]] =
      Gen.listOfN(60, Gen.zip(Gen.choose(0, 65535), Gen.choose(0, 65535)))
    forAll(genPts) { pts =>
      val d = pts.distinct.map { case (x, y) => (x.toLong, y.toLong) }
        .toDF("x", "y")
      val n = d.count()
      val z = d.select(graft.operators.ZOrder.morton(col("x"), col("y")))
        .distinct().count()
      assert(z == n, "two grid points collided in morton space")
    }
  }

  test("merge-upsert algebra: empty change-set is identity, reapply is idempotent") {
    forAll(genPairs) { base =>
      whenever(base.nonEmpty) {
        // model: newest-wins keyed upsert — one full-outer join pass, the
        // q_merge_upsert shape reduced to its algebra
        def applyChanges(b: DataFrame, c: DataFrame): DataFrame =
          b.join(c.withColumnsRenamed(Map("v" -> "cv")), Seq("k"), "full_outer")
            .select(col("k"), coalesce(col("cv"), col("v")).as("v"))
        val B = base.distinctBy(_._1).toDF("k", "v")
        val empty = Seq.empty[(Int, Int)].toDF("k", "v")
        val id = applyChanges(B, empty)
        assert(id.exceptAll(B).isEmpty && B.exceptAll(id).isEmpty,
          "empty change-set must be identity")
        val changes = base.take(5).map { case (k, v) => (k, v + 100) }
          .distinctBy(_._1).toDF("k", "v")
        val once = applyChanges(B, changes)
        val twice = applyChanges(once, changes)
        assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
          "reapplying the same change-set must be a no-op")
      }
    }
  }

  test("scd2: versions partition the timeline for any changelog") {
    // (key, time, attr) triples with duplicate times — the event-id tie
    // break must still produce a total order
    val gen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 20L), Gen.choose(0, 3)))
    forAll(gen) { xs =>
      whenever(xs.nonEmpty) {
        val log = xs.zipWithIndex
          .map { case ((k, t, a), id) => (k.toLong, id.toLong, t, s"a$a") }
          .toDF("k", "id", "t", "attr")
        val out = Graft.scd2(log, "k", "t", tieBreak = Seq("id")).collect()
        assert(out.length === xs.length, "every change becomes a version")
        for ((_, rows) <- out.groupBy(_.getLong(0))) {
          val sorted = rows.sortBy(_.getLong(4)) // version column
          assert(sorted.map(_.getLong(4)).toSeq === (1L to rows.length).toSeq)
          assert(sorted.count(_.getBoolean(6)) === 1, "exactly one current")
          for (Array(a, b) <- sorted.sliding(2).filter(_.length == 2))
            assert(a.getLong(5) === b.getLong(2), // valid_to == next t
              "intervals must chain")
        }
      }
    }
  }

  test("snapshotDiff: classes partition both snapshots; diff of X with X" +
       " is all-unchanged") {
    forAll(genPairs, genPairs) { (a, b) =>
      whenever(a.nonEmpty && b.nonEmpty) {
        val A = a.distinctBy(_._1).toDF("k", "v")
        val B = b.distinctBy(_._1).toDF("k", "v")
        val d = Graft.snapshotDiff(A, B, Seq("k")).collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        assert(d.values.count(c => c != "added") === A.count(),
          "old rows = removed + changed + unchanged")
        assert(d.values.count(c => c != "removed") === B.count(),
          "new rows = added + changed + unchanged")
        val self = Graft.snapshotDiff(A, A, Seq("k"))
          .filter(col("diff_class") =!= "unchanged").count()
        assert(self === 0L, "X vs X must be all-unchanged")
      }
    }
  }

  test("gapFillForward: dense grid, idempotent, observed values kept") {
    val gen = Gen.listOfN(15,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 12L), Gen.choose(1.0, 9.0)))
    forAll(gen) { xs =>
      whenever(xs.nonEmpty) {
        val s = xs.distinctBy(x => (x._1, x._2)).toDF("k", "t", "v")
        val filled = Graft.gapFillForward(s, "k", "t", "v")
        val span = s.agg(max("t")).head.getLong(0) -
          s.agg(min("t")).head.getLong(0) + 1
        val keys = s.select("k").distinct().count()
        assert(filled.count() === span * keys, "grid must be dense")
        // observed rows keep their value
        val kept = filled.filter(!col("is_gap"))
          .join(s.withColumnRenamed("v", "v0"), Seq("k", "t"))
        assert(kept.filter(col("v") =!= col("v0")).count() === 0L)
        // idempotence: filling the filled series changes nothing
        val again = Graft.gapFillForward(
          filled.select("k", "t", "v"), "k", "t", "v")
        assert(again.filter(col("is_gap")).count()
          === filled.filter(col("v").isNull).count(),
          "second fill only flags leading nulls")
      }
    }
  }

  test("dedup-index ingest: exactly-once pairs over ANY batch partitioning") {
    // the s_dedup_index invariant on GENERATED corpora, not just the
    // fixture: however the corpus is split into sequential ingest
    // batches, the union of committed pair versions equals the
    // corpus-wide exhaustive exact-Jaccard pair set — each pair emitted
    // exactly once, by whichever batch completes it
    import graft.operators.DedupIndex
    import graft.streaming.Streams
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    val genCorpus: Gen[List[List[Int]]] = for {
      n <- Gen.choose(6, 10)
      lens <- Gen.listOfN(n, Gen.choose(6, 12))
      base <- Gen.sequence[List[List[Int]], List[Int]](
        lens.map(l => Gen.listOfN(l, Gen.choose(0, vocab.size - 1))))
    } yield base
    forAll(genCorpus) { base =>
      val docs =
        base.zipWithIndex.map { case (ws, i) =>
          (i.toLong, ws.map(vocab).mkString(" "))
        } ++ base.zipWithIndex.collect {
          // near-dup clones (append one word: J ≈ 0.9) and exact clones
          case (ws, i) if i % 3 == 0 =>
            ((100 + i).toLong, (ws :+ ws.head).map(vocab).mkString(" "))
          case (ws, i) if i % 4 == 1 =>
            ((200 + i).toLong, ws.map(vocab).mkString(" "))
        }
      val docsDf = docs.toDF("doc_id", "text")
      val root = java.nio.file.Files
        .createTempDirectory("graft_prop_didx").toString
      val pairsDir = java.nio.file.Files
        .createTempDirectory("graft_prop_pairs").toString
      DedupIndex.build(graft.Graft.shingleRows(
        docsDf.filter(lit(false)), "doc_id", "text", n = 3), root)
      // deterministic scatter of docs over 3 sequential batches
      for (b <- 0 until 3)
        Streams.dedupIndexIngest(
          docsDf.filter(pmod(col("doc_id") * 7919L, lit(3L)) === b.toLong),
          root, pairsDir, b.toLong)
      val got = Streams.committedPairs(spark, pairsDir)
        .select("doc_a", "doc_b", "jaccard")
        .collect().map(_.toString).sorted.toSeq
      val sh = graft.Graft.shingleRows(docsDf, "doc_id", "text", n = 3)
      val want = graft.queries.DedupOps.jaccardPairs(sh, None)
        .filter(col("jaccard_raw") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
        .collect().map(_.toString).sorted.toSeq
      assert(got === want, "ingest pair set diverges from exhaustive truth")
      assert(want.nonEmpty, "generator must produce near-dup pairs")
    }
  }

  test("rankAndCumsum ≡ naive global window for ANY keys/weights (incl. all-ties)") {
    // keys drawn from a TINY domain so heavy ties (the documented skew
    // caveat) and the all-equal degenerate case are actually generated
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L)))
    forAll(gen) { rows =>
      whenever(rows.nonEmpty) {
        val in = rows.zipWithIndex
          .map { case ((k, w), i) => (i.toLong, k, w) }
        val df = in.toDF("id", "key", "w")
        val got = graft.operators.RankedSelection
          .rankAndCumsum(spark, df, "id", "key", "w")
          .select("id", "rank", "cum_weight").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
        var cum = 0L
        val want = in.sortBy { case (id, k, _) => (-k, id) }
          .zipWithIndex.map { case ((id, _, w), i) =>
            cum += w; (id, (i + 1).toLong, cum)
          }.sortBy(_._1).toArray
        assert(got.toSeq == want.toSeq,
          "histogram-decomposed rank/cumsum diverges from the naive window")
      }
    }
  }

  test("snake sharding: every rank appears once; totals within 2×max for ANY weights") {
    val gen = Gen.listOfN(48, Gen.choose(1L, 50L))
    forAll(gen) { ws =>
      val in = ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val df = in.toDF("id", "w")
      val got = graft.operators.RankedSelection
        .snakeShards(spark, df, "id", "w", 4)
        .select("id", "rank", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(_._2).sorted.toSeq == (1L to in.size.toLong).toSeq,
        "ranks are not a permutation of 1..n")
      val wById = in.toMap
      val totals = got.groupBy(_._3).view
        .mapValues(_.map(p => wById(p._1)).sum).values.toSeq
      assert(totals.max - totals.min <= 2 * ws.max,
        s"snake spread ${totals.max - totals.min} > 2×max ${2 * ws.max}")
    }
  }
}
