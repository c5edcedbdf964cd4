package graft

import org.apache.spark.sql.functions._

import graft.operators.{LlmSim, LlmText}

/** Golden tests for the LLM-data operators on hand-built corpora. */
class LlmSpec extends GraftSuite {
  import spark.implicits._

  test("exact dedup groups identical texts, keeps min doc_id") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "something else")).toDF("doc_id", "text")
    val out = LlmText.dedupExact(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("keep_id"), r.getAs[Int]("is_dup")))).toMap
    assert(out(1L) == ((1L, 0)))
    assert(out(2L) == ((1L, 1)))
    assert(out(3L) == ((3L, 0)))
  }

  test("cluster labels converge to the component min across chains") {
    // components: {1,2,3} (a chain — A~B, B~C but NOT A~C: the greedy
    // pair rule alone would keep both 1 and 3), {5,6}; 4 is isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val out = LlmText.clustersFromPairs(pairs, docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Int]("is_dup")))).toMap
    assert(out == Map(
      1L -> ((1L, 0)), 2L -> ((1L, 1)), 3L -> ((1L, 1)),
      4L -> ((4L, 0)), 5L -> ((5L, 0)), 6L -> ((5L, 1))))
  }

  test("canonical selection keeps the longest member, ties to min id") {
    // cluster 1: doc 3 is longest → keep; cluster 4: tie on length →
    // min doc_id (4) wins; cluster 7: singleton keeps itself
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L),
      (7L, 7L)).toDF("doc_id", "cluster_id")
    val sized = Seq(
      (1L, 10L), (2L, 12L), (3L, 20L),
      (4L, 8L), (5L, 8L),
      (7L, 3L)).toDF("doc_id", "n_tokens")
    val out = LlmText.canonicalFromClusters(clusters, sized)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_members"), r.getAs[Int]("keep")))).toMap
    assert(out == Map(
      1L -> ((3L, 0)), 2L -> ((3L, 0)), 3L -> ((3L, 1)),
      4L -> ((2L, 1)), 5L -> ((2L, 0)),
      7L -> ((1L, 1))))
  }

  test("dedupCanonical end-to-end: identical docs tie to the min id, " +
      "every cluster keeps exactly one") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9L, "unrelated totally different content here now")).toDF(
      "doc_id", "text")
    val rows = LlmText.dedupCanonical(docs).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Int]("keep")).toMap
    assert(byDoc == Map(1L -> 1, 2L -> 0, 9L -> 1))
    val perCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Int]("keep")).sum)
    assert(perCluster.forall(_._2 == 1),
      "every cluster must keep exactly one representative")
  }

  test("cluster labels match a BFS reference on random pair graphs") {
    val rnd = new scala.util.Random(42)
    // one seeded trial: each propagation round is a Spark job, and a
    // random graph's diameter makes this the suite's slowest test
    for (trial <- 1 to 1) {
      val n = 30
      val pairSeq = (1 to 25).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      // driver-side reference: BFS components, label = min member
      val adj = pairSeq.flatMap(p => Seq(p, p.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def component(s: Long): Set[Long] = {
        var seen = Set(s); var frontier = Set(s)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(v =>
            adj.getOrElse(v, Set.empty)) -- seen
          seen ++= frontier
        }
        seen
      }
      val expected = (0L until n).map(d =>
        d -> component(d).min).toMap
      val got = LlmText.clustersFromPairs(
        pairSeq.toDF("id_a", "id_b"),
        (0L until n).toDF("doc_id"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("cluster_id")).toMap
      assert(got == expected, s"trial $trial: $pairSeq")
    }
  }

  test("star-contraction components ≡ label propagation on random " +
      "graphs, and converge on a chain past the propagation guard") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val pairSeq = (1 to 35).map { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val prop = LlmText.clustersFromPairs(
      pairSeq.toDF("id_a", "id_b"), (0L until n).toDF("doc_id"))
      .select(col("doc_id"), col("cluster_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stars = LlmText.ccStars(pairSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ccStars emits only pair-touched nodes (non-minima); propagation
    // covers all docs — restrict and complete
    val starsFull = (0L until n).map(d =>
      d -> stars.getOrElse(d, d)).toMap
    assert(starsFull == prop)

    // a 140-node path: diameter 139 — the label-propagation operator's
    // 100-round guard would abort here; star contraction is O(log n)
    val chain = (0L until 139L).map(i => (i, i + 1))
    val got = LlmText.ccStars(chain.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 139L).foreach(i => assert(got(i) == 0L, s"node $i"))
  }

  test("reciprocal NN pairs match a single-threaded reference over " +
      "the trained cells") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val got = LlmSim.rnnPairs(emb)
      .as[(Long, Long, Double)].collect().toSet
    // reference: per-cell top-1 by (round(cos,6) DESC, id ASC), mutual
    val assigned = LlmSim.assignTrained(emb, exactFold = true,
        cellDims = graft.operators.LlmSim.IvfDims)
      .select(col("vec_id"), col("v"), col("norm"), col("cent_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getDouble(2), r.getString(3)))
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map(x => x._1 * x._2).sum
    val byCell = assigned.groupBy(_._4)
    val nn1 = byCell.values.flatMap { members =>
      members.map { m =>
        val others = members.filter(_._1 != m._1)
        if (others.isEmpty) m._1 -> None
        else {
          val best = others.map { o =>
            val c = BigDecimal(cos(m._2, o._2) / (m._3 * o._3))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            (o._1, c)
          }.minBy(x => (-x._2, x._1))
          m._1 -> Some(best)
        }
      }
    }.toMap
    val ref = nn1.collect {
      case (a, Some((b, c)))
        if a < b && nn1.get(b).flatten.exists(_._1 == a) => (a, b, c)
    }.toSet
    assert(got == ref)
  }

  test("near dedup finds a shifted copy and reports its jaccard") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val shifted = (0 to 30).map(i => s"w$i").mkString(" ") // 1 extra word
    val docs = Seq(
      (1L, base), (2L, shifted),
      (3L, (100 to 130).map(i => s"v$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val pairs = LlmText.dedupNear(docs).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    // base's 28 shingles are a subset of shifted's 29 -> J = 28/29
    assert(math.abs(r.getAs[Double]("jaccard") - 28.0 / 29.0) < 1e-6)
  }

  test("ngram dedup: finds the shifted copy, dominates LSH recall, caps df") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val shifted = (0 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, shifted),
      (3L, (100 to 130).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = LlmText.dedupNgram(docs).collect()
    assert(pairs.length == 1)
    val r = pairs.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(math.abs(r.getAs[Double]("jaccard") - 28.0 / 29.0) < 1e-6)
    // recall dominance: the inverted index catches every pair LSH does
    // (LSH has band-miss false negatives, ngram candidates don't)
    val corpus = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def ids(df: org.apache.spark.sql.DataFrame) = df.select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = ids(LlmText.dedupNear(corpus))
    val ng = ids(LlmText.dedupNgram(corpus))
    assert(lsh.subsetOf(ng), s"ngram must catch LSH's pairs: ${lsh -- ng}")
    // df cap: a gram in > NgramDfCap docs generates no candidates — 21
    // identical docs produce NO pairs (exact-dup boilerplate is
    // dedupExact's job; unbounded df would be a quadratic hot key)
    val boiler = (1L to 21L).map(i => (i, "same three words"))
      .toDF("doc_id", "text")
    assert(LlmText.dedupNgram(boiler).isEmpty)
    // corpus-relative cap: max(20, ceil(0.99·21)) = 21 readmits the
    // saturated gram — all 210 unordered pairs are found again
    assert(LlmText.dedupNgram(boiler, dfCapFraction = 0.99).count() == 210)
    // while ceil(f·N) under the absolute cap changes nothing
    assert(LlmText.dedupNgram(boiler, dfCapFraction = 0.5).isEmpty)
  }

  test("identical texts get identical simhash and fingerprint") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different content here with other words entirely"))
      .toDF("doc_id", "text")
    val sh = byKey(LlmText.simhash(docs), "doc_id", "simhash16")
    assert(sh("1") == sh("2"))
    assert(sh("1").asInstanceOf[String].length == 16)
    val fp = byKey(LlmText.fingerprint(docs), "doc_id", "fingerprint")
    assert(fp("1") == fp("2"))
    assert(fp("1") != fp("3"))
  }

  test("text stats on a known sentence") {
    val docs = Seq((1L, "The cat and the cat!")).toDF("doc_id", "text")
    val r = LlmText.textStats(docs).collect().head
    assert(r.getAs[Long]("n_tokens") == 5)
    assert(r.getAs[Long]("n_distinct_tokens") == 4) // the, cat, and, cat!
    assert(r.getAs[Long]("n_punct") == 1)
    assert(r.getAs[Long]("n_bpe_units") == 6) // 5 words + '!'
    assert(r.getAs[Long]("en_hits") == 3) // the, and, the
    assert(r.getAs[String]("lang_guess") == "en")
  }

  test("repetition screens: hand-computed fractions and flags") {
    val docs = Seq(
      (1L, "dup dup dup"), // twf 1, t2f min(1, 4/3)=1, d3f 0 → flagged
      (2L, "one"), // twf 1 > 0.10 → flagged; bigram/trigram guards = 0
      (3L, (1 to 20).map(i => s"w$i").mkString(" ")), // all distinct:
      // twf 0.05, t2f 0.1, d3f 0 — below every threshold → clean
      (4L, "x y x y x y x y x y")) // twf 0.5, top2 "x y"×5 → t2f 1
      .toDF("doc_id", "text")
    val r = LlmText.repetition(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Double]("top_word_frac") == 1.0)
    assert(r(1L).getAs[Double]("top2_frac") == 1.0)
    assert(r(1L).getAs[Double]("dup3_frac") == 0.0)
    assert(r(1L).getAs[Int]("repetitive") == 1)
    assert(r(2L).getAs[Double]("top2_frac") == 0.0)
    assert(r(2L).getAs[Double]("dup3_frac") == 0.0)
    assert(r(2L).getAs[Int]("repetitive") == 1)
    assert(r(3L).getAs[Double]("top_word_frac") == 0.05)
    assert(r(3L).getAs[Double]("top2_frac") == 0.1)
    assert(r(3L).getAs[Int]("repetitive") == 0)
    assert(r(4L).getAs[Double]("top_word_frac") == 0.5)
    assert(r(4L).getAs[Double]("top2_frac") == 1.0)
    // 10 tokens, 8 trigram positions, 2 distinct ("x y x", "y x y")
    assert(r(4L).getAs[Double]("dup3_frac") == 0.75)
    assert(r(4L).getAs[Int]("repetitive") == 1)
  }

  test("passesRepetition column agrees with repetition()'s flag") {
    val rnd = new scala.util.Random(31)
    val texts = (0 until 200).map { i =>
      if (i % 2 == 0) // distinct-token docs long enough to pass
        (0 until 12 + rnd.nextInt(20)).map(j => s"u${i}_$j").mkString(" ")
      else (0 until rnd.nextInt(25)).map(_ =>
        s"t${rnd.nextInt(1 + rnd.nextInt(12))}").mkString(" ")
    } :+ "" :+ "   " // 0-token docs: fail the column screen, and are
    // absent from repetition() output — both read as "rejected"
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val passCol = docs
      .filter(LlmText.passesRepetition(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val passOp = LlmText.repetition(docs)
      .filter(col("repetitive") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(passCol == passOp)
    assert(passCol.nonEmpty && passCol.size < texts.size,
      "fixture sanity: screens split the corpus")
  }

  test("knn ranks an identical vector first with cosine 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // same direction
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))  // opposite
      .toDF("vec_id", "embedding")
    val out = LlmSim.knnBrute(vecs)
      .filter(col("qid") === 0).orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getAs[Double]("cosine") == 1.0)
    assert(out.last.getAs[Double]("cosine") == -1.0)
  }

  test("contaminationEmbed flags only train-eval pairs over threshold") {
    // ids ≡ 0 mod 20 play the eval set; the rest are train
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),    // eval, x-axis
      (20L, Array(0.0f, 1.0f)),   // eval, y-axis
      (1L, Array(0.9f, 0.1f)),    // near eval 0
      (2L, Array(-1.0f, 0.0f)),   // opposite of eval 0
      (3L, Array(0.1f, 0.9f)))    // near eval 20
      .toDF("vec_id", "embedding")
    val out = LlmSim.contaminationEmbed(vecs, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id")) ->
        r.getAs[Double]("cosine")).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val near = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    // only the two near pairs survive; eval-eval and train-train pairs
    // are never emitted, nor is the anti-correlated train vector
    assert(out.keySet == Set((0L, 1L), (20L, 3L)))
    assert(out((0L, 1L)) == r6(near) && out((20L, 3L)) == r6(near))
  }

  test("contaminationEmbed matches a brute-force reference on random vectors") {
    val rnd = new scala.util.Random(424242)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 0 until 3) {
      val vecs = (0L until 60L).map(i =>
        (i, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat)))
      val out = LlmSim
        .contaminationEmbed(vecs.toDF("vec_id", "embedding"),
          threshold = 0.5)
        .collect()
        .map(r => (r.getAs[Long]("eval_id"), r.getAs[Long]("train_id")) ->
          r.getAs[Double]("cosine")).toMap
      // single-threaded reference: same cast, same left-to-right fold
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val ds = vecs.map { case (id, v) => id -> v.map(_.toDouble).toSeq }
      val norms = ds.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
        .toMap
      val dm = ds.toMap
      val expected = (for {
        (e, _) <- ds if e % 20 == 0
        (t, _) <- ds if t % 20 != 0
        c = r6(dot(dm(t), dm(e)) / (norms(t) * norms(e)))
        if c >= 0.5
      } yield (e, t) -> c).toMap
      assert(out == expected)
    }
  }

  test("contaminationEmbed catches pairs a cell-bucketed screen drops") {
    // train vector 1 sits across the sign boundary from eval 0 in dim 1
    // (different quantizer cell) yet is ~identical by cosine — the
    // recall case the scaladoc names as the reason the screen is exact
    val vecs = Seq(
      (0L, Array(0.001f, 1.0f, 1.0f, 1.0f)),
      (1L, Array(-0.001f, 1.0f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = LlmSim.contaminationEmbed(vecs).collect()
    assert(out.length == 1 &&
      out.head.getAs[Double]("cosine") > 0.99)
  }

  test("ivf probes only the query's sign cell") {
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f, 1.0f, 1.0f, 0.5f)),
      (20L, Array(1.0f, 1.0f, 1.0f, 1.0f, 0.9f)),  // same cell as 0
      (21L, Array(-1.0f, 1.0f, 1.0f, 1.0f, 0.9f))) // different cell
      .toDF("vec_id", "embedding")
    val out = LlmSim.knnIvf(vecs).filter(col("qid") === 0).collect()
    assert(out.map(_.getAs[Long]("vec_id")).toSet == Set(20L))
  }

  test("trained IVF: production avg centroids match the oracle-exact fold") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSet
    assert(key(LlmSim.knnIvfTrained(emb, exactFold = false)) ==
      key(LlmSim.knnIvfTrained(emb)),
      "avg-trained centroids must yield the same top-k at round(·,6)")
  }

  test("semDedup: one verdict per vector; cluster minima always kept") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.01")
    val out = LlmSim.semDedup(emb).collect()
    assert(out.length == emb.count())
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)
    // the (cent_sim, vec_id)-minimal member of a cluster has no valid
    // drop witness, so it must survive regardless of its neighbors
    val minima = out.groupBy(_.getAs[String]("cluster")).values.map(rs =>
      rs.minBy(r =>
        (r.getAs[Double]("cent_sim"), r.getAs[Long]("vec_id"))))
    assert(minima.forall(_.getAs[Boolean]("keep")))
    assert(out.exists(!_.getAs[Boolean]("keep")),
      "fixture sanity: the sf0.01 corpus must contain semantic dups")
  }

  test("semDedup keep verdicts match a single-threaded reference") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.01")
    val out = LlmSim.semDedup(emb).collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[String]("cluster"),
        r.getAs[Double]("cent_sim"), r.getAs[Boolean]("keep")))
    val vecs = emb.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def rnd6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val norm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }
    // re-derive every drop verdict from the drop rule, trusting only
    // the cluster assignment (already oracle-checked via llm_knn_ivf2)
    val expectedDropped = (for {
      members <- out.groupBy(_._2).values
      (idA, _, ca, _) <- members
      if members.exists { case (idB, _, cb, _) =>
        idB != idA &&
          rnd6(dot(vecs(idA), vecs(idB)) / (norm(idA) * norm(idB))) >=
            LlmSim.SemDedupThreshold &&
          (cb < ca || (cb == ca && idB < idA))
      }
    } yield idA).toSet
    assert(out.filterNot(_._4).map(_._1).toSet == expectedDropped)
  }

  test("fused kernel top-n equals the window ranking, grown dims") {
    // the gate exercises cellDims=4 only; the ScaleProbe scale claim
    // rests on grown codebooks, so pin kernel ≡ window at a larger k
    // too — full top-Nprobe ranking AND the nr=1 assignment slice
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.01")
    for (dims <- Seq(LlmSim.IvfDims, 6)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "cent_id", "sim_r", "nr").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getInt(3))).toSet
      val viaWindow = rows(LlmSim
        .trainedSimsWindow(emb, exactFold = false, cellDims = dims)
        .filter(col("nr") <= LlmSim.Nprobe))
      val viaKernel = rows(LlmSim
        .trainedSims(emb, exactFold = false, cellDims = dims))
      assert(viaKernel == viaWindow, s"cellDims=$dims")
      val assignKernel = LlmSim
        .assignTrained(emb, exactFold = false, cellDims = dims)
        .select("vec_id", "cent_id", "sim_r").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val assignWindow = viaWindow.filter(_._4 == 1)
        .map(t => (t._1, t._2, t._3))
      assert(assignKernel == assignWindow, s"cellDims=$dims nr=1")
    }
  }

  test("labelNoise flags a planted mislabel via its neighbors") {
    // cluster of three near-identical vectors: two labeled 1, the
    // planted suspect labeled 9; a far-away pair that agrees on 2
    val vecs = Seq(
      (1L, Array(1.0f, 0.01f, 0f, 0f), 1),
      (2L, Array(1.0f, 0.02f, 0f, 0f), 1),
      (3L, Array(1.0f, 0.03f, 0f, 0f), 9), // suspect
      (10L, Array(-1.0f, 0.01f, 0f, 0f), 2),
      (11L, Array(-1.0f, 0.02f, 0f, 0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = LlmSim.labelNoise(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("neigh_label"), r.getAs[Boolean]("agree"))).toMap
    assert(out(3L) == (1, false), "planted mislabel must be flagged")
    assert(out(1L) == (1, true) && out(2L) == (1, true))
    assert(out(10L) == (2, true) && out(11L) == (2, true))
  }

  test("labelNoise matches a single-threaded reference on the corpus") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.01")
    val out = LlmSim.labelNoise(emb).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Int]("label"), r.getAs[Int]("neigh_label"),
          r.getAs[Boolean]("agree"))).toMap
    val rows = emb.collect().map(r => (r.getAs[Long]("vec_id"),
      r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray,
      r.getAs[Int]("label")))
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def rnd6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cellOf(v: Array[Double]): String =
      (0 until LlmSim.IvfDims).map(i => if (v(i) >= 0) '1' else '0')
        .mkString
    val byCell = rows.groupBy { case (_, v, _) => cellOf(v) }
    val expected = (for {
      members <- byCell.values
      (id, v, lab) <- members
      neigh = members.filter(_._1 != id)
      if neigh.nonEmpty
    } yield {
      val n = math.sqrt(dotp(v, v))
      val top = neigh
        .map { case (nid, nv, nl) =>
          (rnd6(dotp(v, nv) / (n * math.sqrt(dotp(nv, nv)))), nid, nl)
        }
        .sortBy { case (c, nid, _) => (-c, nid) }
        .take(LlmSim.LabelK)
      val maj = top.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy { case (l, cnt) => (-cnt, l) }.head._1
      id -> ((lab, maj, maj == lab))
    }).toMap
    assert(out == expected)
    assert(out.values.exists(!_._3),
      "fixture sanity: the sf0.01 labels must contain disagreements")
  }

  test("semDedup: production avg centroids match the oracle-exact fold") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getBoolean(3)))
      .toSet
    assert(key(LlmSim.semDedup(emb, exactFold = false)) ==
      key(LlmSim.semDedup(emb)))
  }

  test("IVF recall ladder: more probes strictly buy recall, and the " +
    "trade-off is measured") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val brute = LlmSim.knnBrute(emb).filter(col("rank") <= 3).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect()
        .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      brute.map { case (q, b) =>
        got.getOrElse(q, Set.empty).intersect(b).size.toDouble / b.size
      }.sum / brute.size
    }
    val r1 = recallOf(LlmSim.knnIvf(emb))               // nprobe=1, seeds
    val r2 = recallOf(LlmSim.knnIvfTrained(emb))        // nprobe=2, trained
    val r4 = recallOf(LlmSim.knnIvfTrained(emb, nprobe = 4))
    // these synthetic near-RANDOM vectors are IVF's worst case (no
    // cluster structure for the codebook to exploit) — the point of
    // the ladder is that the nprobe knob monotonically buys recall at
    // proportional candidate cost, which must hold even here
    assert(r2 > r1, s"trained multi-probe $r2 <= single-cell $r1")
    assert(r4 > r2, s"nprobe=4 $r4 <= nprobe=2 $r2")
    assert(r4 >= 0.5, s"nprobe=4 should recover half of brute even " +
      s"on structureless vectors, got $r4")
  }

  test("hardNegatives: every pair crosses labels, and the label " +
    "filter actually changes some anchor's neighborhood") {
    val emb = graft.sources.Tables
      .embeddings(spark, "/root/testdata/sf0.001")
    val labels = emb.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val hard = LlmSim.hardNegatives(emb).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rank")))
    assert(hard.nonEmpty)
    hard.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"same-label pair ($q, $n)")
    }
    // unrestricted top-1 vs hard-negative top-1 must differ for at
    // least one anchor whose nearest neighbor shares its label —
    // otherwise the filter never bit on this corpus
    val knn1 = LlmSim.knnBrute(emb).filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("vec_id")).toMap
    val hard1 = hard.collect { case (q, n, 1L) => q -> n }.toMap
    assert(knn1.keySet == hard1.keySet,
      "every anchor keeps a top-1 after the label filter")
    assert(knn1.exists { case (q, n) =>
      labels(q) == labels(n) && hard1(q) != n },
      "fixture sanity: the label filter should displace some top-1")
  }
}
