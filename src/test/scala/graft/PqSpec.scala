package graft

import org.apache.spark.sql.functions._

import graft.operators.{LlmSim, Pq}

/** Product quantization: hand-built codebook/encode goldens, fixture
  * invariants, exactFold parity, and the ADC-vs-brute recall floor. */
class PqSpec extends GraftSuite {
  import spark.implicits._

  /** Two obvious clusters per subspace: vectors of all +1s and all
    * −1s. Each subspace sees cells '1111' and '0000'; codes rank
    * cells lexicographically, so 0000→0 and 1111→1. Centroids equal
    * the (identical) members, so reconstruction error is exactly 0. */
  private def twoClusterFixture = Seq(
    (1L, Array.fill(64)(1.0f)),
    (2L, Array.fill(64)(1.0f)),
    (3L, Array.fill(64)(-1.0f)),
    (4L, Array.fill(64)(-1.0f))).toDF("vec_id", "embedding")

  test("codebook ranks sign cells per subspace; encode assigns " +
      "cleanly separated clusters with zero reconstruction error") {
    val cb = Pq.codebook(twoClusterFixture).collect()
    assert(cb.length == Pq.M * 2, "two occupied cells per subspace")
    val byKey = cb.map(r => (r.getAs[Long]("s"), r.getAs[String]("cell"))
      -> r.getAs[Long]("code")).toMap
    (0L until Pq.M.toLong).foreach { s =>
      assert(byKey((s, "0" * Pq.SubCellDims)) == 0L)
      assert(byKey((s, "1" * Pq.SubCellDims)) == 1L)
    }
    val codes = Pq.encode(twoClusterFixture).collect()
    assert(codes.length == 4 * Pq.M)
    codes.foreach { r =>
      val expected = if (r.getAs[Long]("vec_id") <= 2L) 1L else 0L
      assert(r.getAs[Long]("code") == expected)
      assert(r.getAs[Double]("l2sq") == 0.0)
    }
  }

  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("encode emits exactly one code per (vec_id, subspace), " +
      "codes within the byte range") {
    val n = embs.count()
    val out = Pq.encode(embs)
    assert(out.count() == n * Pq.M)
    assert(out.groupBy("vec_id", "s").count()
      .filter(col("count") =!= 1).count() == 0)
    assert(out.filter(col("code") < 0 || col("code") >= 256).count() == 0)
    assert(out.filter(col("l2sq") < 0).count() == 0)
  }

  test("search: ranks are 1..k per query, distance non-decreasing " +
      "in rank, no self pairs") {
    val rows = Pq.search(embs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val dists = sorted.map(_.getAs[Double]("dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("exactFold=false (production avg/sum path) agrees with the " +
      "gate's ordered fold far below the ranking granularity") {
    val a = Pq.search(embs, exactFold = true)
      .select(col("qid"), col("vec_id"), col("dist").as("da"))
    val b = Pq.search(embs, exactFold = false)
      .select(col("qid"), col("vec_id"), col("dist").as("db"))
    val joined = a.join(b, Seq("qid", "vec_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("da") - r.getAs[Double]("db"))
        <= 2e-6)
    }
  }

  test("ADC top-k recalls a meaningful share of the exact brute " +
      "top-k on the fixture corpus") {
    val k = Pq.PqTopK
    val exact = LlmSim.knnBrute(embs).filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"))
    val approx = Pq.search(embs)
      .select(col("qid"), col("vec_id"))
    val nQueries = exact.select("qid").distinct().count()
    val hits = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .count()
    val recall = hits.toDouble / (nQueries * k)
    info(f"ADC recall@$k vs brute: $recall%.4f")
    // measured 0.227 at 16 codes/subspace, 0.413 at the shipped 256 —
    // pin roughly half the measured value so the test tracks gross
    // regressions (a quantizer break), not fixture noise
    assert(recall >= 0.2, s"ADC recall@$k collapsed: $recall")
  }

  test("native PQ kernels match the composable column formulation " +
      "bit-for-bit (incl. Catalyst round parity)") {
    val (cvsL, bbsL) = Pq.localCodebook(Pq.codebook(embs))
    def gd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    val rows = Pq.subvecs(embs)
      .withColumn("aa", gd(col("sv"), col("sv")))
      .withColumn("draw", zip_with(
        element_at(cvsL, (col("s") + lit(1)).cast("int")),
        element_at(bbsL, (col("s") + lit(1)).cast("int")),
        (cv, bb) => col("aa") - lit(2.0) * gd(col("sv"), cv) + bb))
      .withColumn("dists", transform(col("draw"), d => round(d, 6)))
      .withColumn("l2sq_ref", array_min(col("dists")))
      .withColumn("code_ref",
        (array_position(col("dists"), col("l2sq_ref")) - 1).cast("long"))
      .withColumn("pds_ref", transform(col("draw"),
        d => round(d * lit(1e9)).cast("long")))
      .withColumn("m", call_function("graft_pq_assign",
        col("s"), col("sv"), cvsL, bbsL))
      .withColumn("pds", call_function("graft_pq_lut",
        col("s"), col("sv"), cvsL, bbsL))
      .select(col("m.code").as("code"), col("code_ref"),
        col("m.l2sq").as("l2sq"), col("l2sq_ref"),
        col("pds"), col("pds_ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("code") == r.getAs[Long]("code_ref"))
      assert(r.getAs[Double]("l2sq") == r.getAs[Double]("l2sq_ref"))
      assert(r.getAs[scala.collection.Seq[Long]]("pds") ==
        r.getAs[scala.collection.Seq[Long]]("pds_ref"))
    }
  }

  test("fused whole-vector kernels (graft_pq_pack / graft_pq_lut_all) " +
      "equal the per-subspace kernels bit-for-bit") {
    val (cvsL, bbsL) = Pq.localCodebook(Pq.codebook(embs))
    def gd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    val rows = embs
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(gd(col("v"), col("v"))))
      .withColumn("vn", when(col("nrm") > 0,
        transform(col("v"), x => x / col("nrm"))).otherwise(col("v")))
      .withColumn("pk", call_function("graft_pq_pack",
        col("vn"), cvsL, bbsL))
      .withColumn("la", call_function("graft_pq_lut_all",
        col("vn"), cvsL, bbsL))
      .withColumn("packed_ref",
        (0 until Pq.M).map(s => shiftleft(
          call_function("graft_pq_assign", lit(s.toLong),
            slice(col("vn"), s * Pq.SubDim + 1, Pq.SubDim), cvsL, bbsL)
            .getField("code"), 8 * s)).reduce(_ bitwiseOR _))
      .withColumn("l2sq_ref",
        (0 until Pq.M).map(s =>
          call_function("graft_pq_assign", lit(s.toLong),
            slice(col("vn"), s * Pq.SubDim + 1, Pq.SubDim), cvsL, bbsL)
            .getField("l2sq")).reduce(_ + _))
      .withColumn("lut_ref", array((0 until Pq.M).map(s =>
        call_function("graft_pq_lut", lit(s.toLong),
          slice(col("vn"), s * Pq.SubDim + 1, Pq.SubDim),
          cvsL, bbsL)): _*))
      .select(col("pk.packed").as("packed"), col("packed_ref"),
        col("pk.l2sq_sum").as("l2sq_sum"), col("l2sq_ref"),
        col("la"), col("lut_ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("packed") == r.getAs[Long]("packed_ref"))
      assert(r.getAs[Double]("l2sq_sum") == r.getAs[Double]("l2sq_ref"))
      assert(r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]]("la")
        == r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]](
          "lut_ref"))
    }
  }

  test("searchIvf: candidates come only from probed cells, distances " +
      "equal the full ADC search, ranks well-formed") {
    val out = Pq.searchIvf(embs).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val dists = sorted.map(_.getAs[Double]("dist"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    // pruning: every returned pair shares one of the query's probed
    // cells with the candidate's assigned cell
    val sims = LlmSim.trainedSims(embs, exactFold = true)
    val corpusCell = sims.filter(col("nr") === 1)
      .select("vec_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val probed = sims.filter(col("nr") <= LlmSim.Nprobe)
      .select("vec_id", "cent_id").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val cand = r.getAs[Long]("vec_id")
      assert(probed(qid).contains(corpusCell(cand)),
        s"pair ($qid, $cand) crosses an unprobed cell")
    }
    // compressed-distance parity: a candidate's IVF-PQ dist equals
    // its full-ADC dist (same codes, same LUT)
    val full = Pq.search(embs, k = Int.MaxValue)
      .select(col("qid"), col("vec_id"), col("dist").as("dist_full"))
    val joined = Pq.searchIvf(embs)
      .join(full, Seq("qid", "vec_id")).collect()
    assert(joined.length == out.length)
    joined.foreach(r => assert(
      r.getAs[Double]("dist") == r.getAs[Double]("dist_full")))
  }

  test("kernel edges: null inputs propagate, unsorted codebook ids " +
      "are rejected, n beyond the cell count truncates") {
    import org.apache.spark.sql.functions.{typedLit, lit => flit}
    val ids = typedLit(Seq("a", "b"))
    val cvs = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val nrm = typedLit(Seq(1.0, 1.0))
    val base = Seq((1L, Seq(1.0, 0.0), 1.0))
      .toDF("vec_id", "v", "norm")
    // n > cells: both centroids returned, ranked
    val both = base.select(call_function("graft_ivf_topn",
        col("v"), col("norm"), ids, cvs, nrm, flit(5)).as("t"))
      .selectExpr("inline(t)").collect()
    assert(both.map(r =>
      (r.getAs[String]("cent_id"), r.getAs[Double]("sim_r"))).toSeq ==
      Seq(("a", 1.0), ("b", 0.0)))
    // null vector → null result
    val nullV = base.select(call_function("graft_ivf_topn",
      typedLit[Seq[Double]](null), col("norm"), ids, cvs, nrm,
      flit(1)).as("t")).collect()
    assert(nullV.head.isNullAt(0))
    // unsorted codebook ids must be rejected loudly, not mis-ranked
    val bad = intercept[Exception] {
      base.select(call_function("graft_ivf_topn", col("v"),
        col("norm"), typedLit(Seq("b", "a")), cvs, nrm, flit(1)))
        .collect()
    }
    assert(bad.getMessage != null)
    // PQ assign: null subvector → null struct
    val (cvsL, bbsL) = Pq.localCodebook(Pq.codebook(twoClusterFixture))
    val nullSv = Seq((0L, null.asInstanceOf[Seq[Double]]))
      .toDF("s", "sv")
      .select(call_function("graft_pq_assign",
        col("s"), col("sv"), cvsL, bbsL).as("m")).collect()
    assert(nullSv.head.isNullAt(0))
  }

  test("production path (exactFold=false) returns the SAME top-k rows " +
      "as the oracle path for search and searchIvf") {
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(triples(Pq.search(embs, exactFold = false)) ==
      triples(Pq.search(embs, exactFold = true)))
    assert(triples(Pq.searchIvf(embs, exactFold = false)) ==
      triples(Pq.searchIvf(embs, exactFold = true)))
  }

  test("dedupEmbedPq: exact-bound mode is a drop-in for dedupEmbed " +
      "(identical rows); margin mode never emits a false pair and " +
      "its fixture recall is audited") {
    val exact = LlmSim.dedupEmbed(embs).collect().map(_.toSeq).toSet
    val viaPq = LlmSim.dedupEmbedPq(embs).collect().map(_.toSeq).toSet
    assert(viaPq === exact,
      "triangle-bound prefilter must be lossless")
    val fast = LlmSim.dedupEmbedPq(embs, exactBound = false)
      .collect().map(_.toSeq).toSet
    assert(fast.subsetOf(exact),
      "margin mode shares the exact verify — no false pairs possible")
    if (exact.size >= 4) {
      val recall = fast.size.toDouble / exact.size
      info(f"margin-mode recall vs exact: $recall%.3f " +
        f"(${fast.size}/${exact.size})")
      assert(recall >= 0.5,
        s"debiased-SDC prefilter lost most true pairs: $recall")
    } else info(s"exact pair set too small to audit recall " +
      s"(${fast.size}/${exact.size} found)")
  }

  test("dedupEmbedPq equals dedupEmbed on poisoned input too: " +
      "non-finite vectors are pre-dropped, not thrown on") {
    val poisoned = embs.select(col("vec_id"), col("embedding"))
      .limit(80)
      .unionByName(Seq(
        (900001L, Array.fill(64)(Float.NaN)),
        (900002L, Array.fill(64)(Float.PositiveInfinity)),
        (900003L, Array.tabulate(64)(i =>
          if (i == 3) Float.NaN else 0.2f)))
        .toDF("vec_id", "embedding"))
    val exact = LlmSim.dedupEmbed(poisoned).collect().map(_.toSeq).toSet
    val viaPq = LlmSim.dedupEmbedPq(poisoned).collect().map(_.toSeq).toSet
    assert(viaPq === exact,
      "degenerate rows must be dropped to identity, not crash the kernel")
  }

  test("degenerate vectors: NaN subvector fails the encode loudly; " +
      "dim mismatch against the codebook fails loudly") {
    val (cvsL, bbsL) = Pq.localCodebook(Pq.codebook(twoClusterFixture))
    val nanEx = intercept[Exception] {
      Seq((0L, Seq(Double.NaN) ++ Seq.fill(7)(0.5)))
        .toDF("s", "sv")
        .select(call_function("graft_pq_assign",
          col("s"), col("sv"), cvsL, bbsL)).collect()
    }
    assert(nanEx.getMessage.contains("NaN") ||
      (nanEx.getCause != null && nanEx.getCause.getMessage.contains("NaN")),
      s"want a loud NaN message, got: ${nanEx.getMessage}")
    val dimEx = intercept[Exception] {
      Seq((0L, Seq(0.5, 0.5))) // SubDim=8 codebook, 2-dim subvector
        .toDF("s", "sv")
        .select(call_function("graft_pq_assign",
          col("s"), col("sv"), cvsL, bbsL)).collect()
    }
    assert(dimEx.getMessage.contains("dimension") ||
      (dimEx.getCause != null &&
        dimEx.getCause.getMessage.contains("dimension")),
      s"want a loud dim message, got: ${dimEx.getMessage}")
  }

  test("zero-norm and NaN embeddings are excluded from the IVF index " +
      "instead of crashing the fused scan") {
    import org.apache.spark.sql.functions.{typedLit, lit => flit}
    // kernel level: zero vector (all sims NaN) → empty array; a norm-0
    // row with nonzero v (sims ±Inf) → empty as well
    val ids = typedLit(Seq("a", "b"))
    val cvs = typedLit(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val nrm = typedLit(Seq(1.0, 1.0))
    val degenerate = Seq(
      (Seq(0.0, 0.0), 0.0), (Seq(1.0, 0.0), 0.0)).toDF("v", "norm")
      .select(size(call_function("graft_ivf_topn",
        col("v"), col("norm"), ids, cvs, nrm, flit(2))).as("n"))
      .collect()
    assert(degenerate.forall(_.getInt(0) == 0))
    // operator level: one zero and one NaN vector among a real corpus;
    // knnIvfTrained must complete, exclude them, and keep the rest
    val mixed = Seq(
      (0L, Array.fill(64)(0.1f)), (1L, Array.fill(64)(-0.2f)),
      (2L, Array.tabulate(64)(i => if (i % 2 == 0) 0.3f else -0.1f)),
      (7L, Array.fill(64)(0.0f)),
      (9L, Array.fill(64)(Float.NaN)),
      (20L, Array.tabulate(64)(i => 0.01f * i - 0.3f)))
      .toDF("vec_id", "embedding")
    val out = LlmSim.knnIvfTrained(mixed).collect()
    val outIds = out.map(_.getAs[Long]("vec_id")).toSet ++
      out.map(_.getAs[Long]("qid")).toSet
    assert(!outIds.contains(7L) && !outIds.contains(9L),
      s"degenerate vectors leaked into the index: $outIds")
    assert(out.nonEmpty, "healthy vectors must still match")
  }

  test("annRecall honors k past the serving default on BOTH sides") {
    val k = 5 // > IvfTopK = 3, the silently-understated case
    val out = LlmSim.annRecall(embs, k = k).collect()
    val exact = LlmSim.knnBrute(embs, k).select(col("qid"), col("vec_id"))
    val approx = LlmSim
      .knnIvfTrained(embs, k = k).select(col("qid"), col("vec_id"))
    val expected = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").count().collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("count")).toMap
    assert(out.length == exact.select("qid").distinct().count())
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      assert(r.getAs[Long]("n_hits") == expected.getOrElse(qid, 0L))
      assert(r.getAs[Double]("recall") ==
        BigDecimal(expected.getOrElse(qid, 0L) / k.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the approx side genuinely ranks k deep now: at least one query
    // must score an n_hits above the old IvfTopK ceiling OR every
    // n_hits is witnessed by the k-deep intersection built above —
    // which the equality loop already proved
    assert(out.forall(_.getAs[Long]("n_hits") <= k))
  }

  test("annRecall: one row per query, n_hits consistent with a " +
      "direct intersection, recall in [0,1]") {
    val out = LlmSim.annRecall(embs).collect()
    val exact = LlmSim.knnBrute(embs)
      .filter(col("rank") <= LlmSim.IvfTopK)
      .select(col("qid"), col("vec_id"))
    val approx = LlmSim.knnIvfTrained(embs)
      .select(col("qid"), col("vec_id"))
    val expected = exact.join(approx, Seq("qid", "vec_id"), "left_semi")
      .groupBy("qid").count().collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("count")).toMap
    assert(out.length == exact.select("qid").distinct().count())
    out.foreach { r =>
      val qid = r.getAs[Long]("qid")
      assert(r.getAs[Long]("n_hits") == expected.getOrElse(qid, 0L))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
