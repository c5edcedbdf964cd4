package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.operators.{LlmCorpus, LlmSim}

/** Golden tests for the corpus export/quality operators
  * (shuffle-shard assignment, unigram-LM scoring, duplicated-span
  * detection, int8 quantization audit) with independently computed
  * answers. */
class LlmCorpusSpec extends GraftSuite {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("shuffleShards matches an independent hash computation") {
    val docs = (0L until 40L).map(i => (i, s"tok$i text"))
      .toDF("doc_id", "text")
    val out = LlmCorpus.shuffleShards(docs, nShards = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[Long]("seq")))).toMap
    // independent single-threaded transcription of the contract
    val expected = (0L until 40L).map { i =>
      val h = md5hex(s"shard:$i")
      val shard = java.lang.Long.parseLong(h.substring(0, 4), 16) % 4
      (i, shard, h.substring(4))
    }
    val expMap = expected.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(t => (t._3, t._1)).zipWithIndex
        .map { case ((i, s, _), k) => i -> ((s, k + 1L)) }
    }
    assert(out == expMap)
    // every doc present exactly once; seq contiguous from 1 per shard
    assert(out.size == 40)
    out.values.groupBy(_._1).foreach { case (_, seqs) =>
      assert(seqs.map(_._2).toSeq.sorted == (1L to seqs.size).toSeq)
    }
  }

  test("shuffleShards emits token counts") {
    val docs = Seq((1L, "a b  c"), (2L, "")).toDF("doc_id", "text")
    val n = LlmCorpus.shuffleShards(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    assert(n == Map(1L -> 3L, 2L -> 0L))
  }

  test("unigramLm hand-computed smoothed log-probs") {
    // counts: a=2 b=2 c=1; N=5, V=3 → p(a)=p(b)=3/8, p(c)=2/8
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = LlmCorpus.unigramLm(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("ppl")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // same op order as the operator: ln(c+1) - ln(N+V) per token
    val lpA = math.log(3.0) - math.log(8.0)
    val lpC = math.log(2.0) - math.log(8.0)
    val lp2 = (lpA + lpC) / 2
    assert(out(1L) == ((3L, r6(lpA), r6(math.exp(-lpA)))))
    assert(out(2L) == ((2L, r6(lp2), r6(math.exp(-lp2)))))
  }

  test("substrDup flags shared token spans regardless of offset") {
    // docs 1 and 2 share a verbatim 5-token span at DIFFERENT offsets;
    // doc 3 is unique. n = 4 → the shared span contributes 2 shared
    // 4-grams to each doc.
    val span = "v w x y z"
    val docs = Seq(
      (1L, s"$span p q r"),         // grams: 5 distinct 4-grams
      (2L, s"m $span n"),           // shifted by one token
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = LlmCorpus.substrDup(docs, n = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup")))).toMap
    // "v w x y" and "w x y z" are the only grams in both docs
    assert(out(1L) == ((5L, 2L)))
    assert(out(2L) == ((4L, 2L)))
    assert(out(3L) == ((3L, 0L)))
  }

  test("substrDup drops docs shorter than the gram length") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val ids = LlmCorpus.substrDup(docs, n = 4).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(2L))
  }

  test("embedQuant matches a single-threaded transcription") {
    val docs = Seq((1L, Array(1.0f, -0.5f, 0.25f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = LlmSim.embedQuant(docs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dims"), r.getAs[Double]("scale"),
          r.getAs[Double]("rms_err")))).toMap
    // transcription of the contract in the operator's own op order
    val v = Seq(1.0f, -0.5f, 0.25f).map(_.toDouble)
    val s = v.map(math.abs).max / 127
    val errs = v.map(x => x - math.floor(x / s + 0.5) * s)
    val rms = math.sqrt(errs.foldLeft(0.0)((a, e) => a + e * e) / 3)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((3L, r6(s), r6(rms))))
    assert(out(2L) == ((2L, 0.0, 0.0)), "zero vector quantizes exactly")
  }

  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("qualityClf matches a single-threaded naive-Bayes reference") {
    val corpus = Seq(
      (1L, "good good clean", "srcA"),
      (2L, "good spam", "srcA"),
      (3L, "spam spam junk", "srcB"),
      (4L, "clean junk", "srcB"))
    val docs = corpus.toDF("doc_id", "text", "source")
    val out = LlmCorpus.qualityClf(docs, trusted = Seq("srcA")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("score"),
          r.getAs[Boolean]("pred")))).toMap
    // single-threaded reference over the same contract
    val toks = corpus.map { case (id, t, s) =>
      (id, t.split("\\s+").toSeq, s == "srcA")
    }
    val cPos = toks.filter(_._3).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cNeg = toks.filterNot(_._3).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = (cPos.keySet ++ cNeg.keySet)
    val (nPos, nNeg, v) = (cPos.values.sum, cNeg.values.sum,
      vocab.size.toLong)
    val prior = math.log(2.0) - math.log(2.0)
    def lo(t: String) =
      math.log(cPos.getOrElse(t, 0L) + 1.0) - math.log(nPos + v.toDouble) -
        math.log(cNeg.getOrElse(t, 0L) + 1.0) + math.log(nNeg + v.toDouble)
    toks.foreach { case (id, ts, _) =>
      val score = prior + ts.map(lo).sum
      assert(out(id)._1 == ts.size.toLong)
      assert(math.abs(out(id)._2 - score) < 1e-6, s"doc $id")
      assert(out(id)._3 == (score > 0), s"doc $id pred")
    }
    // trusted-language docs score positive, junk-heavy ones negative
    assert(out(1L)._3 && !out(3L)._3)
  }

  test("nbScore gives unseen tokens the smoothed floor odds") {
    val train = Seq(
      (1L, "good clean", "srcA"),
      (2L, "spam junk", "srcB")).toDF("doc_id", "text", "source")
    val cnt = LlmCorpus.nbCounts(train, Seq("srcA"))
    val stats = LlmCorpus.nbStats(train, cnt, Seq("srcA"))
    val fresh = Seq((9L, "novel novel")).toDF("doc_id", "text")
    val out = LlmCorpus.nbScore(fresh, cnt, stats).collect()
    assert(out.length == 1)
    // c_pos = c_neg = 0, n_pos = n_neg = 2, V = 4 → every term of the
    // log-odds cancels pairwise; prior ln(1/1) = 0 → score exactly 0,
    // pred false (strict >)
    assert(out.head.getAs[Double]("score") == 0.0)
    assert(!out.head.getAs[Boolean]("pred"))
  }

  test("keywords ranks by tf-idf with term tiebreak") {
    val docs = Seq(
      (1L, "alpha alpha common beta"),
      (2L, "common beta"),
      (3L, "common gamma gamma gamma"),
      (4L, "zed yed")).toDF("doc_id", "text")
    val out = LlmCorpus.keywords(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
        ((r.getAs[String]("term"), r.getAs[Double]("tfidf")))).toMap
    // N=4; df: common=3 beta=2 alpha=1 gamma=1 zed=1 yed=1
    def idf(df: Long) = math.log(5.0 / (df + 1.0)) + 1.0
    assert(out((1L, 1L)) == (("alpha", r6(2 * idf(1)))))
    assert(out((1L, 2L)) == (("beta", r6(idf(2)))))
    assert(out((1L, 3L)) == (("common", r6(idf(3)))))
    assert(out((3L, 1L)) == (("gamma", r6(3 * idf(1)))))
    assert(out((3L, 2L)) == (("common", r6(idf(3)))))
    // doc 4: zed and yed tie on tfidf → term-asc breaks it
    assert(out((4L, 1L))._1 == "yed" && out((4L, 2L))._1 == "zed")
    // doc 2 has only two terms — no rank 3 row
    assert(!out.contains((2L, 3L)) && out((2L, 1L))._1 == "beta")
  }

  test("vocabEncode maps tokens to vocab ranks with OOV id 0") {
    val docs = Seq((1L, "b a b c b a"), (2L, "a d")).toDF("doc_id", "text")
    // counts: a=3 b=3 c=1 d=1; k=2 → vocab rank 1 = a, 2 = b
    // (count desc, token asc); c and d are out-of-vocabulary
    val out = LlmCorpus.vocabEncode(docs, k = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")) ->
        r.getAs[Long]("token_id")).toMap
    assert(out == Map(
      (1L, 1L) -> 2L, (1L, 2L) -> 1L, (1L, 3L) -> 2L,
      (1L, 4L) -> 0L, (1L, 5L) -> 2L, (1L, 6L) -> 1L,
      (2L, 1L) -> 1L, (2L, 2L) -> 0L))
  }

  test("curationReport flags agree with each component operator") {
    import graft.operators.{LlmSim, LlmText}
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val embs = graft.sources.Tables.embeddings(spark, sf)
    val out = LlmCorpus.curationReport(docs, embs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("text_kept"), r.getAs[Boolean]("clf_kept"),
          r.getAs[Boolean]("sem_kept"),
          r.getAs[Boolean]("contaminated"),
          r.getAs[Boolean]("kept")))).toMap
    // one row per document, no dup spine rows from the joins
    assert(out.size == docs.count())
    val text = LlmText.curate(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val clf = LlmCorpus.qualityClf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pred"))
      .toMap
    val sem = LlmSim.semDedup(embs).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("keep"))
      .toMap
    val contam = LlmSim.contaminationEmbed(embs).collect()
      .map(_.getAs[Long]("train_id")).toSet
    out.foreach { case (id, (tk, ck, sk, ct, kept)) =>
      assert(tk == text.contains(id), s"text $id")
      assert(ck == clf.getOrElse(id, false), s"clf $id")
      assert(sk == sem.getOrElse(id, false), s"sem $id")
      assert(ct == contam.contains(id), s"contam $id")
      assert(kept == (tk && ck && sk && !ct), s"kept $id")
    }
    // the report must be a real filter, not all-true/all-false
    assert(out.values.exists(_._5) && !out.values.forall(_._5))
  }

  test("vocabEncode positions are 1-based and contiguous per doc") {
    val docs = Seq((1L, "x  y\tz"), (2L, "")).toDF("doc_id", "text")
    val pos = LlmCorpus.vocabEncode(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("pos")).sorted.toSeq).toMap
    assert(pos == Map(1L -> Seq(1L, 2L, 3L)), "empty doc emits no rows")
  }

  test("pplBucket matches a driver-side ntile over (ppl, doc_id)") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = LlmCorpus.pplBucket(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Double]("ppl"),
          r.getAs[String]("bucket")))).toMap
    // independent transcription of ntile(3): the first (n mod 3)
    // rank-chunks take ceil(n/3) rows, the rest floor(n/3)
    val expected = out.toSeq.groupBy(_._2._1).flatMap { case (_, g) =>
      val sorted = g.sortBy { case (id, (_, ppl, _)) => (ppl, id) }
      val n = sorted.size
      val (big, rem) = (n / 3 + 1, n % 3)
      sorted.zipWithIndex.map { case ((id, _), i) =>
        val tile =
          if (i < big * rem) i / big
          else rem + (i - big * rem) / (n / 3)
        id -> Seq("head", "middle", "tail")(tile)
      }
    }
    out.foreach { case (id, (_, _, b)) =>
      assert(b == expected(id), s"doc $id")
    }
    // scoreable docs only, same universe as the LM scorer
    assert(out.size == LlmCorpus.unigramLm(docs).count())
  }

  test("pplBucketByCutoff agrees with the exact terciles away from " +
    "the cutoffs and is monotone in ppl within a language") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val exact = LlmCorpus.pplBucket(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    val approx = LlmCorpus.pplBucketByCutoff(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Double]("ppl"),
          r.getAs[String]("bucket")))).toMap
    assert(approx.keySet == exact.keySet)
    // monotone: ordering docs of one lang by ppl never goes back to an
    // earlier bucket (head < middle < tail)
    val rank = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    approx.toSeq.groupBy(_._2._1).foreach { case (lang, g) =>
      val byPpl = g.sortBy { case (id, (_, ppl, _)) => (ppl, id) }
        .map { case (_, (_, _, b)) => rank(b) }
      assert(byPpl == byPpl.sorted, s"non-monotone buckets in $lang")
    }
    // boundary rows may land one bucket over (rank cut vs value cut);
    // everything else must agree
    val agree = approx.count { case (id, (_, _, b)) => exact(id) == b }
    assert(agree >= (approx.size * 0.9).toInt,
      s"only $agree/${approx.size} agree with the exact terciles")
  }

  test("domainMix hand fixture: named share, even leftover, weights") {
    val docs = Seq(
      (1L, "a b c d e f", "A"), (2L, "a b", "B"), (3L, "a b", "C"))
      .toDF("doc_id", "text", "source")
    val out = LlmCorpus.domainMix(docs, Map("A" -> 0.5)).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("token_share"), r.getAs[Double]("target_share"),
          r.getAs[Double]("weight")))).toMap
    assert(out("A") == ((1L, 6L, 0.6, 0.5, 0.833333)))
    assert(out("B") == ((1L, 2L, 0.2, 0.25, 1.25)))
    assert(out("C") == ((1L, 2L, 0.2, 0.25, 1.25)))
    // realized mix under the weights IS the target: sum of
    // token_share × weight recovers each target share, total 1
    val realized = out.values.map(v => v._3 * v._5).sum
    assert(math.abs(realized - 1.0) < 1e-6)
  }

  test("pplBucketByCutoff keeps NULL-lang documents and buckets them " +
    "as their own group, like the exact form") {
    val docs = Seq[(java.lang.Long, String, String)](
      (1L, "a a a b", "en"), (2L, "a b b b", "en"), (3L, "c c d", "en"),
      (4L, "a a b b", null), (5L, "c d d d", null), (6L, "a c d b", null))
      .toDF("doc_id", "text", "lang")
    val exact = LlmCorpus.pplBucket(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val approx = LlmCorpus.pplBucketByCutoff(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    // a plain equi-join on lang would silently drop docs 4-6
    assert(approx.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(approx.keySet == exact)
    // NULL-lang docs form their own tercile universe: at least one of
    // them heads it (cutoffs came from the NULL group, not from 'en')
    assert(Set(4L, 5L, 6L).exists(id => approx(id) == "head"))
  }

  test("domainMix rejects an all-named target whose shares do not " +
    "sum to 1") {
    val docs = Seq((1L, "a b", "A"), (2L, "c d", "B"))
      .toDF("doc_id", "text", "source")
    val e = intercept[Exception] { quietly {
      LlmCorpus.domainMix(docs, Map("A" -> 0.3, "B" -> 0.2)).collect()
    } }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" ")
    assert(chain.contains("absorb"), chain)
    // all-named summing to 1 is fine
    val ok = LlmCorpus.domainMix(docs, Map("A" -> 0.75, "B" -> 0.25))
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("target_share")).toMap
    assert(ok == Map("A" -> 0.75, "B" -> 0.25))
  }

  test("domainMixFromProfile over split shard profiles equals the " +
    "corpus-scan domainMix") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, sf)
    val target = LlmCorpus.MixTargets.toMap
    val direct = LlmCorpus.domainMix(docs, target).collect()
      .map(r => r.getAs[String]("source") -> r.toSeq).toMap
    // profile built in three disjoint batches, shard rows unioned raw
    // — the StreamingProfile layout
    val shards = Seq(0, 1, 2).map(i =>
        LlmCorpus.profileSketch(docs.filter(col("doc_id") % 3 === i)))
      .reduce(_ unionByName _)
    val viaProfile = LlmCorpus.domainMixFromProfile(shards, target)
      .collect().map(r => r.getAs[String]("source") -> r.toSeq).toMap
    assert(viaProfile == direct)
  }

  test("domainMix fails loudly on an absent named source and a " +
    "malformed target") {
    val docs = Seq((1L, "a", "A")).toDF("doc_id", "text", "source")
    val e = intercept[Exception] { quietly {
      LlmCorpus.domainMix(docs, Map("A" -> 0.2, "ZZZ" -> 0.1)).collect()
    } }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" ")
    assert(chain.contains("absent"), chain)
    intercept[IllegalArgumentException] {
      LlmCorpus.domainMix(docs, Map("A" -> 0.7, "B" -> 0.7))
    }
  }

  test("tfidfPairs: hand-computed cosines; EVERY doc gets a ranked list") {
    val docs = Seq((1L, "apple banana"), (2L, "apple cherry"),
      (3L, "banana cherry"), (4L, "durian")).toDF("doc_id", "text")
    // every shared term has df=2, tf=1 → each pair shares exactly one
    // term of equal weight w: cos = w² / (√2·w · √2·w) = 0.5. Directed
    // output: each of docs 1–3 ranks BOTH its partners (tie on cosine
    // breaks to the smaller nbr); doc 3 must have a list too — an
    // id_a<id_b dedup would leave the max-id doc listless
    val got = LlmCorpus.tfidfPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (1L, 2L, 0.5, 1L), (1L, 3L, 0.5, 2L),
      (2L, 1L, 0.5, 1L), (2L, 3L, 0.5, 2L),
      (3L, 1L, 0.5, 1L), (3L, 2L, 0.5, 2L)))
  }

  test("tfidfPairs: tf weighting matches a hand-computed cosine") {
    val docs = Seq((1L, "x x y"), (2L, "x y")).toDF("doc_id", "text")
    // idf = ln(3/3)+1 = 1 for both terms; vectors (2,1) and (1,1):
    // cos = 3 / (√5·√2) = 0.9486832… — emitted in both directions
    val got = LlmCorpus.tfidfPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((1L, 2L, 0.948683), (2L, 1L, 0.948683)))
  }

  test("tfidfPairs: a term over the df cap generates no candidates") {
    val docs = Seq((1L, "the apple"), (2L, "the apple"),
      (3L, "the pear"), (4L, "the plum"), (5L, "the fig"))
      .toDF("doc_id", "text")
    // dfCap=3 drops 'the' (df=5); only 1 and 2 still share a term
    val got = LlmCorpus.tfidfPairs(docs, dfCap = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L)))
  }

  test("tfidfPairs: dfCapFraction lifts the cap with N — and is a " +
      "no-op while ceil(f*N) stays under the absolute cap") {
    val docs = Seq((1L, "the apple"), (2L, "the apple"),
      (3L, "the pear"), (4L, "the plum"), (5L, "the fig"))
      .toDF("doc_id", "text")
    def qids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("qid").collect().map(_.getLong(0)).toSet
    // effective cap max(3, ceil(0.99*5)) = 5 readmits 'the': every doc
    // now shares a term with every other, so all five get lists
    assert(qids(LlmCorpus.tfidfPairs(docs, dfCap = 3,
      dfCapFraction = 0.99)) == Set(1L, 2L, 3L, 4L, 5L))
    // ceil(0.2*5) = 1 < 3: identical to the absolute-cap result
    val strict = LlmCorpus.tfidfPairs(docs, dfCap = 3).collect().toSet
    assert(LlmCorpus.tfidfPairs(docs, dfCap = 3, dfCapFraction = 0.2)
      .collect().toSet == strict)
  }
}
