package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmPrep

/** Golden tests for the training-data preparation operators
  * (contamination, stratified sampling, packing, entropy) on
  * hand-built corpora with hand-computed answers. */
class LlmPrepSpec extends GraftSuite {
  import spark.implicits._

  test("contamination reports eval docs sharing capped train grams") {
    // doc 0 and 20 are eval (id % 20 == 0); doc 0 shares its full text
    // with train doc 1 (contaminated), train doc 2 is unrelated, doc 20
    // shares only ONE 3-gram with doc 1 (below the min-shared bar)
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (20L, "alpha beta gamma nine ten eleven twelve")).toDF("doc_id", "text")
    val out = LlmPrep.contamination(docs, n = 3, dfCap = 50, minShared = 2)
      .collect().map(r => (r.getAs[Long]("eval_id"),
        r.getAs[Long]("train_id")) -> r.getAs[Long]("n_shared")).toMap
    // doc 0 vs 1: 4 distinct 3-grams shared; (20,1) shares just 1
    assert(out == Map((0L, 1L) -> 4L))
  }

  test("contamination df cap drops boilerplate grams") {
    // the shared gram appears in BOTH train docs → train df 2 > cap 1,
    // so it stops generating candidates entirely
    val docs = Seq(
      (0L, "common phrase here tail0"),
      (1L, "common phrase here tail1"),
      (2L, "common phrase here tail2")).toDF("doc_id", "text")
    assert(LlmPrep.contamination(docs, n = 3, dfCap = 1, minShared = 1)
      .count() == 0)
    assert(LlmPrep.contamination(docs, n = 3, dfCap = 50, minShared = 1)
      .count() == 2, "uncapped, both train docs are reported")
  }

  test("stratified sample caps each stratum deterministically") {
    val docs = (0L until 30L).map(i =>
      (i, if (i < 20) "en" else "fr", s"text $i")).toDF("doc_id", "lang", "text")
    val out = LlmPrep.sampleStratified(docs, cap = 5)
    val byLang = out.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang == Map("en" -> 5L, "fr" -> 5L),
      "en trimmed to the cap, fr kept whole (5 of 10)")
    // re-running produces the identical sample — hash order, no RNG
    val ids = out.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val again = LlmPrep.sampleStratified(docs, cap = 5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids == again)
  }

  test("pack assigns each doc the bin its first token falls in") {
    // one shard (nShards = 1), budget 10; token counts 4, 4, 4, 9:
    // offsets 0, 4, 8, 12 → bins 0, 0, 0, 1
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b c d"),
      (2L, "a b c d"),
      (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val out = LlmPrep.pack(docs, budget = 10, nShards = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("token_offset"), r.getAs[Long]("bin")))).toMap
    assert(out == Map(0L -> ((0L, 0L)), 1L -> ((4L, 0L)),
      2L -> ((8L, 0L)), 3L -> ((12L, 1L))))
    // sharding: offsets accumulate per shard, not globally
    val sharded = LlmPrep.pack(docs, budget = 10, nShards = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("token_offset"))
      .toMap
    assert(sharded == Map(0L -> 0L, 2L -> 4L, 1L -> 0L, 3L -> 4L))
  }

  test("chunk: overlapping windows, short tail only when it adds tokens") {
    // size=4, overlap=1 → stride=3. 8 tokens: windows [1..4], [4..7],
    // [7..8] (ceil((8-1)/3)=3). 4 tokens: exactly one window. 5 tokens:
    // ceil(4/3)=2 → [1..4],[4..5]. 1 token: max(1, ceil(0/3))=1 window.
    // 6 tokens: ceil(5/3)=2 → [1..4],[4..6] — NO third window starting
    // at 7 (it would be fully contained in the second).
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "p q r s"),
      (3L, "v w x y z"),
      (4L, "solo"),
      (5L, "m n o p q r"),
      (6L, "   ")).toDF("doc_id", "text")
    val out = LlmPrep.chunk(docs, size = 4, overlap = 1)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_ix")) ->
        ((r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk"))))
      .toMap
    assert(out == Map(
      (1L, 0L) -> ((4L, "a b c d")), (1L, 1L) -> ((4L, "d e f g")),
      (1L, 2L) -> ((2L, "g h")),
      (2L, 0L) -> ((4L, "p q r s")),
      (3L, 0L) -> ((4L, "v w x y")), (3L, 1L) -> ((2L, "y z")),
      (4L, 0L) -> ((1L, "solo")),
      (5L, 0L) -> ((4L, "m n o p")), (5L, 1L) -> ((3L, "p q r"))))
  }

  test("chunk: every token lands in a window; overlap counts match") {
    // structural invariants on a mixed corpus: concatenating each
    // document's windows with the first `overlap` tokens of every
    // non-first window dropped reconstructs the token stream exactly
    val docs = Seq(
      (1L, ('a' to 'z').map(_.toString).mkString(" ")),
      (2L, (1 to 100).map("t" + _).mkString(" ")),
      (3L, "x"),
      (4L, (1 to 17).map("u" + _).mkString(" "))).toDF("doc_id", "text")
    val size = 8; val overlap = 3; val stride = size - overlap
    val chunks = LlmPrep.chunk(docs, size, overlap)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("chunk_ix"), r.getAs[String]("chunk")))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for ((id, text) <- Seq((1L, ('a' to 'z').map(_.toString)),
        (2L, (1 to 100).map("t" + _)), (3L, Seq("x")),
        (4L, (1 to 17).map("u" + _)))) {
      val toks = text.map(_.toLowerCase)
      val rebuilt = chunks(id).zipWithIndex.flatMap { case (c, i) =>
        val t = c.split(" ").toSeq
        if (i == 0) t else t.drop(overlap)
      }
      assert(rebuilt == toks, s"doc $id reconstruction")
      // consecutive windows agree on their overlap region
      chunks(id).sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.split(" ").toSeq.takeRight(
            math.min(overlap, a.split(" ").length)) ==
            b.split(" ").toSeq.take(overlap),
            s"doc $id window overlap mismatch")
        case _ => ()
      }
    }
  }

  test("boilerplate scrub removes covered positions of high-df grams") {
    // "x y z" appears in docs 1,2,3 → df 3 > cap 2 → boilerplate.
    // "a b c" appears in docs 1 and 4 → df 2, NOT boilerplate.
    val docs = Seq(
      (1L, "a b c x y z d"),
      (2L, "x y z"),
      (3L, "q x y z r"),
      (4L, "a b c"),
      (5L, "lone words here")).toDF("doc_id", "text")
    val out = LlmPrep.boilerplateScrub(docs, n = 3, dfCap = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_text")))).toMap
    assert(out == Map(
      1L -> ((7L, 3L, "a b c d")),
      2L -> ((3L, 3L, "")), // fully scrubbed doc is reported, not dropped
      3L -> ((5L, 3L, "q r")),
      4L -> ((3L, 0L, "a b c")),
      5L -> ((3L, 0L, "lone words here"))))
  }

  test("boilerplate scrub: overlapping grams cover the union of spans") {
    // docs 1-3 share the full run "u v w x y": every 3-gram in it has
    // df 3 > 2, the covered spans overlap, and the union scrubs all 5
    // positions exactly once (no double-count in n_removed)
    val docs = Seq(
      (1L, "u v w x y"),
      (2L, "pre u v w x y"),
      (3L, "u v w x y post")).toDF("doc_id", "text")
    val out = LlmPrep.boilerplateScrub(docs, n = 3, dfCap = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_text"))))
      .toMap
    assert(out == Map(
      1L -> ((5L, "")),
      2L -> ((5L, "pre")),
      3L -> ((5L, "post"))))
  }

  test("bpe pairs: adjacent counts with multiplicity, lexical ties") {
    // "a b" occurs 3 times (twice in doc 1 - overlapping "a b a b" -
    // once in doc 2); "b a"/"b c" once each, tie broken lexically;
    // one-token and empty docs add none
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "x"),
      (4L, "")).toDF("doc_id", "text")
    val out = LlmPrep.bpePairs(docs, k = 3)
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Long]("n"),
        r.getAs[Long]("rank")))
    assert(out.toSeq == Seq(("a b", 3L, 1L), ("b a", 1L, 2L),
      ("b c", 1L, 3L)))
  }

  test("vocab ranks tokens by count with deterministic ties and coverage") {
    // counts: b=4, a=3, c=2, d=1 (total 10); tie-free by construction,
    // plus a tie pair (c vs cc both 2 → lexical order c, cc)... use:
    // b=4, a=3, c=2, cc=2, d=1 → total 12
    val docs = Seq(
      (0L, "b b a c cc"),
      (1L, "b b a a c cc d")).toDF("doc_id", "text")
    val out = LlmPrep.vocab(docs, k = 3).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n"),
        r.getAs[Long]("rank"), r.getAs[Double]("coverage")))
    assert(out.toSeq == Seq(
      ("b", 4L, 1L, math.rint(4.0 / 12 * 1e6) / 1e6),
      ("a", 3L, 2L, math.rint(7.0 / 12 * 1e6) / 1e6),
      ("c", 2L, 3L, math.rint(9.0 / 12 * 1e6) / 1e6)),
      s"got ${out.toSeq}")
  }

  test("weighted sample: rate 1 keeps all, rate 0 none, default applies") {
    val docs = (0L until 40L).map(i =>
      (i, if (i < 20) "keep" else if (i < 30) "drop" else "other",
        s"text $i")).toDF("doc_id", "source", "text")
    val out = LlmPrep.sampleWeighted(docs,
      rates = Seq("keep" -> 1.0, "drop" -> 0.0), defaultRate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(out.count(_._2 == "keep") == 20, "rate 1.0 keeps every doc")
    assert(!out.exists(_._2 == "drop"), "rate 0.0 keeps none")
    val others = out.count(_._2 == "other")
    assert(others > 0 && others < 10, s"default 0.5 thins 10 docs: $others")
    // deterministic: identical sample on re-run
    assert(LlmPrep.sampleWeighted(docs,
      rates = Seq("keep" -> 1.0, "drop" -> 0.0), defaultRate = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet ==
      out.toSet)
  }

  test("vocab on an empty or all-whitespace corpus is empty, not NPE") {
    assert(LlmPrep.vocab(
      Seq.empty[(Long, String)].toDF("doc_id", "text")).count() == 0)
    assert(LlmPrep.vocab(
      Seq((1L, "   ")).toDF("doc_id", "text")).count() == 0)
  }

  test("blocklist filter: bloom miss keeps, exact match drops, empty registry keeps all") {
    // id 0 is blocked (0 % 17 == 0); id 3 shares its TEXT → same
    // content hash → dropped too; 1 and 2 are clean
    val docs = Seq(
      (0L, "blocked payload"), (1L, "clean one"), (2L, "clean two"),
      (3L, "blocked payload")).toDF("doc_id", "text")
    val kept = LlmPrep.blocklistFilter(docs,
      LlmPrep.syntheticBlocklist(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
    // empty registry: null bloom aggregate → every doc kept
    val none = LlmPrep.syntheticBlocklist(docs.filter(col("doc_id") < 0))
    assert(LlmPrep.blocklistFilter(docs, none).count() == 4)
  }

  test("corpus stats: exact interpolated percentiles per source") {
    // src A token counts {1,2,3,4}: p50 = 2.5, p90 = 1 + 0.9*3 = 3.7,
    // p99 = 3.97; src B single doc: every percentile = 5
    val docs = Seq(
      (0L, "w", "A"), (1L, "w w", "A"), (2L, "w w w", "A"),
      (3L, "w w w w", "A"), (4L, "a b c d e", "B"))
      .toDF("doc_id", "text", "source")
    val r = LlmPrep.corpusStats(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("A").getAs[Long]("n_docs") == 4)
    assert(r("A").getAs[Long]("total_tokens") == 10)
    assert(r("A").getAs[Double]("mean_tokens") == 2.5)
    assert(r("A").getAs[Double]("p50_tokens") == 2.5)
    assert(r("A").getAs[Double]("p90_tokens") == 3.7)
    assert(r("A").getAs[Double]("p99_tokens") == 3.97)
    assert(r("B").getAs[Double]("p99_tokens") == 5.0)
  }

  test("pii scrub: counts on original text, typed redaction, clean docs pass") {
    // ids 0/1/2 receive the email/phone/ip injection classes; id 3 none
    val docs = Seq(0L, 1L, 2L, 3L)
      .map(id => (id, s"plain words $id")).toDF("doc_id", "text")
    val out = LlmPrep.piiScrub(LlmPrep.withSyntheticPii(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(0L).getAs[Long]("n_emails") == 1)
    assert(out(0L).getAs[String]("clean_text") == "plain words 0 contact <EMAIL>")
    assert(out(1L).getAs[Long]("n_phones") == 1)
    assert(out(1L).getAs[String]("clean_text") == "plain words 1 call <PHONE>")
    assert(out(2L).getAs[Long]("n_ips") == 1)
    assert(out(2L).getAs[String]("clean_text") == "plain words 2 host <IP>")
    assert(out(3L).getAs[Int]("pii_found") == 0)
    assert(out(3L).getAs[String]("clean_text") == "plain words 3")
    // redaction is complete: a second scrub over clean_text finds nothing
    val again = LlmPrep.piiScrub(
      LlmPrep.piiScrub(LlmPrep.withSyntheticPii(docs))
        .select(col("doc_id"), col("clean_text").as("text")))
    assert(again.filter(col("pii_found") =!= 0).count() == 0)
  }

  test("entropy: uniform chars hit log2(n), repeated text scores low") {
    val docs = Seq(
      (0L, "abcd"), // 4 distinct chars, uniform → 2 bits
      (1L, "aaaa"), // 1 char → 0 bits
      (2L, "x y x y x y x y"),
      (3L, "   "), // whitespace-only: no tokens — flagged, not dropped
      (4L, "")).toDF("doc_id", "text") // fully empty: same
    val out = LlmPrep.entropy(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("char_entropy"),
          r.getAs[Double]("token_entropy")))).toMap
    assert(out(0L) == ((2.0, 0.0)), "abcd: uniform chars, single token")
    assert(out(1L) == ((0.0, 0.0)))
    // doc 2: tokens x,y uniform → 1 bit; chars x,y,space at 4/4/7 of 15
    assert(out(2L)._2 == 1.0)
    val expected = {
      val n = 15.0
      val h = -Seq(4, 4, 7).map(k => k / n * math.log(k / n) / math.log(2)).sum
      math.rint(h * 1e6) / 1e6
    }
    assert(math.abs(out(2L)._1 - expected) < 1e-9)
    // junk docs must be FLAGGED (zero entropy), not silently dropped —
    // they are exactly what a downstream quality filter needs to see
    assert(out(3L) == ((0.0, 0.0)), "whitespace-only doc")
    assert(out(4L) == ((0.0, 0.0)), "empty doc")
  }

  test("bm25: hand-computed scores, df-ranked query pick, rank order") {
    // df: apple 2, banana 2, cherry 1 → rank (df desc, term asc):
    // apple, banana, cherry. qSkip=0, qTerms=1 → query = {apple}.
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val out = LlmPrep.bm25(docs, qSkip = 0, qTerms = 1, topK = 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rk")))
    // same formula in plain scala doubles (an independent evaluator)
    val n = 3.0; val avgdl = 10.0 / 3.0
    def score(tf: Double, dl: Double, df: Double): Double = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val c = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.rint(c * 1e6) / 1e6
    }
    val (s1, s2) = (score(2, 3, 2), score(1, 4, 2))
    assert(s1 > s2, "tf 2 in a shorter doc must outrank tf 1")
    assert(out.toSeq === Seq((1L, s1, 1L), (2L, s2, 2L)))
  }

  test("bm25: qSkip skips the df head; deterministic term tie-break") {
    // apple and banana tie on df 2; term asc puts apple first, so
    // qSkip=1 selects banana — its postings are docs 1 and 3
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val ids = LlmPrep.bm25(docs, qSkip = 1, qTerms = 1, topK = 10)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L, 3L))
  }

  test("bm25: empty and whitespace-only corpora produce empty results") {
    assert(LlmPrep.bm25(Seq.empty[(Long, String)]
      .toDF("doc_id", "text")).count() === 0)
    assert(LlmPrep.bm25(Seq((1L, "   ")).toDF("doc_id", "text"))
      .count() === 0)
  }

  test("bm25Multi: per-query scoring matches single-query bm25") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val queries = Seq((1L, "apple"), (2L, "banana"), (2L, "cherry"))
      .toDF("query_id", "term")
    val out = LlmPrep.bm25Multi(docs, queries, topK = 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
        r.getAs[Long]("rk")))
    // query 1 = {apple} must reproduce the single-query operator
    val single = LlmPrep.bm25(docs, qSkip = 0, qTerms = 1, topK = 10)
      .collect().map(r => (1L, r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"), r.getAs[Long]("rk")))
    assert(out.filter(_._1 == 1L).sortBy(_._4).toSeq === single.toSeq)
    // query 2 = {banana, cherry}: doc 3 (banana×3) and doc 2 (cherry×3)
    // score on one term each, doc 1 on banana×1 — all three ranked
    val q2 = out.filter(_._1 == 2L).sortBy(_._4).map(_._2).toSeq
    assert(q2.toSet === Set(1L, 2L, 3L) && q2.length === 3)
  }

  test("bm25Multi: terms absent from the corpus score nothing") {
    val docs = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val queries = Seq((1L, "zzz"), (2L, "apple"))
      .toDF("query_id", "term")
    val out = LlmPrep.bm25Multi(docs, queries)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id")))
    assert(out.toSeq === Seq((2L, 1L)),
      "query 1's unseen term yields no rows; query 2 scores doc 1")
  }

  test("bm25FixtureQueries: consecutive df slices below the head") {
    // 14 distinct terms with descending df so the ranking is exact:
    // term_01 in 14 docs, term_02 in 13, ..., term_14 in 1
    val docs = (1 to 14).map { d =>
      (d.toLong, (1 to d).map(i => f"term_$i%02d").mkString(" "))
    }.toDF("doc_id", "text")
    val fix = LlmPrep.bm25FixtureQueries(docs, nQueries = 1)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[String]("term"))).toSeq
    // skip=10 drops term_01..term_10 (df 14..5); query 1 = ranks 11-13
    assert(fix === Seq((1L, "term_11"), (1L, "term_12"), (1L, "term_13")))
  }

  test("splitAssign: membership is a pure function of doc_id") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val whole = LlmPrep.splitAssign(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Set("train", "val", "test").subsetOf(whole.values.toSet),
      "all three splits populated")
    val nTrain = whole.values.count(_ == "train")
    assert(math.abs(nTrain.toDouble / whole.size - 0.9) < 0.05,
      s"~90% train, got $nTrain/${whole.size}")
    // growing or re-chopping the corpus never moves a document: the
    // assignment of any subset is the restriction of the whole
    val subset = LlmPrep.splitAssign(
        docs.filter(pmod(col("doc_id"), lit(3)) === 0).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset.nonEmpty && subset.forall { case (id, s) => whole(id) == s })
  }

  test("skipgrams: windowed ordered pairs match a reference count") {
    val docs = Seq(
      (1L, "a b c d a b c"),
      (2L, "b c a a b"),
      (3L, "d"),
      (4L, "")).toDF("doc_id", "text")
    val got = LlmPrep.skipgrams(docs, window = 2, minCount = 1L, k = 100)
      .select(col("pair"), col("n"), col("rank"))
      .as[(String, Long, Long)].collect()
    val ref = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    Seq("a b c d a b c", "b c a a b").foreach { t =>
      val ts = t.split(" ")
      for (i <- ts.indices; o <- 1 to 2 if i + o < ts.length)
        ref(s"${ts(i)} ${ts(i + o)}") += 1L
    }
    assert(got.map(g => g._1 -> g._2).toMap == ref.toMap)
    // rank follows (n DESC, pair ASC)
    val sorted = got.sortBy(_._3)
    assert(sorted.map(g => (g._1, g._2)).sortBy(p => (-p._2, p._1))
      .zip(sorted.map(g => (g._1, g._2))).forall(x => x._1 == x._2))
  }

  test("splitSafe: a near-dup cluster never straddles splits; " +
      "singletons keep a pure per-cluster hash") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
    val got = graft.operators.LlmText.splitSafe(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // cluster integrity: one split per cluster_id
    val perCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(perCluster.values.forall(_.size == 1),
      "a cluster straddles splits")
    // every doc present exactly once; all three splits exist at the
    // cluster level or the fixture is degenerate
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
  }
}
