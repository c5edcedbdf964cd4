package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level curation/export operators that round out the
  * training-data pipeline: deterministic shuffle-shard assignment for
  * training export, unigram language-model quality scoring (the
  * perplexity-filter shape of CCNet-style curation), and cross-document
  * duplicated-substring detection (the exact-substring-dedup shape of
  * "Deduplicating Training Data Makes Language Models Better", Lee et
  * al. 2022 — windowed rolling hashes instead of a suffix array, which
  * is the distributable reformulation).
  *
  * Same cross-engine determinism rules as [[LlmText]]/[[LlmPrep]]:
  * hashes are md5 hex strings, orderings are explicit over those
  * strings, floating aggregates are rounded to 6 places on both sides.
  *
  * Keep in sync with [[LlmCorpusSql]].
  */
object LlmCorpus {

  /** Whitespace tokens of lower(text), empties dropped — the shared
    * [[graft.functions.TokenSplit]] kernel. */
  private def toks(c: Column): Column =
    call_function("graft_tokens", c)

  /** Shard count for [[shuffleShards]] — stands in for the thousands of
    * output shards a real export writes; the assignment math is
    * shard-count-agnostic. */
  val ExportShards = 8

  /** Gate fixture for [[domainMix]]: named target shares whose sum
    * (0.375) and values are DYADIC, so every derived share is the same
    * exact double on both engines (a 0.2+0.1 style target would drag
    * 0.30000000000000004 into the leftover arithmetic). */
  val MixTargets: Seq[(String, Double)] =
    Seq("src0" -> 0.25, "src1" -> 0.125)

  /** Deterministic global shuffle + shard assignment for training
    * export: every document gets a pseudo-random `shard` (uniform over
    * [0, nShards)) and a within-shard `seq` position in hash order.
    * Writing `partitionBy(shard)` ordered by `seq` then yields the
    * shuffled, sharded corpus a trainer streams — without any global
    * sort or RNG state.
    *
    * Scale shape: the hash is a per-row projection; the only shuffle is
    * the `partitionBy(shard)` window (exactly the exchange the shard
    * write needs anyway, so at cluster scale the window and the write
    * share one exchange). No global ordering is ever materialized —
    * within-shard order is enough for training-data shuffling, which is
    * the standard trick that keeps corpus export embarrassingly
    * parallel at 100 TB.
    *
    * Determinism across engines: `shard` parses the first 4 hex chars
    * of md5("shard:" || doc_id) as an integer (Spark `conv`, DuckDB
    * `'0x…'` cast) mod nShards; `seq` ranks by the remaining hash
    * suffix with doc_id as the unique tiebreak. */
  def shuffleShards(documents: DataFrame,
      nShards: Int = ExportShards): DataFrame = {
    val h = md5(concat(lit("shard:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hsuf"), col("doc_id"))
    documents
      .select(col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_tokens"),
        (conv(substring(h, 1, 4), 16, 10).cast("long") % nShards)
          .as("shard"),
        substring(h, 5, 28).as("hsuf"))
      .withColumn("seq", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("seq"), col("n_tokens"))
  }

  /** Unigram language-model quality score per document — the
    * distributable stand-in for the KenLM perplexity filter of
    * CCNet-style curation: a unigram LM is fit on the corpus itself
    * (add-one smoothing over the observed vocabulary) and every
    * document is scored by its mean token log-probability and the
    * corresponding perplexity. Documents whose perplexity is far above
    * the corpus norm are gibberish/boilerplate candidates; far below,
    * degenerate repetition.
    *
    * Scale shape: token counts are one shuffle keyed by term
    * (vocab-sized result); the corpus totals are a single broadcast
    * row; scoring joins the corpus token stream to the count table on
    * term (linear equi-join — the count side has one row per term, so
    * hot terms fan out but never explode), then aggregates per doc.
    * No driver-side model object: the "model" is a DataFrame. */
  def unigramLm(documents: DataFrame): DataFrame = {
    val cnt = unigramCounts(documents)
    unigramScore(documents, cnt,
      cnt.agg(sum(col("c")).as("n_total"), count(lit(1)).as("v_size")))
  }

  /** The trained unigram LM: (tok, c) corpus term counts — one shuffle
    * keyed by term. The "model" both [[unigramLm]] and the streaming
    * quality screen score against. */
  def unigramCounts(documents: DataFrame): DataFrame =
    documents
      .select(explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))

  /** Score `documents` against a trained LM (`cnt` = (tok, c), `stats`
    * = one (n_total, v_size) row): add-one smoothing, so a token
    * UNSEEN in training scores ln(1) - ln(N + V) — the left join +
    * coalesce(0) is what makes out-of-vocabulary scoring well-defined
    * when the scored stream is not the training corpus. */
  def unigramScore(documents: DataFrame, cnt: DataFrame,
      stats: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .join(cnt, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(coalesce(col("c"), lit(0L)) + 1) -
          log(col("n_total") + col("v_size"))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(exp(-avg(col("logp"))), 6).as("ppl"))

  /** Bigram language-model quality score — one order up from
    * [[unigramLm]]: a doc full of common words in IMPLAUSIBLE order
    * (shuffled text, keyword stuffing) scores well on unigrams and
    * badly here. Add-one-smoothed conditional:
    * `ln(c(l,r) + 1) − ln(c(l) + V)` per adjacent pair, averaged per
    * doc, perplexity = exp(−avg). Docs with fewer than two tokens
    * have no bigram evidence and drop (documented contract).
    *
    * Shape: the model is two DataFrames (bigram + unigram counts, one
    * scan each over the pinned tokenized frame); scoring is two
    * vocabulary-sized equi-joins, one doc aggregate — the unigram
    * cost profile, nothing new at 100 TB. */
  def bigramLm(documents: DataFrame): DataFrame = {
    val tk = CacheScope.pin(documents
      .select(col("doc_id"), toks(col("text")).as("toks")))
    val arrLen = org.apache.spark.sql.functions.size _
    val pairs = tk
      .select(col("doc_id"), explode(when(arrLen(col("toks")) >= 2,
        transform(sequence(lit(1), (arrLen(col("toks")) - 1).cast("int")),
          i => struct(element_at(col("toks"), i).as("l"),
            element_at(col("toks"), i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
      .select(col("doc_id"), col("p.l").as("l"), col("p.r").as("r"))
    val bi = pairs.groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("c2"))
    val uni = tk.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val v = uni.agg(count(lit(1)).cast("double").as("v_size"))
    pairs
      .join(bi, Seq("l", "r"), "left")
      .join(uni.select(col("tok").as("l"), col("c")), Seq("l"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"),
        (log(coalesce(col("c2"), lit(0L)) + 1) -
          log(col("c") + col("v_size"))).as("logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        round(avg(col("logp")), 6).as("avg_logp"),
        round(exp(-avg(col("logp"))), 6).as("ppl"))
  }

  /** Duplicated-span gram length (tokens) for [[substrDup]]: any
    * verbatim shared token span of ≥ DupN tokens is caught regardless
    * of where it sits in either document — token shingles at stride 1
    * are alignment-free, unlike fixed-offset char windows (a copy at a
    * shifted offset would dodge every position-based window). */
  val DupN = 8

  /** Cross-document duplicated-substring detection — the per-document
    * "how much of this text is copied verbatim from elsewhere" signal
    * that exact-substring dedup trims on: each document's distinct
    * [[DupN]]-token spans are hashed; a span seen in ≥ 2 distinct
    * documents is duplicated. Output per document (≥ DupN tokens):
    * distinct-span count, duplicated-span count, duplicated fraction.
    * A high `dup_ratio` document is mostly copied text even when no
    * whole-document near-dup fires.
    *
    * Scale shape: shingling is a per-row kernel scan (no shuffle);
    * span document-frequency is one count window keyed by the span
    * (the same shuffle a groupBy would take — a boilerplate span shared
    * by a million documents contributes 1M count rows, never a 1M×1M
    * join); the verdict re-aggregates by doc_id. All linear in corpus
    * size, same candidate discipline as [[LlmPrep.contamination]]. */
  def substrDup(documents: DataFrame, n: Int = DupN): DataFrame = {
    val posting = documents
      .select(col("doc_id"),
        explode(call_function("graft_ngrams", col("text"), lit(n)))
          .as("gram"))
    val wdf = Window.partitionBy(col("gram"))
    posting
      .withColumn("df", count(lit(1)).over(wdf))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ratio", round(col("n_dup") / col("n_spans"), 6))
  }

  /** Trusted-source fixture set for [[qualityClf]]: the classifier's
    * positive class is "documents from these sources" — the
    * WebText/CCNet recipe where a curated reference corpus defines
    * "high quality" and the model generalizes that judgment to
    * everything else. A real pipeline passes its own curated-source
    * list; the fixture keeps the operator runnable (and
    * oracle-checkable) on the one `documents` table. */
  val TrustedSources: Seq[String] = (1 to 5).map(i => s"src$i")

  /** Per-token class counts of the naive-Bayes quality model:
    * (tok, c_pos, c_neg) where `c_pos` counts occurrences inside
    * trusted-source documents. One shuffle keyed by token,
    * vocab-sized result — the trained "model" is a DataFrame, never a
    * driver object, exactly like [[unigramCounts]]. */
  def nbCounts(documents: DataFrame, trusted: Seq[String]): DataFrame =
    documents
      .select(col("source").isin(trusted: _*).as("trusted"),
        explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(sum(when(col("trusted"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("trusted"), 1L).otherwise(0L)).as("c_neg"))

  /** One-row model statistics for [[nbScore]]: class token totals and
    * vocabulary size from `cnt`, class document counts (the prior)
    * from `documents`. Both classes must be non-empty — a one-class
    * "classifier" has no log-odds to score. */
  def nbStats(documents: DataFrame, cnt: DataFrame,
      trusted: Seq[String]): DataFrame =
    cnt.agg(sum(col("c_pos")).as("n_pos"), sum(col("c_neg")).as("n_neg"),
        count(lit(1)).as("v_size"))
      .crossJoin(broadcast(documents.agg(
        sum(when(col("source").isin(trusted: _*), 1L).otherwise(0L))
          .as("d_pos"),
        sum(when(!col("source").isin(trusted: _*), 1L).otherwise(0L))
          .as("d_neg"))))

  /** Score `documents` against a trained naive-Bayes quality model
    * (`cnt` = [[nbCounts]], `stats` = [[nbStats]]): per-token
    * log-odds with add-one smoothing plus the class-prior log-ratio;
    * `pred` is the classifier's accept verdict (score > 0). A token
    * UNSEEN in training contributes the smoothed floor odds — the
    * left join + coalesce(0) that makes scoring a NEW stream against
    * a frozen model well-defined, same contract as [[unigramScore]].
    *
    * Scale shape: the model join is a term-keyed equi-join (the model
    * is vocab-sized — sublinear in corpus size but unbounded, so it is
    * NOT broadcast-hinted; AQE broadcasts it whenever it fits, and
    * falls back to a linear shuffle join when a 100 TB corpus's
    * vocabulary doesn't); stats is one broadcast row; the only
    * corpus-sized shuffle is the per-doc aggregation. */
  def nbScore(documents: DataFrame, cnt: DataFrame,
      stats: DataFrame): DataFrame = {
    val logOdds =
      log(coalesce(col("c_pos"), lit(0L)) + 1) -
        log(col("n_pos") + col("v_size")) -
        log(coalesce(col("c_neg"), lit(0L)) + 1) +
        log(col("n_neg") + col("v_size"))
    val prior = log(col("d_pos")) - log(col("d_neg"))
    documents
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .join(cnt, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("d_pos"), col("d_neg"),
        logOdds.as("lo"))
      .groupBy(col("doc_id"), col("d_pos"), col("d_neg"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("lo")).as("slo"))
      .select(col("doc_id"), col("n_tokens"),
        round(prior + col("slo"), 6).as("score"),
        (prior + col("slo") > 0).as("pred"))
  }

  /** Naive-Bayes quality classifier — the fastText/WebText-style
    * quality-filter shape: train token log-odds on
    * trusted-vs-untrusted sources, score every document, emit the
    * accept verdict. Train = [[nbCounts]] + [[nbStats]] (one
    * vocab-keyed shuffle + two one-row aggregates), score =
    * [[nbScore]] (model equi-joined into the posting scan) — split so
    * a streaming screen can score arrivals against a frozen model. */
  def qualityClf(documents: DataFrame,
      trusted: Seq[String] = TrustedSources): DataFrame = {
    // pinned: cnt feeds both the stats aggregate and the score join —
    // without the pin the training scan would run twice
    val cnt = CacheScope.pin(nbCounts(documents, trusted))
    nbScore(documents, cnt, nbStats(documents, cnt, trusted))
  }

  /** Keywords kept per document by [[keywords]]. */
  val KeywordsK = 3

  /** Per-document TF-IDF keyword extraction — the topic-tagging /
    * index-term signal: `tfidf = tf * (ln((N+1)/(df+1)) + 1)` (the
    * smoothed-idf variant that never goes negative), top
    * [[KeywordsK]] terms per document, ties broken by term.
    *
    * Scale shape: tf is one (doc_id, term)-keyed aggregation over the
    * posting scan; df is a count window over tf keyed by term (one
    * row per (doc, term), so counting rows per term IS document
    * frequency — same one-pass trick as [[substrDup]]'s span df, and
    * it avoids both a second posting scan and a tf⋈df self-join); N
    * is a one-row broadcast; the rank window partitions by doc_id, so
    * no global ordering is ever materialized. All linear in corpus
    * size. */
  def keywords(documents: DataFrame, k: Int = KeywordsK): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nd = documents.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nd))
      .withColumn("tfidf",
        col("tf") *
          (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) +
            lit(1.0)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"),
        round(col("tfidf"), 6).as("tfidf"), col("rk"))
  }

  /** Document-frequency cap for [[tfidfPairs]] postings: a term in
    * more documents than this generates no candidate pairs (its
    * posting list is quadratic in df — and a term that common carries
    * almost no idf weight anyway). Same hot-posting discipline as
    * [[LlmText.NgramDfCap]]. Production corpora should pass
    * `dfCapFraction` too — the effective cap is
    * `max(dfCap, ⌈dfCapFraction·N⌉)`, so candidate vocabulary stays a
    * constant corpus fraction instead of shrinking as N grows. */
  val TfidfPairsDfCap = 30

  /** Neighbors kept per document by [[tfidfPairs]]. */
  val TfidfPairsK = 3

  /** All-pairs sparse TF-IDF cosine similarity, top-k per document —
    * document similarity WITHOUT embeddings: each doc is its tf·idf
    * vector over the df-capped term space (idf = ln((N+1)/(df+1))+1,
    * the [[keywords]] convention), candidate pairs come from a
    * posting-list self-join on the term, and the pair's cosine is the
    * sum of weight products over shared terms divided by the two
    * l2 norms. Output: (qid, nbr, cosine, rank) — DIRECTED pairs,
    * ranked per qid over every candidate partner (the [[LlmSim]]
    * kNN convention), so each document gets its full neighbor list
    * (an `id_a < id_b` dedup would give the max-id doc no list and
    * hide smaller-id partners from every list).
    *
    * Scale shape: the posting join is an EQUI-join on the term whose
    * per-term fan-out is df² ≤ dfCap² — the df cap is what keeps the
    * candidate count linear in corpus size (the same reason
    * [[LlmText.dedupNgram]] caps its grams); tf/df/norms are one
    * posting scan (df and the norm are windows over the tf table —
    * no second tokenize pass, no tf⋈df self-join). Determinism: tf,
    * df and N are exact integers so each weight is a single identical
    * double expression on both engines; only the SUMS (norm, dot)
    * accumulate in engine-specific order, and round(cos, 6) with the
    * id_b tie-break absorbs that noise exactly like [[LlmSim]]. */
  def tfidfPairs(documents: DataFrame, dfCap: Int = TfidfPairsDfCap,
      k: Int = TfidfPairsK, dfCapFraction: Double = 0.0): DataFrame = {
    require(dfCapFraction >= 0 && dfCapFraction < 1,
      s"tfidfPairs: dfCapFraction must be in [0, 1), got $dfCapFraction")
    val tf = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val nd = documents.agg(count(lit(1)).as("n_docs"))
    val wn = tf
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nd))
      // corpus-relative cap: an ABSOLUTE cap silently shrinks each
      // document's candidate vocabulary as the corpus grows (at 10×
      // the same term crosses the cap with the same per-doc meaning);
      // max(absolute, ⌈f·N⌉) keeps the admitted df a constant corpus
      // FRACTION, using the N the idf already needs — no extra pass.
      // f = 0 (the default) is exactly the absolute-cap behavior.
      .filter(col("df") <= greatest(lit(dfCap.toLong),
        ceil(lit(dfCapFraction) * col("n_docs")).cast("long")))
      .withColumn("w",
        col("tf") *
          (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) +
            lit(1.0)))
      .withColumn("nrm",
        sqrt(sum(col("w") * col("w"))
          .over(Window.partitionBy(col("doc_id")))))
      .select(col("term"), col("doc_id"), col("w"), col("nrm"))
    val a = wn.select(col("term"), col("doc_id").as("qid"),
      col("w").as("wa"), col("nrm").as("na"))
    val b = wn.select(col("term"), col("doc_id").as("nbr"),
      col("w").as("wb"), col("nrm").as("nb"))
    // the UNDIRECTED dot product per unordered pair, computed once…
    val undirected = a.join(b, Seq("term"))
      .filter(col("qid") < col("nbr"))
      .groupBy(col("qid"), col("nbr"))
      .agg(sum(col("wa") * col("wb")).as("dp"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .withColumn("cosine", round(col("dp") / (col("na") * col("nb")), 6))
      .select(col("qid"), col("nbr"), col("cosine"))
    // …then mirrored so BOTH endpoints rank it (cosine is symmetric;
    // aggregating each unordered pair once keeps the shuffle half the
    // size of a qid≠nbr join)
    val directed = undirected.unionByName(undirected.select(
      col("nbr").as("qid"), col("qid").as("nbr"), col("cosine")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nbr"))
    directed.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nbr"), col("cosine"), col("rank"))
  }

  /** Cross-modality curation report — the final per-document
    * selection card a corpus release ships: every document with its
    * verdict from each curation stage and the conjunction that decides
    * training membership. Stages: text-side curation
    * ([[LlmText.curate]] — quality + language + near-dup), the
    * naive-Bayes classifier accept ([[qualityClf]]), embedding-side
    * semantic dedup ([[LlmSim.semDedup]] keep, vec_id = doc_id), and
    * semantic eval decontamination ([[LlmSim.contaminationEmbed]] —
    * a flagged train vector disqualifies its document).
    *
    * Scale shape: each stage keeps its own audited plan; the report
    * itself is four doc_id-keyed left equi-joins over the document
    * spine — shuffle-bounded at any corpus size, no new hot path. */
  def curationReport(documents: DataFrame,
      embeddings: DataFrame): DataFrame = {
    val text = LlmText.curate(documents)
      .select(col("doc_id"), lit(true).as("text_kept"))
    val clf = qualityClf(documents)
      .select(col("doc_id"), col("pred").as("clf_kept"))
    val sem = LlmSim.semDedup(embeddings)
      .select(col("vec_id").as("doc_id"), col("keep").as("sem_kept"))
    val contam = LlmSim.contaminationEmbed(embeddings)
      .select(col("train_id").as("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
    documents.select(col("doc_id"))
      .join(text, Seq("doc_id"), "left")
      .join(clf, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_kept"), lit(false)).as("text_kept"),
        coalesce(col("clf_kept"), lit(false)).as("clf_kept"),
        coalesce(col("sem_kept"), lit(false)).as("sem_kept"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
      .withColumn("kept",
        col("text_kept") && col("clf_kept") && col("sem_kept") &&
          !col("contaminated"))
  }

  /** Encode every document into vocabulary token ids — the
    * tokenize-to-ids step a trainer runs before [[LlmPrep.pack]]:
    * each token becomes the rank of its entry in the
    * [[LlmPrep.vocab]] table (1 = most frequent), out-of-vocabulary
    * tokens become id 0 (the UNK convention). Output is one row per
    * token: (doc_id, pos, token_id) with `pos` 1-based within the
    * document.
    *
    * Scale shape: the vocab is top-k bounded by construction and
    * broadcast into the token scan; `pos` comes from posexplode (a
    * per-row generator, no shuffle) — encoding is map-side after the
    * one vocab-build aggregation. */
  def vocabEncode(documents: DataFrame,
      k: Int = LlmPrep.VocabSize): DataFrame = {
    val ids = LlmPrep.vocab(documents, k)
      .select(col("token").as("tok"), col("rank").as("token_id"))
    documents
      .select(col("doc_id"), posexplode(toks(col("text"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
      .join(broadcast(ids), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** HLL precision (lgConfigK) for [[profileSketch]]: 2^12 registers ≈
    * 1.6% relative error at ~4 KB per sketch — per (source) row, not
    * per document, so the whole profile table is KBs at any corpus
    * size. */
  val ProfileLgK = 12

  /** Bucket count of the [[profileSketch]] doc-length histogram:
    * log2 buckets 0..23 cover token counts up to ~16M per document —
    * beyond any training document — in 24 mergeable longs. */
  val LenHistBuckets = 24

  /** Histogram bucket of a token count: `floor(log2(n+1))`, capped.
    * Bucket b holds counts in `[2^b − 1, 2^(b+1) − 2]` — ≤2× relative
    * width, the precision/size trade a merge-forever profile wants.
    *
    * Derived with integer thresholds, not floating log: Spark's
    * `log(2, x)` is an ln ratio and lands just below the integer at
    * exact powers of two (log2(2^29) = 28.999999999999996), which
    * would drop boundary counts (n = 2^b − 1) one bucket low,
    * libm-dependent. The 23-branch when-chain is bit-exact and
    * engine-independent; the top branch caps at the last bucket. */
  private def lenBucket(n: Column): Column = {
    val x = n + lit(1L)
    (1 until LenHistBuckets).foldLeft(lit(0): Column)((acc, b) =>
      when(x >= lit(1L << b), lit(b)).otherwise(acc)).cast("int")
  }

  /** Approximate `q`-quantile of the token-count distribution encoded
    * in a `len_hist` column: the midpoint of the first bucket whose
    * running count reaches `q` of the total (NULL on an empty
    * histogram). Built from higher-order array functions (`aggregate`
    * over the cells), which codegen as LOOPS — the earlier statically-
    * unrolled form put O(buckets²) expressions into whoever consumed
    * it, and two quantiles projected over the profile aggregate blew
    * janino's 64KB method limit, dropping the whole profile scan to
    * interpreted execution. No UDF. Error is bounded by the bucket
    * width (≤2× relative). */
  def histQuantile(hist: Column, q: Double): Column = {
    require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
    val total = aggregate(hist, lit(0L), (a, x) => a + x)
    val target = ceil(total * lit(q)).cast("long")
    // one pass with a (running-count, found-bucket) accumulator; the
    // bucket index rides along since aggregate has no element index
    val found = aggregate(
      arrays_zip(hist.as("c"),
        sequence(lit(0), lit(LenHistBuckets - 1)).as("i")),
      struct(lit(0L).as("cum"), lit(-1).as("idx")),
      (acc, cell) => {
        val cum = acc.getField("cum") + cell.getField("c")
        struct(cum.as("cum"),
          when(acc.getField("idx") >= 0, acc.getField("idx"))
            .when(cum >= target, cell.getField("i"))
            .otherwise(lit(-1)).as("idx"))
      })
    // bucket midpoint (3·2^b − 3) / 2 with dynamic b: pow(2, b) is
    // double-exact far past bucket 23; floor-div matches the integer
    // arithmetic the buckets were defined with
    val idx = found.getField("idx")
    val mid = floor((lit(3L) * pow(lit(2.0), idx).cast("long") - 3L) / 2)
      .cast("long")
    when(total > 0 && idx >= 0, mid)
  }

  /** Mergeable per-source corpus profile — the incremental form of
    * [[LlmPrep.corpusStats]] for the quantities a recompute cannot
    * afford at 100 TB: exact doc/token counts (trivially mergeable
    * sums) plus DataSketches-HLL sketches of distinct document
    * contents and of the vocabulary. One profile row per source; a
    * daily batch contributes its own profile and [[mergeProfiles]]
    * folds it into the running one — distinct counts over the full
    * history WITHOUT rescanning it (union of HLL states over disjoint
    * or overlapping data IS the state of the union; overlap is
    * absorbed, which a sum of counts cannot do).
    *
    * No DuckDB gate entry: the estimates are engine-specific
    * (DataSketches state has no DuckDB twin) — correctness is
    * spec-pinned instead: split-merge ≡ whole-corpus estimates
    * exactly, and estimates within the published error envelope of
    * the exact distincts (LlmCorpusSpec).
    *
    * Scale shape: two aggregations (per-doc row, exploded-token row)
    * shuffled on `source`, each carrying constant-size sketch state
    * with map-side partial merge — the classic sketch contract. */
  def profileSketch(documents: DataFrame): DataFrame = {
    // pinned: both aggregations consume the tokenized frame — without
    // the cache every profile call would scan and tokenize twice (and
    // StreamingProfile runs this per micro-batch)
    val d = CacheScope.pin(documents.select(col("source"), col("text"),
      toks(col("text")).as("toks")))
    // the length bucket is PROJECTED once per row, not inlined into
    // each histogram cell: 24 copies of lenBucket's 23-branch chain
    // inside one hash-aggregate update method blow janino's 64KB
    // method limit and silently drop the whole profile scan to
    // interpreted execution — the projected attribute keeps every
    // aggregate expression small and the scan whole-stage-codegen
    // (ProfileSketchSpec pins the compile staying clean)
    val withB = d.select(col("source"), col("text"), col("toks"),
      lenBucket(size(col("toks"))).as("__lb"))
    val docAgg = withB.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("toks"))).cast("long").as("n_tokens"),
      hll_sketch_agg(xxhash64(col("text")), ProfileLgK).as("doc_sketch"),
      // mergeable doc-length histogram: 24 longs per source — the
      // length DISTRIBUTION (quantiles, truncation exposure at a
      // packing length) without rescanning history, the quantity the
      // exact sums cannot recover
      array((0 until LenHistBuckets).map(i =>
        sum(when(col("__lb") === i, 1L).otherwise(0L))): _*)
        .as("len_hist"))
    val tokAgg = d.select(col("source"), explode(col("toks")).as("tok"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), ProfileLgK).as("vocab_sketch"))
    docAgg.join(tokAgg, Seq("source"), "left")
  }

  /** Fold any number of [[profileSketch]] outputs (whole tables
    * unioned) into one: sums for the exact counts, HLL union for the
    * sketch states. Associative and commutative — batch order never
    * matters. */
  def mergeProfiles(profiles: DataFrame): DataFrame =
    profiles.groupBy(col("source")).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      hll_union_agg(col("doc_sketch"), allowDifferentLgConfigK = false)
        .as("doc_sketch"),
      hll_union_agg(col("vocab_sketch"), allowDifferentLgConfigK = false)
        .as("vocab_sketch"),
      // element-wise sum — histograms over disjoint batches compose.
      // coalesce: a profile row written BEFORE the histogram existed
      // (schema-merged read gives it NULL) contributes zeros — its
      // length distribution is unrecoverable, so quantiles then cover
      // the rows profiled since; a NULL would instead silently drop
      // the WHOLE source from the sum
      array((0 until LenHistBuckets).map(i =>
        sum(coalesce(element_at(col("len_hist"), i + 1), lit(0L)))): _*)
        .as("len_hist"))

  /** Human-readable estimates off a profile: distinct document
    * contents (= exact-dup exposure: n_docs − distinct_docs ≈ dup
    * count) and vocabulary size, per source. */
  def profileEstimate(profile: DataFrame): DataFrame =
    profile.select(col("source"), col("n_docs"), col("n_tokens"),
      hll_sketch_estimate(col("doc_sketch")).as("distinct_docs"),
      hll_sketch_estimate(col("vocab_sketch")).as("vocab_size"),
      histQuantile(col("len_hist"), 0.5).as("p50_len"),
      histQuantile(col("len_hist"), 0.95).as("p95_len"))

  /** CCNet-style perplexity terciles: every scoreable document is
    * bucketed head / middle / tail WITHIN ITS LANGUAGE by unigram-LM
    * perplexity ([[unigramLm]]) — the standard curation split where
    * "head" (lowest perplexity = most LM-like) feeds training first
    * and "tail" is the gibberish screen (CCNet, Wenzek et al. 2020).
    *
    * This exact form ranks with `ntile(3)` over (ppl, doc_id) — pure
    * integer arithmetic once the order is total, so the DuckDB twin is
    * bit-exact. It costs one SORT PER LANGUAGE (each language is one
    * window partition): correct at any corpus size but serialized per
    * language — the gate-checkable fixture. The production form at
    * 100 TB is [[pplBucketByCutoff]]: derive per-language cutoffs once
    * (an approx-percentile aggregate, a few rows), then bucket by
    * comparison — a broadcast join + projection, no global sort.
    * Token-less documents have no perplexity and are absent, exactly
    * like [[unigramLm]]. */
  def pplBucket(documents: DataFrame): DataFrame = {
    val scored = unigramLm(documents)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("ppl"), col("doc_id"))
    documents.select(col("doc_id"), col("lang"))
      .join(scored, Seq("doc_id"))
      .withColumn("tercile", ntile(3).over(w))
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Scale form of [[pplBucket]]: per-language perplexity cutoffs are
    * computed ONCE as a tiny aggregate (`approx_percentile` at p33/p67
    * — a mergeable sketch, so the aggregate is one shuffle of sketch
    * states, never a sort) and every document buckets by comparing its
    * ppl against its language's two cutoffs via a broadcast join.
    * Bucket boundaries are approximate where ntile's are exact —
    * documents within the sketch's error of a cutoff may land one
    * bucket over (spec quantifies the agreement); everything far from
    * the cutoffs is identical. This is the form whose cost is
    * O(corpus) scan + O(languages) state at any scale.
    *
    * NULL-lang documents (failed language id — routine in real
    * curation data) bucket together exactly like [[pplBucket]]'s
    * window does: the cutoff aggregate keeps a NULL-lang group and the
    * cutoff join is NULL-SAFE — a plain equi-join would silently drop
    * every such document from the output. */
  def pplBucketByCutoff(documents: DataFrame): DataFrame = {
    // pinned: both the cutoff aggregate and the final bucketing read
    // the scored frame — without the pin the whole unigram scoring
    // pass (explode + count join + two aggregations) runs twice
    val scored = CacheScope.pin(documents.select(col("doc_id"), col("lang"))
      .join(unigramLm(documents), Seq("doc_id")))
    bucketByCutoffs(scored, pplCutoffs(scored))
  }

  /** Per-language p33/p67 perplexity cutoffs of a scored
    * (doc_id, lang, …, ppl) frame — O(languages) rows, the frozen
    * "model" the streaming bucket twin scores against. The lang
    * column is renamed so [[bucketByCutoffs]]'s null-safe join never
    * meets an ambiguous reference. */
  def pplCutoffs(scored: DataFrame): DataFrame =
    scored.groupBy(col("lang"))
      .agg(
        approx_percentile(col("ppl"), lit(1.0 / 3), lit(10000)).as("c1"),
        approx_percentile(col("ppl"), lit(2.0 / 3), lit(10000)).as("c2"))
      .withColumnRenamed("lang", "__cut_lang")

  /** Bucket a scored frame against [[pplCutoffs]] — NULL-SAFE on the
    * language so failed-language-id documents bucket as their own
    * group instead of silently vanishing. Shared verbatim by the
    * batch and streaming forms so the bucket rule cannot drift. */
  def bucketByCutoffs(scored: DataFrame, cuts: DataFrame): DataFrame =
    scored.join(broadcast(cuts), col("lang") <=> col("__cut_lang"))
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("ppl") <= col("c1"), "head")
          .when(col("ppl") <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))

  /** Domain-mixture reweighting: given TARGET sampling shares for named
    * sources (the "30% wiki, 30% books, rest uniform" spec every
    * training-mix config states), emit per source the observed token
    * share and the sampling weight (`target_share / token_share`) that
    * a weighted sampler ([[LlmPrep.sampleWeighted]]) or loss reweighting
    * applies to realize the target mix. Unnamed sources split the
    * leftover target mass evenly; a target naming an absent source is
    * an error (silently renormalizing would hide a config typo).
    *
    * Scale shape: ONE groupBy(source) pass over the corpus, pinned so
    * the totals row and the output both read the O(sources)-row
    * aggregate rather than re-scanning; all mixture arithmetic happens
    * on that aggregate. The absent-source check rides the plan as an
    * `assert_true` on the named-source count — no driver collect, no
    * second pass, and a config typo still fails the job loudly. */
  def domainMix(documents: DataFrame,
      target: Map[String, Double]): DataFrame = {
    val perSource = CacheScope.pin(documents
      .select(col("source"), size(toks(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens")))
    mixArithmetic(perSource, target)
  }

  /** [[domainMix]] computed from a (merged) [[profileSketch]] instead
    * of the corpus: the profile's `n_docs`/`n_tokens` are EXACT sums
    * maintained incrementally, so the mixture weights come out
    * identical to a full corpus scan (spec-asserted) at the cost of
    * reading O(sources) profile rows — the streaming-telemetry path:
    * [[graft.streaming.StreamingProfile]] keeps shard profiles per
    * micro-batch, so current mix weights are always one tiny
    * aggregate away, with zero corpus passes. */
  def domainMixFromProfile(profile: DataFrame,
      target: Map[String, Double]): DataFrame =
    // count-only fold of the shard rows: the HLL/histogram states are
    // irrelevant to the mix, so don't pay their union
    mixArithmetic(
      profile.groupBy(col("source")).agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens")),
      target)

  /** Mixture arithmetic over an O(sources)-row (source, n_docs,
    * n_tokens) frame. Referenced twice in the plan (totals row +
    * output) — callers hand it a pinned or trivially-recomputable
    * frame. */
  private def mixArithmetic(perSource: DataFrame,
      target: Map[String, Double]): DataFrame = {
    require(target.values.forall(v => v >= 0 && v <= 1) &&
      target.values.sum <= 1.0 + 1e-9,
      s"target shares must be in [0,1] and sum to at most 1, got $target")
    val named = target.foldLeft(lit(null).cast("double")) {
      case (acc, (src, share)) => when(col("source") === src, share)
        .otherwise(acc)
    }
    val namedMass = lit(target.values.sum)
    val totals = perSource.agg(
      sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"),
      sum(when(col("source").isInCollection(target.keys), 1L)
        .otherwise(0L)).as("n_named"))
    // two in-plan config checks: every named source exists, and when
    // the target names EVERY corpus source its shares must sum to ~1 —
    // otherwise there is no unnamed source to absorb the leftover and
    // the realized mix silently sums below 1 (the exact silent-typo
    // class this operator exists to reject)
    val namedPresent = when(assert_true(
      col("n_named") === lit(target.size.toLong),
      concat(lit("domainMix: target names "),
        lit(target.size.toLong) - col("n_named"),
        lit(" source(s) absent from the corpus — fix the mixture " +
          s"config (targets: ${target.keys.toSeq.sorted.mkString(", ")})")))
      .isNull &&
      assert_true(
        col("n_named") < col("n_sources") ||
          lit(math.abs(target.values.sum - 1.0) <= 1e-9),
        lit("domainMix: target names every corpus source but its " +
          s"shares sum to ${target.values.sum}, not 1 — no unnamed " +
          "source exists to absorb the leftover mass"))
      .isNull, col("target_share"))
    perSource.crossJoin(broadcast(totals))
      .withColumn("target_share", coalesce(named,
        (lit(1.0) - namedMass) / (col("n_sources") - col("n_named"))))
      .withColumn("target_share", namedPresent)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tot_tokens"), 6).as("token_share"),
        round(col("target_share"), 6).as("target_share"),
        round(col("target_share") /
          (col("n_tokens") / col("tot_tokens")), 6).as("weight"))
  }

  val CalibBuckets = 10

  /** Cross-source quality-score calibration: a raw score (the shared
    * token-entropy kernel, [[LlmPrep.entropy]]) is NOT comparable
    * across heterogeneous sources — a web source and a books source
    * have different score distributions, so one global threshold
    * over- or under-prunes per source. Quantile normalization fixes
    * it: percent_rank WITHIN source (ties broken by doc_id so the
    * rank is cross-engine exact), bucketed into [[CalibBuckets]]
    * deciles — "keep the top 30% of EACH source" becomes a plain
    * bucket filter. One window over the source partitioning; the
    * score scan is the entropy kernel's. */
  def calibrateBySource(documents: DataFrame): DataFrame = {
    val scores = LlmPrep.entropy(documents)
      .select(col("doc_id"), col("token_entropy").as("score"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score"), col("doc_id"))
    documents.select(col("doc_id"), col("source"))
      .join(scores, Seq("doc_id"))
      .withColumn("__pr", percent_rank().over(w))
      .select(col("doc_id"), col("source"), col("score"),
        round(col("__pr"), 6).as("pct"),
        least(floor(col("__pr") * CalibBuckets),
          lit(CalibBuckets - 1L)).cast("long").as("bucket"))
  }

  val DistinctiveK = 10

  /** Distinctive vocabulary per source (Monroe et al.'s "Fightin'
    * Words" shape, simplified): smoothed log-odds of each token in a
    * source vs the REST of the corpus, variance-normalized —
    * `z = Δ / sqrt(1/(n_s+0.5) + 1/(n_r+0.5))` with
    * `Δ = ln((n_s+.5)/(T_s−n_s+.5)) − ln((n_r+.5)/(T_r−n_r+.5))` —
    * top-k per source by (rounded z DESC, token). Everything after
    * the one token scan is vocabulary-sized; grand totals ride a
    * one-row broadcast. Keep character-parallel to
    * [[LlmCorpusSql.distinctiveTermsSql]]. */
  def distinctiveTerms(documents: DataFrame,
      k: Int = DistinctiveK): DataFrame = {
    val counts = documents
      .select(col("source"), explode(toks(col("text"))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
    val bySource = counts.groupBy(col("source"))
      .agg(sum(col("n")).as("ts"))
    val byToken = counts.groupBy(col("token"))
      .agg(sum(col("n")).as("nt"))
    val grand = counts.agg(sum(col("n")).cast("double").as("g"))
    val ns = col("n").cast("double")
    val nr = (col("nt") - col("n")).cast("double")
    val tsd = col("ts").cast("double")
    val delta = log((ns + lit(0.5)) / (tsd - ns + lit(0.5))) -
      log((nr + lit(0.5)) / (col("g") - tsd - nr + lit(0.5)))
    val scored = counts
      .join(bySource, Seq("source"))
      .join(byToken, Seq("token"))
      .crossJoin(broadcast(grand))
      .withColumn("z", round(delta /
        sqrt(lit(1.0) / (ns + lit(0.5)) + lit(1.0) / (nr + lit(0.5))),
        6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("z").desc, col("token"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("token"), col("n"), col("z"),
        col("rank"))
  }
}

/** DuckDB twin of [[LlmCorpus]] — same hash family, same window/stride
  * constants, same fold and rounding conventions. */
object LlmCorpusSql {

  import LlmCorpus._

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"

  /** Twin of [[LlmCorpus.bigramLm]] — same smoothing association
    * order as the unigram twin, same µ-doc drop rule. */
  val bigramLmSql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
    uni AS (SELECT t.u AS tok, count(*) AS c
      FROM tk, UNNEST(toks) AS t(u) GROUP BY 1),
    vs AS (SELECT CAST(count(*) AS DOUBLE) AS v_size FROM uni),
    pr AS (SELECT doc_id, toks[i] AS l, toks[i + 1] AS r
      FROM tk, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2),
    bi AS (SELECT l, r, count(*) AS c2 FROM pr GROUP BY 1, 2),
    sc AS (SELECT doc_id,
        ln(coalesce(c2, 0) + 1) - ln(c + v_size) AS logp
      FROM pr LEFT JOIN bi USING (l, r)
        JOIN uni ON pr.l = uni.tok, vs)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
      round(avg(logp), 6) AS avg_logp,
      round(exp(-avg(logp)), 6) AS ppl
    FROM sc GROUP BY doc_id"""

  /** Twin of [[LlmCorpus.calibrateBySource]] — same entropy kernel as
    * the llm_entropy oracle, same tie order, same decile floor. */
  val calibrateSql: String =
    s"""WITH tk AS (SELECT doc_id, source, $toksSql AS toks
         FROM documents),
    tf AS (SELECT doc_id, t.u, count(*) AS k
      FROM tk, UNNEST(toks) AS t(u) GROUP BY 1, 2),
    te AS (SELECT doc_id,
      round(log2(sum(k)) - sum(k * log2(k)) / sum(k), 6) AS score
      FROM tf GROUP BY doc_id),
    s AS (SELECT d.doc_id, d.source, coalesce(te.score, 0.0) AS score
      FROM documents d LEFT JOIN te ON te.doc_id = d.doc_id)
    SELECT doc_id, source, score,
      round(percent_rank() OVER w, 6) AS pct,
      CAST(least(floor(percent_rank() OVER w * $CalibBuckets),
                 ${CalibBuckets - 1}) AS BIGINT) AS bucket
    FROM s WINDOW w AS (PARTITION BY source ORDER BY score, doc_id)"""

  /** Twin of [[LlmCorpus.distinctiveTerms]] — identical smoothed
    * log-odds association order. */
  val distinctiveTermsSql: String =
    s"""WITH tk AS (SELECT source, $toksSql AS toks FROM documents),
    counts AS (SELECT source, t.u AS token, count(*) AS n
      FROM tk, UNNEST(toks) AS t(u) GROUP BY 1, 2),
    bys AS (SELECT source, sum(n) AS ts FROM counts GROUP BY 1),
    byt AS (SELECT token, sum(n) AS nt FROM counts GROUP BY 1),
    gt AS (SELECT CAST(sum(n) AS DOUBLE) AS g FROM counts),
    sc AS (SELECT c.source, c.token, c.n,
      round((ln((CAST(c.n AS DOUBLE) + 0.5)
              / (CAST(ts AS DOUBLE) - CAST(c.n AS DOUBLE) + 0.5))
           - ln((CAST(nt - c.n AS DOUBLE) + 0.5)
              / (g - CAST(ts AS DOUBLE)
                 - CAST(nt - c.n AS DOUBLE) + 0.5)))
        / sqrt(1.0 / (CAST(c.n AS DOUBLE) + 0.5)
             + 1.0 / (CAST(nt - c.n AS DOUBLE) + 0.5)), 6) AS z
      FROM counts c JOIN bys USING (source) JOIN byt USING (token), gt)
    SELECT source, token, n, z, rank FROM (
      SELECT source, token, n, z,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY z DESC, token) AS BIGINT) AS rank
      FROM sc)
    WHERE rank <= $DistinctiveK"""

  val shuffleShardsSql: String =
    s"""WITH h AS (SELECT doc_id,
      CAST(len($toksSql) AS BIGINT) AS n_tokens,
      md5('shard:' || CAST(doc_id AS VARCHAR)) AS hh
      FROM documents),
    s AS (SELECT doc_id, n_tokens,
      CAST('0x' || substr(hh, 1, 4) AS BIGINT) % $ExportShards AS shard,
      substr(hh, 5, 28) AS hsuf
      FROM h)
    SELECT doc_id, shard,
      CAST(row_number() OVER (PARTITION BY shard
        ORDER BY hsuf, doc_id) AS BIGINT) AS seq,
      n_tokens
    FROM s"""

  val unigramLmSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
    cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    stats AS (SELECT sum(c) AS n_total, count(*) AS v_size FROM cnt),
    scored AS (SELECT doc_id,
      ln(c + 1) - ln(n_total + v_size) AS logp
      FROM t JOIN cnt USING (tok) CROSS JOIN stats)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      round(avg(logp), 6) AS avg_logp,
      round(exp(-avg(logp)), 6) AS ppl
    FROM scored GROUP BY doc_id"""

  val pplBucketSql: String =
    s"""SELECT doc_id, lang, ppl,
      CASE ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id)
        WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
      FROM (SELECT d.doc_id, d.lang, s.ppl
            FROM documents d JOIN ($unigramLmSql) s USING (doc_id))"""

  val domainMixSql: String = {
    val named = MixTargets.map { case (src, share) =>
      s"WHEN source = '$src' THEN CAST($share AS DOUBLE)"
    }.mkString(" ")
    val inList = MixTargets.map(t => s"'${t._1}'").mkString(", ")
    val mass = MixTargets.map(_._2).sum
    s"""WITH ps AS (SELECT source, count(*) AS n_docs,
      CAST(sum(len($toksSql)) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
      count(*) AS n_sources,
      CAST(sum(CASE WHEN source IN ($inList) THEN 1 ELSE 0 END) AS BIGINT)
        AS n_named
      FROM ps),
    x AS (SELECT source, n_docs, n_tokens, tot_tokens,
      CASE $named ELSE (CAST(1.0 AS DOUBLE) - CAST($mass AS DOUBLE))
        / (n_sources - n_named) END AS ts
      FROM ps CROSS JOIN t)
    SELECT source, n_docs, n_tokens,
      round(n_tokens / tot_tokens, 6) AS token_share,
      round(ts, 6) AS target_share,
      round(ts / (n_tokens / tot_tokens), 6) AS weight
    FROM x"""
  }

  val substrDupSql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
    ng AS (SELECT doc_id,
      list_distinct([array_to_string(toks[i:i+${DupN - 1}], ' ')
        for i in range(1, len(toks) - ${DupN - 2})]) AS grams
      FROM tk WHERE len(toks) >= $DupN),
    posting AS (SELECT doc_id, g.gram
      FROM ng, UNNEST(grams) AS g(gram)),
    pdf AS (SELECT doc_id, count(*) OVER (PARTITION BY gram) AS df
      FROM posting)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) / count(*), 6)
        AS dup_ratio
    FROM pdf GROUP BY doc_id"""

  private val trustedInSql =
    TrustedSources.map(s => s"'$s'").mkString(", ")

  val qualityClfSql: String =
    s"""WITH t AS (SELECT doc_id, source IN ($trustedInSql) AS trusted,
      unnest($toksSql) AS tok FROM documents),
    cnt AS (SELECT tok,
      sum(CASE WHEN trusted THEN 1 ELSE 0 END) AS c_pos,
      sum(CASE WHEN NOT trusted THEN 1 ELSE 0 END) AS c_neg
      FROM t GROUP BY tok),
    st AS (SELECT sum(c_pos) AS n_pos, sum(c_neg) AS n_neg,
      count(*) AS v_size FROM cnt),
    d AS (SELECT
      sum(CASE WHEN source IN ($trustedInSql) THEN 1 ELSE 0 END) AS d_pos,
      sum(CASE WHEN source NOT IN ($trustedInSql) THEN 1 ELSE 0 END)
        AS d_neg
      FROM documents),
    sc AS (SELECT doc_id,
      ln(c_pos + 1) - ln(n_pos + v_size)
        - ln(c_neg + 1) + ln(n_neg + v_size) AS lo
      FROM t JOIN cnt USING (tok) CROSS JOIN st)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      round(ln(d_pos) - ln(d_neg) + sum(lo), 6) AS score,
      (ln(d_pos) - ln(d_neg) + sum(lo)) > 0 AS pred
    FROM sc CROSS JOIN d GROUP BY doc_id, d_pos, d_neg"""

  val tfidfPairsSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    wtd AS (SELECT doc_id, term,
      tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS w
      FROM tf JOIN dfc USING (term) CROSS JOIN nd
      WHERE df <= $TfidfPairsDfCap),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM wtd
      GROUP BY doc_id),
    wn AS (SELECT w.doc_id, w.term, w.w, n.nrm
      FROM wtd w JOIN nrm n USING (doc_id)),
    und AS (SELECT a.doc_id AS qid, b.doc_id AS nbr,
      round(sum(a.w * b.w) / (max(a.nrm) * max(b.nrm)), 6) AS cosine
      FROM wn a JOIN wn b
        ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    pairs AS (SELECT qid, nbr, cosine FROM und
      UNION ALL SELECT nbr AS qid, qid AS nbr, cosine FROM und),
    rk AS (SELECT qid, nbr, cosine,
      CAST(row_number() OVER (PARTITION BY qid
        ORDER BY cosine DESC, nbr) AS BIGINT) AS rank
      FROM pairs)
    SELECT qid, nbr, cosine, rank FROM rk WHERE rank <= $TfidfPairsK"""

  val keywordsSql: String =
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      GROUP BY doc_id, term),
    dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    x AS (SELECT doc_id, term,
      tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0) AS tfidf
      FROM tf JOIN dfc USING (term) CROSS JOIN nd),
    r AS (SELECT doc_id, term, tfidf,
      CAST(row_number() OVER (PARTITION BY doc_id
        ORDER BY tfidf DESC, term) AS BIGINT) AS rk
      FROM x)
    SELECT doc_id, term, round(tfidf, 6) AS tfidf, rk
    FROM r WHERE rk <= $KeywordsK"""

  /** Twin of [[LlmCorpus.curationReport]] — each stage's twin runs as
    * a subquery (DuckDB scopes their CTEs locally), joined over the
    * document spine exactly like the operator. */
  val curationReportSql: String =
    s"""WITH text AS (SELECT doc_id FROM (${LlmTextSql.curateSql()})),
    clf AS (SELECT doc_id, pred FROM ($qualityClfSql)),
    sem AS (SELECT vec_id AS doc_id, keep
      FROM (${LlmSimSql.semDedupSql})),
    contam AS (SELECT DISTINCT train_id AS doc_id
      FROM (${LlmSimSql.contaminationEmbedSql}))
    SELECT d.doc_id,
      t.doc_id IS NOT NULL AS text_kept,
      coalesce(c.pred, false) AS clf_kept,
      coalesce(s.keep, false) AS sem_kept,
      ct.doc_id IS NOT NULL AS contaminated,
      (t.doc_id IS NOT NULL AND coalesce(c.pred, false)
        AND coalesce(s.keep, false) AND ct.doc_id IS NULL) AS kept
    FROM documents d
    LEFT JOIN text t ON d.doc_id = t.doc_id
    LEFT JOIN clf c ON d.doc_id = c.doc_id
    LEFT JOIN sem s ON d.doc_id = s.doc_id
    LEFT JOIN contam ct ON d.doc_id = ct.doc_id"""

  val vocabEncodeSql: String =
    s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok,
      generate_subscripts(toks, 1) AS pos FROM tk),
    cnt AS (SELECT tok, count(*) AS n FROM t GROUP BY tok),
    v AS (SELECT tok,
      CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT)
        AS token_id
      FROM cnt ORDER BY n DESC, tok LIMIT ${LlmPrep.VocabSize})
    SELECT doc_id, CAST(pos AS BIGINT) AS pos,
      CAST(coalesce(token_id, 0) AS BIGINT) AS token_id
    FROM t LEFT JOIN v USING (tok)"""
}
