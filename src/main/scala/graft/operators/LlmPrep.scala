package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data preparation operators beyond dedup/similarity (the
  * curation steps a pretraining pipeline runs between raw corpus and
  * tokenized shards): eval-set contamination detection, stratified
  * quota sampling, sequence packing, and entropy-based quality signals.
  *
  * Same cross-engine determinism rules as [[LlmText]]: hashes are md5
  * hex strings, ranks are explicit orderings over those strings, and
  * every floating aggregate is rounded to 6 places on both sides.
  *
  * Keep in sync with [[LlmPrepSql]].
  */
object LlmPrep {

  /** Whitespace tokens of lower(text), empties dropped (same
    * tokenization as [[LlmText]] — the native
    * [[graft.functions.TokenSplit]] scan). */
  private def toks(c: Column): Column =
    call_function("graft_tokens", c)

  /** Global rank over an already-limited head frame (≤k rows) without
    * a window: count-of-predecessors via a broadcast self-join. An
    * unpartitioned window would do the same single-partition work but
    * logs a `WindowExec: No Partition Defined` warning per run, and at
    * bench time that spam drowns the one-line metric JSON the driver
    * parses from stdout; a constant partition key does not help —
    * Catalyst's EliminateWindowPartitions folds it away again. `tie`
    * must be unique per row. Ranks by (`by` DESC, `tie` ASC);
    * `runningSum = Some((src, dst))` additionally emits the inclusive
    * prefix sum of `src` in rank order as `dst`. O(k²) comparisons —
    * driver-scale by construction, never corpus-scale. */
  private def headRanked(headRaw: DataFrame, by: String, tie: String,
      rankName: String,
      runningSum: Option[(String, String)] = None): DataFrame = {
    // Both join sides reference the head; without the pin the whole
    // corpus-scale subtree above the limit would execute twice.
    val head = CacheScope.pin(headRaw)
    val pred = (col(s"b.$by") > col(s"a.$by")) ||
      (col(s"b.$by") === col(s"a.$by") &&
        col(s"b.$tie") <= col(s"a.$tie"))
    val rank = count(lit(1)).cast("long").as(rankName)
    val aggs = runningSum match {
      case Some((src, dst)) => Seq(rank, sum(col(s"b.$src")).as(dst))
      case None             => Seq(rank)
    }
    head.as("a").join(broadcast(head.as("b")), pred)
      .groupBy(head.columns.map(c => col(s"a.$c")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(rankName))
  }

  /** Every doc_id ≡ 0 (mod [[EvalMod]]) plays the held-out eval set in
    * [[contamination]]; the rest is the training corpus. A real
    * pipeline would read a separate eval table — the split keeps the
    * operator runnable (and oracle-checkable) on the one `documents`
    * table the driver ships. */
  val EvalMod = 20

  /** Contamination n-gram length. Production contamination checks use
    * 8-13 token grams; 5 keeps enough grams per document at this
    * corpus's 25-200-token lengths. */
  val ContamN = 5

  /** Train-side document frequency above which a gram stops generating
    * contamination candidates: a gram appearing in df train docs emits
    * df rows per eval occurrence, so corpus-wide boilerplate would make
    * hot keys (the same quadratic-hot-key argument as
    * [[LlmText.NgramDfCap]], one-sided because the eval set is small by
    * construction). */
  val ContamDfCap = 50

  /** Minimum shared grams before an (eval, train) pair is reported:
    * one shared 5-gram in a small-vocabulary corpus is coincidence. */
  val ContamMinShared = 2

  /** Distinct word n-gram shingles of each document. Shared with the
    * streaming twin ([[graft.streaming.StreamingContamination]]) so the
    * batch and streaming tokenizations can never drift apart — the
    * parity its spec asserts would otherwise only hold at test time. */
  private[graft] def ngrams(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("doc_id"),
        call_function("graft_ngrams", col("text"), lit(n)).as("grams"))
      .filter(size(col("grams")) > 0)

  /** Eval-set contamination: which eval documents share ≥
    * [[ContamMinShared]] distinct [[ContamN]]-grams with which train
    * documents. The scale shape is the one-sided inverted index: train
    * postings are df-capped (see [[ContamDfCap]]), then equi-joined to
    * the eval postings ON THE GRAM — per-gram work is bounded by
    * cap × eval_df, and the eval side is small by construction, so the
    * plan is a shuffle-bounded equi-join at any corpus size (the
    * standard decontamination layout: index the eval set, stream the
    * train corpus past it). */
  def contamination(documents: DataFrame, evalMod: Int = EvalMod,
      n: Int = ContamN, dfCap: Int = ContamDfCap,
      minShared: Int = ContamMinShared): DataFrame = {
    // Pin the ARRAYS, not the exploded postings: explode over the raw
    // n-gram expression makes InferFiltersFromGenerate duplicate the
    // whole gram construction (tokenize + transform + distinct) into a
    // non-codegen Filter — measured 16s vs 0.3s at sf0.1 for the same
    // explode over a cached array column ([[LlmText]] pins its
    // shingles for the same reason).
    val grams = CacheScope.pin(ngrams(documents, n))
    val posting =
      grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val evalSide = posting.filter(pmod(col("doc_id"), lit(evalMod)) === 0)
    val trainSide = posting.filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("df") <= dfCap)
    evalSide.select(col("doc_id").as("eval_id"), col("gram"))
      .join(trainSide.select(col("doc_id").as("train_id"), col("gram")),
        Seq("gram"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** The REMOVAL step [[contamination]] feeds: drop every train
    * document flagged against any eval document, keep the rest —
    * `(doc_id, n_tokens)` of the surviving train corpus. One
    * left-anti equi-join on the flagged id set (contamination-output
    * sized, broadcastable in practice); eval documents are not train
    * rows and never appear. The complete decontamination workflow is
    * therefore detect → anti-join, both shuffle-bounded. */
  def decontaminate(documents: DataFrame, evalMod: Int = EvalMod,
      n: Int = ContamN, dfCap: Int = ContamDfCap,
      minShared: Int = ContamMinShared): DataFrame = {
    val flagged = contamination(documents, evalMod, n, dfCap, minShared)
      .select(col("train_id").as("doc_id")).distinct()
    documents
      .filter(pmod(col("doc_id"), lit(evalMod)) =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"),
        size(call_function("graft_tokens", col("text")))
          .cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Per-stratum sampling quota of [[sampleStratified]]. */
  val StratumCap = 100

  /** Stratified quota sampling: keep at most `cap` documents per
    * stratum (the `lang` column), chosen by a DETERMINISTIC uniform
    * order — rank within stratum by md5 of the doc id. Hash-order
    * sampling is the distributed idiom: it needs no global RNG state,
    * re-runs reproduce the same sample, and adding documents never
    * reshuffles the survivors' relative order. One shuffle on the
    * stratum key; the rank window is per-stratum. A stratum far larger
    * than its cap makes that window's sort the hot key — at 100 TB the
    * rank would switch to a two-pass quantile cutoff on the same hash
    * (take the cap-th smallest hash per stratum, keep rows below it),
    * which is the identical sample without the full sort. */
  def sampleStratified(documents: DataFrame, cap: Int = StratumCap)
      : DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("smp"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("smp"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("lang"), col("rk"))

  /** Domain-mixture rates of [[sampleWeighted]]: per-source keep
    * probabilities (the pretraining "domain weights" step — upweight
    * curated sources, downsample the crawl), with a default for
    * sources not listed. */
  val MixRates: Seq[(String, Double)] =
    Seq("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.25)
  val MixDefaultRate = 0.1

  /** Keep threshold for `rate` as an 8-hex-char string: a doc survives
    * iff the first 8 hex chars of its salted md5 compare BELOW it.
    * Lowercase hex string order equals numeric order (digits then
    * letters, ASCII-monotone), so the comparison is exact without any
    * cross-engine hex-to-int parsing; rate ≥ 1 uses "g", which is
    * above every hex string (keep-all). */
  private[graft] def rateThreshold(rate: Double): String =
    if (rate >= 1.0) "g"
    else f"${math.max(0L, (rate * 4294967296d).toLong)}%08x"

  /** Weighted (domain-mixture) sampling: keep each document with its
    * source's probability, decided by a deterministic salted-hash
    * uniform — re-runs reproduce the same sample and no RNG state is
    * shared across executors. Shape: a pure map-side filter (the rate
    * table folds into a literal CASE) — no shuffle, no window, nothing
    * corpus-wide; the cheapest possible plan at any scale. Complements
    * [[sampleStratified]]: rates shape the MIXTURE, quotas cap the
    * SIZE. */
  def sampleWeighted(documents: DataFrame,
      rates: Seq[(String, Double)] = MixRates,
      defaultRate: Double = MixDefaultRate): DataFrame = {
    val u8 = substring(
      md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8)
    val thr = rates.foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (s, r)) =>
        when(col("source") === s, lit(rateThreshold(r))).otherwise(acc)
    }
    documents
      .filter(u8 < thr)
      .select(col("doc_id"), col("source"))
  }

  /** Per-mille split thresholds for [[splitAssign]]: <900 train,
    * <950 val, rest test. */
  val SplitTrainPm = 900
  val SplitValPm   = 950

  /** Deterministic train/val/test split assignment: each document's
    * membership is a pure function of its id (md5 per-mille bucket),
    * so it NEVER changes as the corpus grows or is re-partitioned —
    * the property that keeps eval documents from drifting into train
    * across corpus releases (a `randomSplit` re-draws every release
    * and leaks). Zero shuffle: one hash projection, the cheapest plan
    * at any scale. Same salt-prefix + first-4-hex-chars idiom as
    * [[LlmCorpus.shuffleShards]] so the DuckDB twin is exact. */
  def splitAssign(documents: DataFrame,
      trainPm: Int = SplitTrainPm, valPm: Int = SplitValPm): DataFrame = {
    val pm = conv(substring(
      md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 4),
      16, 10).cast("long") % 1000
    documents.select(col("doc_id"), col("source"),
      when(pm < trainPm, "train")
        .when(pm < valPm, "val")
        .otherwise("test").as("split"))
  }

  /** Token budget per packed sequence in [[pack]] (a context window). */
  val PackBudget = 512

  /** Shard count of [[pack]]'s concatenation order. */
  val PackShards = 8

  /** Sequence packing — the concat-and-chunk layout pretraining
    * actually uses: documents are concatenated in a deterministic order
    * and the stream is cut every `budget` tokens. Each document is
    * assigned the bin its FIRST token falls in. Sharding bounds the
    * window: the running token offset is per-shard (shard = doc_id mod
    * `nShards`), so the cumulative sum parallelizes across shards and
    * no single ordered window spans the corpus — at 100 TB the shard
    * count scales with the cluster, each shard's window stays
    * executor-sized, and bins remain reproducible because the
    * (shard, doc_id) order is data-independent. */
  def pack(documents: DataFrame, budget: Int = PackBudget,
      nShards: Int = PackShards): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards)).as("shard"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("token_offset") / budget))
  }

  /** Context-window size (tokens) of [[chunk]]. */
  val ChunkSize = 64

  /** Token overlap between consecutive [[chunk]] windows. */
  val ChunkOverlap = 16

  /** Context-window chunking: cut each document's token stream into
    * fixed-size windows with overlap — the document-preserving
    * alternative to [[pack]]'s concat-and-chunk (RAG indexing and
    * long-document SFT prep both want chunks that never cross a
    * document boundary). Window k covers tokens
    * `[k·stride, k·stride + size)` with `stride = size − overlap`;
    * the window count is `max(1, ceil((n − overlap) / stride))`, which
    * emits the final short window only when it contributes tokens the
    * previous one did not (a trailing window fully contained in its
    * predecessor is never emitted).
    *
    * Shape: one codegen'd projection (native token kernel + slice /
    * array_join) and a generate — no shuffle, no window state;
    * embarrassingly parallel at any corpus size, output is
    * O(input · size/stride). */
  def chunk(documents: DataFrame, size: Int = ChunkSize,
      overlap: Int = ChunkOverlap): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"chunk: need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val arrLen = org.apache.spark.sql.functions.size _
    def window = slice(col("t"),
      (col("chunk_ix") * stride + 1).cast("int"), lit(size))
    documents
      .select(col("doc_id"), toks(col("text")).as("t"))
      .withColumn("n", arrLen(col("t")).cast("long"))
      .filter(col("n") > 0)
      .withColumn("n_chunks", greatest(lit(1L),
        ceil((col("n") - lit(overlap)).cast("double") / lit(stride))
          .cast("long")))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"),
        arrLen(window).cast("long").as("n_chunk_tokens"),
        array_join(window, " ").as("chunk"))
  }

  /** Gram length of [[boilerplateScrub]]. */
  val BoilerN = 3

  /** Corpus document frequency above which a gram counts as
    * boilerplate. */
  val BoilerDfCap = 5

  /** Duplicated-n-gram scrub — the corpus-level boilerplate removal
    * step (headers, navigation chrome, license blurbs) web-scale
    * cleaning pipelines run after per-document dedup: any `n`-gram
    * occurring in more than `dfCap` distinct documents is boilerplate,
    * and every token position covered by a boilerplate gram is removed
    * from its document. Emits one row per non-empty document with the
    * scrubbed text and removal counts (docs can come out empty —
    * they're reported, not dropped, so the caller decides).
    *
    * Shape: the gram document-frequency aggregate is the one
    * corpus-sized shuffle (map-side combinable, same profile as
    * [[contamination]]/[[vocab]]); the boilerplate set is small BY
    * CONSTRUCTION (only corpus-wide repeats survive the cap) so it
    * broadcasts into the position scan; the covered-position distinct
    * and the anti-join shuffle on (doc, position) — bounded by token
    * count, never gram-pair count. Per-document reassembly is a
    * bounded-size array_sort, no ordered window spans the corpus. */
  def boilerplateScrub(documents: DataFrame, n: Int = BoilerN,
      dfCap: Int = BoilerDfCap): DataFrame = {
    require(n >= 1, s"boilerplateScrub: n must be >= 1, got $n")
    val arrLen = org.apache.spark.sql.functions.size _
    val base = documents
      .select(col("doc_id"), toks(col("text")).as("t"))
      .withColumn("n_tokens", arrLen(col("t")).cast("long"))
      .filter(col("n_tokens") > 0)
    // gram start positions, 1-based: s ∈ [1, len−n+1]. The when() guard
    // matters: Spark's sequence(1, stop) runs DESCENDING for stop < 1,
    // so a short doc would fabricate starts instead of none.
    val grams = base
      .select(col("doc_id"), col("t"),
        explode(when(col("n_tokens") >= n,
          sequence(lit(1), (col("n_tokens") - (n - 1)).cast("int")))
          .otherwise(array().cast("array<int>"))).as("s"))
      .select(col("doc_id"), col("s"),
        array_join(slice(col("t"), col("s"), lit(n)), " ").as("gram"))
    val boiler = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > dfCap)
      .select("gram")
    val covered = grams.join(broadcast(boiler), Seq("gram"))
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + (n - 1))).as("p"))
      .distinct()
    val tokens = base
      .select(col("doc_id"), posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("p"), col("tok"))
    val kept = tokens.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("p"), col("tok")))),
            x => x.getField("tok")), " ").as("clean_text"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Vocabulary size cap of [[vocab]]. */
  val VocabSize = 50

  /** Heavy-hitter threshold (fraction of all token occurrences) and
    * sketch capacity for [[heavyTokens]]. The containment guarantee
    * needs `HeavyFrac > 1/(HeavyCap+1)` — 0.002 > 1/1025 — so the
    * same pair is valid at every corpus size. */
  val HeavyFrac = 0.002
  val HeavyCap = 1024

  /** Every token whose corpus frequency is >= `ceil(HeavyFrac * n)`
    * (n = total token occurrences), with its EXACT count — the
    * boilerplate/spam-template mining shape, via the two-pass
    * Misra-Gries sketch + bounded exact re-count
    * ([[HeavyHitters.exactFraction]]). Unlike [[vocab]]'s top-k this
    * never exchanges the full token space: the sketch pass shuffles
    * KB partials and the exact pass groups only the ≤ HeavyCap
    * candidates. */
  def heavyTokens(documents: DataFrame): DataFrame =
    HeavyHitters.exactFraction(
      documents.select(explode(toks(col("text"))).as("token")),
      col("token"), HeavyFrac, HeavyCap)

  /** Per-group threshold of [[heavyDomainTokens]]; guarantee needs
    * `HeavyDomFrac > 1/(HeavyCap+1)` — 0.005 > 1/1025 — so the pair is
    * valid for every group at every size, checked before any job. */
  val HeavyDomFrac = 0.005

  /** Per-SOURCE heavy tokens: every token whose in-source frequency is
    * >= `ceil(HeavyDomFrac * n_source)`, with its EXACT count — the
    * per-domain spam-template / boilerplate mining shape, via the
    * fully distributed grouped Misra-Gries two-pass
    * ([[HeavyHitters.exactFractionByGroup]]): per-group KB sketches,
    * candidate explode + equi-join, bounded exact re-count; no driver
    * materialization at any group count. */
  def heavyDomainTokens(documents: DataFrame): DataFrame =
    HeavyHitters.exactFractionByGroup(
      documents.select(col("source"),
        explode(toks(col("text"))).as("token")),
      "source", col("token"), HeavyDomFrac, HeavyCap)
      .withColumnRenamed("key", "token")

  /** Tokenizer vocabulary building: the corpus-wide token frequency
    * table a tokenizer trainer starts from — top [[VocabSize]] tokens
    * by count (ties broken lexically, so the cut is deterministic),
    * with each token's rank and the cumulative corpus coverage up to
    * it. Shape: one map-side-combinable count aggregate over the
    * exploded tokens, then rank/cumsum windows over the TOP-K ONLY
    * (k rows — driver-scale) plus a scalar total; the corpus-sized
    * stage is embarrassingly parallel, nothing corpus-wide is ever
    * sorted. */
  def vocab(documents: DataFrame, k: Int = VocabSize): DataFrame = {
    val counts = CacheScope.pin(documents
      .select(explode(toks(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n")))
    // scalar probe (one aggregate action on the pinned counts); the
    // top-k goes through limit = TakeOrderedAndProject, a distributed
    // partial top-k per partition + driver merge of k-row heads — the
    // rank/cumsum windows then see only k rows, so nothing corpus-wide
    // is ever globally sorted. sum over zero rows is NULL (empty or
    // all-whitespace corpus): 0 keeps the call total — the top-k is
    // empty then, so the division never evaluates.
    val total = Option(counts.agg(sum(col("n"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val head = counts.orderBy(col("n").desc, col("token")).limit(k)
    headRanked(head, "n", "token", "rank", Some(("n", "__cum")))
      .withColumn("coverage",
        round(col("__cum") / lit(total.toDouble), 6))
      .drop("__cum")
  }

  /** Top-K cap of [[bpePairs]]. */
  val BpePairsK = 50

  /** Adjacent-pair statistics — the counting step a BPE tokenizer
    * trainer iterates (count all adjacent unit pairs, merge the most
    * frequent, repeat): corpus-wide occurrence counts of adjacent
    * token pairs, top [[BpePairsK]] by count with lexical tie-break.
    * One merge round is the representative distributed workload (the
    * loop re-runs the same plan on re-segmented units); shape matches
    * [[vocab]] — a map-side-combinable count aggregate over a
    * codegen'd pair projection, top-k via TakeOrderedAndProject, rank
    * window over the k-row head only. */
  def bpePairs(documents: DataFrame, k: Int = BpePairsK): DataFrame = {
    val arrLen = org.apache.spark.sql.functions.size _
    val t = toks(col("text"))
    val pairs = documents
      .select(t.as("t"))
      .select(explode(when(arrLen(col("t")) >= 2,
        transform(sequence(lit(1), (arrLen(col("t")) - 1).cast("int")),
          i => concat_ws(" ", element_at(col("t"), i),
            element_at(col("t"), i + 1))))
        .otherwise(array().cast("array<string>"))).as("pair"))
    val counts = pairs.groupBy(col("pair")).agg(count(lit(1)).as("n"))
    headRanked(counts.orderBy(col("n").desc, col("pair")).limit(k),
      "n", "pair", "rank")
  }

  /** Recrawl suppression (time-windowed dedup): within each key (a
    * URL / content fingerprint in a crawl log), keep only the FIRST
    * row of every gap-session — a fetch is kept iff it is more than
    * `gapSec` after its kept-or-dropped predecessor's timestamp, i.e.
    * the same trigger rule as [[TemporalJoins.sessionizeByGap]], so
    * "kept rows" ≡ "session openers" by construction (a re-fetch
    * within the window refreshes nothing and is dropped; a fetch
    * after a quiet gap opens a new retained version).
    *
    * One window over the key partitioning — the lag IS the session
    * trigger, no second pass, no groupBy. Ties on the timestamp are
    * broken by `idCol` so the kept row is deterministic cross-engine.
    * NULL-timestamp rows are malformed fetch records and are dropped
    * (documented contract, mirrors the as-of family's NULL-time rule).
    * Scale: per-key sequential scan, the standard windowed-dedup
    * shape; hot keys take the sliced-sessionize path if ever needed.
    *
    * Cite: generic curation capability (Common-Crawl-style refetch
    * collapse); same gap semantics as ref's CO-trigger sessionization
    * (ref/App/etl/transform/mes_etl.py:82). */
  def recrawlDedup(log: DataFrame, keys: Seq[String], timeCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    require(keys.nonEmpty, "recrawlDedup: no key columns")
    require(gapSec > 0, s"recrawlDedup: gapSec must be > 0, got $gapSec")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col(idCol))
    log.filter(col(timeCol).isNotNull)
      .withColumn("__prev_t", lag(col(timeCol), 1).over(w))
      // cast("timestamp") first: unix_micros rejects TIMESTAMP_NTZ
      // (the events table's µs-truncated ns column arrives NTZ)
      .filter(col("__prev_t").isNull ||
        unix_micros(col(timeCol).cast("timestamp")) -
          unix_micros(col("__prev_t").cast("timestamp")) >
          gapSec * 1000000L)
      .drop("__prev_t")
  }

  val PmiMinCount = 20L
  val PmiK = 150

  /** PMI collocation mining: adjacent-token pairs scored by pointwise
    * mutual information `ln( p(a,b) / (p(a)·p(b)) )` — the classic
    * corpus-linguistics signal for multi-word expressions ("new york",
    * "machine learning") that frequency alone buries under stopword
    * pairs. `minCount` screens the unstable low-count tail BEFORE the
    * unigram joins, so the scored frame is collocation-sized.
    *
    * Shape: the pair count and unigram count are the two map-side-
    * combined aggregates over one pinned tokenized frame; the two
    * probability joins hit the vocabulary-sized unigram table (AQE
    * broadcasts it when it fits); totals ride a one-row crossJoin
    * (the [[bm25]] stats pattern). Top-k lands via TakeOrdered on the
    * ROUNDED score — float ties are broken by the pair string, so the
    * cut is identical cross-engine. Keep the pmi expression
    * character-for-character parallel to [[LlmPrepSql.pmiSql]]. */
  def collocations(documents: DataFrame, minCount: Long = PmiMinCount,
      k: Int = PmiK): DataFrame = {
    require(minCount >= 1, s"collocations: minCount >= 1, got $minCount")
    val arrLen = org.apache.spark.sql.functions.size _
    val tk = CacheScope.pin(documents.select(toks(col("text")).as("toks")))
    val pc = tk
      .select(explode(when(arrLen(col("toks")) >= 2,
        transform(sequence(lit(1), (arrLen(col("toks")) - 1).cast("int")),
          i => struct(element_at(col("toks"), i).as("l"),
            element_at(col("toks"), i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("n"))
    val uni = tk.select(explode(col("toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
    val totals = tk.agg(
      sum(arrLen(col("toks"))).cast("double").as("n_uni"),
      sum(greatest(arrLen(col("toks")) - 1, lit(0))).cast("double")
        .as("n_pair"))
    val scored = pc.filter(col("n") >= minCount)
      .join(uni.select(col("tok").as("l"), col("n_tok").as("n_a")),
        Seq("l"))
      .join(uni.select(col("tok").as("r"), col("n_tok").as("n_b")),
        Seq("r"))
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(log(
        (col("n").cast("double") / col("n_pair")) /
          ((col("n_a").cast("double") / col("n_uni")) *
            (col("n_b").cast("double") / col("n_uni")))), 6))
      .select(concat_ws(" ", col("l"), col("r")).as("pair"), col("n"),
        col("pmi"))
      .orderBy(col("pmi").desc, col("pair")).limit(k)
    headRanked(scored, "pmi", "pair", "rank")
  }

  /** Skip-gram window radius / count floor / head size for
    * [[skipgrams]]. */
  val SkipWindow = 3
  val SkipMinCount = 30L
  val SkipK = 200

  /** Skip-gram co-occurrence counts — the word2vec-style training-pair
    * generator, and [[collocations]]'s windowed generalization: every
    * ORDERED token pair (t_i, t_{i+o}) with 1 <= o <= `window` counts
    * once, so "new york city" yields (new,york), (new,city),
    * (york,city). One corpus scan; the pair explosion is window-bounded
    * (≤ W rows per token), the count a map-side-combined aggregate over
    * the pair vocabulary — the same posting-scan scale shape as PMI.
    * Output: top `k` by (n DESC, pair ASC) with a rank, count floor
    * `minCount` (rare pairs are noise at any corpus size). */
  def skipgrams(documents: DataFrame, window: Int = SkipWindow,
      minCount: Long = SkipMinCount, k: Int = SkipK): DataFrame = {
    require(window >= 1, s"skipgrams: window >= 1, got $window")
    val arrLen = org.apache.spark.sql.functions.size _
    val n = arrLen(col("toks"))
    val pairs = documents.select(toks(col("text")).as("toks"))
      .select(explode(when(n >= 2, flatten(
        transform(sequence(lit(1), (n - 1).cast("int")),
          i => transform(sequence(lit(1),
              least(lit(window), (n - i).cast("int"))),
            o => struct(element_at(col("toks"), i).as("l"),
              element_at(col("toks"), i + o).as("r"))))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("n"))
    val head = pairs.filter(col("n") >= minCount)
      .select(concat_ws(" ", col("l"), col("r")).as("pair"), col("n"))
      .orderBy(col("n").desc, col("pair")).limit(k)
    headRanked(head, "n", "pair", "rank")
  }

  /** Synthetic blocklist for [[blocklistFilter]]: content hashes of
    * every doc_id ≡ 0 (mod 17) play the "known-bad content registry"
    * (takedowns, opt-outs, toxic-content hashes). A real pipeline
    * reads a registry table; the mod split keeps the operator runnable
    * and oracle-checkable on the one `documents` table. */
  def syntheticBlocklist(documents: DataFrame): DataFrame =
    documents.filter(pmod(col("doc_id"), lit(17)) === 0)
      .select(md5(col("text")).as("bad_hash")).distinct()

  /** Blocklist filtering: drop every document whose content hash is
    * in the registry. Semantics are the EXACT anti-join; the plan is
    * the registry-scrub scale idiom — a bloom filter built from the
    * registry keys (one aggregate row, broadcast) prefilters the
    * corpus map-side, so:
    *  - docs that miss the bloom (the overwhelming majority against
    *    any realistic registry) are kept WITHOUT ever being shuffled —
    *    a bloom miss is a guaranteed non-member;
    *  - only bloom hits (true matches + the filter's false-positive
    *    rate) continue into the exact anti-join, which removes the
    *    FPs, so the composition returns exactly the anti-join's rows.
    * The two union branches re-scan the corpus, which is the right
    * trade at scale: a columnar re-scan is cheap next to shuffling
    * the full corpus into a sort-merge anti-join against a registry
    * too large to broadcast (for a broadcastable registry Spark's
    * plain broadcast anti-join already wins and the bloom degenerates
    * to a cheap pre-check of it). An empty registry aggregates to a
    * null bloom → no doc is a candidate → everything is kept, which
    * is the correct degenerate case.
    *
    * The bloom is BUILT distributed (`graft_bloom_agg`, map-side
    * combined over the registry) and its one-row binary result is
    * collected as a driver scalar — `might_contain` requires a
    * constant filter (the same way Spark's own runtime row-level
    * filtering plants it in the plan), and a single bounded scalar is
    * the sanctioned driver probe (see [[vocab]]'s total).
    * Keep in sync with [[LlmPrepSql.blocklistSql]]. */
  def blocklistFilter(documents: DataFrame, blocklist: DataFrame)
      : DataFrame = {
    val candidates = documents
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
    val bfBytes = blocklist
      .agg(call_function("graft_bloom_agg", xxhash64(col("bad_hash")),
        lit(100000L), lit(800000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bfBytes == null) return candidates // empty registry: keep all
    def maybe = call_function("graft_might_contain", lit(bfBytes),
      xxhash64(col("content_hash")))
    val cleanByBloom = candidates.filter(!maybe)
    val checkedExact = candidates.filter(maybe)
      .join(blocklist.withColumnRenamed("bad_hash", "content_hash"),
        Seq("content_hash"), "left_anti")
    cleanByBloom.unionByName(checkedExact)
  }

  /** Corpus profiling — the per-source reporting table a pipeline
    * publishes each run: document counts, token totals, and EXACT
    * token-length percentiles (p50/p90/p99, linear interpolation).
    * Spark's `percentile` aggregate buffers a value→count map per
    * group, merged map-side — with token LENGTHS as the value domain
    * the map stays tiny at any corpus size, so the exact quantile is
    * scale-safe here (an unbounded-domain metric would switch to the
    * t-digest `percentile_approx`, which no cross-engine oracle can
    * replay). Keep in sync with [[LlmPrepSql.corpusStatsSql]]. */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 6).as("mean_tokens"),
        round(expr("percentile(n_tokens, 0.5)"), 6).as("p50_tokens"),
        round(expr("percentile(n_tokens, 0.9)"), 6).as("p90_tokens"),
        round(expr("percentile(n_tokens, 0.99)"), 6).as("p99_tokens"))

  /** PII patterns of [[piiScrub]] — the ASCII subset expressible
    * identically in java.util.regex (Spark) and RE2 (the DuckDB twin):
    * email addresses, NANP-style `ddd-ddd-dddd` phone numbers, dotted
    * IPv4 literals. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Deterministic synthetic-PII injection — the sandbox corpus is
    * PII-free by construction, so the FIXTURE plants one email / phone /
    * IP on doc_id mod-5 classes 0/1/2 (derived from doc_id, so the
    * oracle can replay the identical injection); [[piiScrub]] itself is
    * generic and never sees the class. */
  def withSyntheticPii(documents: DataFrame): DataFrame =
    documents.withColumn("text", concat(col("text"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com")))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          concat(lit(" call 415-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          concat(lit(" host 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit("."),
            pmod(col("doc_id"), lit(100)).cast("string")))
        .otherwise(lit(""))))

  /** PII detection + redaction — the scrub pass a training pipeline
    * runs before anything else sees the text: per-document match counts
    * (on the ORIGINAL text) and the redacted text with each match class
    * replaced by a typed placeholder, applied email → IP → phone (the
    * patterns are mutually exclusive on any one substring, but a fixed
    * order keeps the output bytes deterministic regardless). Shape: a
    * pure per-row codegen'd projection — no shuffle, no UDF; regex
    * scans are the canonical PII pass at corpus scale (a production
    * deployment widens the pattern set, not the plan). Keep in sync
    * with [[LlmPrepSql.piiSql]]. */
  def piiScrub(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(col("text"), lit(IpRe)).cast("long").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          IpRe, "<IP>"),
        PhoneRe, "<PHONE>").as("clean_text"))
      .withColumn("pii_found",
        (col("n_emails") + col("n_phones") + col("n_ips") > 0)
          .cast("int"))

  /** Entropy-based quality signals: Shannon entropy (bits) of the
    * character distribution and of the token distribution per document.
    * Low char entropy flags repeated-character junk; low token entropy
    * flags template/boilerplate text — the standard cheap gibberish
    * screens next to [[LlmText.textStats]]'s ratio features. Shape:
    * explode → two-level aggregate, all map-side combinable; no joins,
    * no windows over the corpus. */
  def entropy(documents: DataFrame): DataFrame = {
    def dist(unit: DataFrame, outCol: String): DataFrame =
      unit.groupBy(col("doc_id"), col("u"))
        .agg(count(lit(1)).as("k"))
        .groupBy(col("doc_id"))
        .agg(round(log2(sum(col("k"))) -
          sum(col("k") * log2(col("k"))) / sum(col("k")), 6).as(outCol))
    // filter the empties: Spark's split(_, "") can emit a trailing ""
    // (java.util.regex limit -1) that DuckDB's splitter never produces
    val chars = documents.select(col("doc_id"),
      explode(filter(split(col("text"), ""), x => x =!= "")).as("u"))
    val tokens = documents.select(col("doc_id"),
      explode(toks(col("text"))).as("u"))
    // LEFT joins from the corpus with a 0.0 default: a doc with no
    // tokens (whitespace-only) or no chars at all is exactly the junk
    // this screen exists to flag — an inner join would silently pass
    // it through unexamined. Zero entropy is also the true limit value
    // of a single-symbol (or empty) distribution.
    documents.select(col("doc_id"))
      .join(dist(chars, "char_entropy"), Seq("doc_id"), "left")
      .join(dist(tokens, "token_entropy"), Seq("doc_id"), "left")
      .na.fill(0.0, Seq("char_entropy", "token_entropy"))
  }

  /** BM25 parameters (the Robertson–Walker defaults every IR stack
    * ships: k1=1.2, b=0.75). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** The query = the [[Bm25QTerms]] terms ranked [[Bm25QSkip]]+1.. by
    * document frequency (df desc, term asc). Skipping the saturated
    * head keeps the query informative — a corpus-universal term has
    * idf ≈ 0 and scores nothing. A real pipeline gets its query from
    * the caller; deriving it from the corpus keeps the operator
    * runnable (and oracle-checkable) on the one `documents` table. */
  val Bm25QSkip = 10
  val Bm25QTerms = 3

  /** Result size of [[bm25]]. */
  val Bm25TopK = 20

  /** BM25 relevance ranking: score every document against the query
    * terms, return the exact top-[[Bm25TopK]].
    *
    * The scale shape: document frequencies are aggregated for ALL
    * terms once (the same pass a search indexer runs), the query's
    * term rows — a handful — are BROADCAST into the posting scan, so
    * only postings of query terms survive the map side; per-doc tf
    * aggregation therefore shuffles O(matching docs × query terms)
    * rows, never the corpus-wide posting list. Corpus stats (N, avgdl)
    * ride a one-row broadcast. The final top-k is
    * TakeOrderedAndProject — per-partition heads, no global sort.
    * Nothing here collects to the driver or loops per query term. */
  def bm25(documents: DataFrame, qSkip: Int = Bm25QSkip,
      qTerms: Int = Bm25QTerms, topK: Int = Bm25TopK): DataFrame = {
    val tk = documents
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    // pinned: consumed by the df aggregate AND the tf scorer
    val posting = CacheScope.pin(tk.select(col("doc_id"),
      size(col("toks")).as("dl"), explode(col("toks")).as("term")))
    val dfTbl = posting.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val queryTerms = headRanked(
      dfTbl.orderBy(col("df").desc, col("term")).limit(qSkip + qTerms),
      "df", "term", "__rk")
      .filter(col("__rk") > qSkip).drop("__rk")
    // exact-int corpus stats: dl sums are exact in double, so avgdl is
    // bit-identical across engines and safe inside the score formula
    val stats = tk.agg(count(lit(1)).as("n_docs"),
      avg(size(col("toks"))).as("avgdl"))
    val scored = posting
      .join(broadcast(queryTerms), Seq("term"))
      .groupBy(col("doc_id"), col("term"), col("df"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(stats))
      // association order matters for float parity: keep the twin SQL
      // character-for-character parallel to these expressions
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(Bm25K1 + 1.0) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
    headRanked(
      scored.orderBy(col("score").desc, col("doc_id")).limit(topK),
      "score", "doc_id", "rk")
  }

  /** Fixture query count for [[bm25Multi]]'s gate entry. */
  val Bm25NQueries = 3

  /** Deterministic (query_id, term) fixture for [[bm25Multi]]:
    * consecutive [[Bm25QTerms]]-sized slices of the df ranking below
    * the saturated head — query 1 is exactly [[bm25]]'s query, queries
    * 2..n the next slices down. Same corpus-derived stand-in rationale
    * as [[bm25]]'s query: keeps the operator runnable and
    * oracle-checkable on the one `documents` table. */
  def bm25FixtureQueries(documents: DataFrame,
      nQueries: Int = Bm25NQueries): DataFrame = {
    val posting = documents
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val dfTbl = posting.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    headRanked(
      dfTbl.orderBy(col("df").desc, col("term"))
        .limit(Bm25QSkip + nQueries * Bm25QTerms),
      "df", "term", "__rk")
      .filter(col("__rk") > Bm25QSkip)
      .select((((col("__rk") - lit(Bm25QSkip) - lit(1)) / lit(Bm25QTerms))
        .cast("long") + lit(1)).as("query_id"), col("term"))
  }

  /** Caller-supplied multi-query BM25 — the production shape the
    * single-query [[bm25]] stands in for: `queries` is a
    * (query_id, term) table, every query is scored in ONE corpus pass,
    * and the result is the exact top-`topK` per query.
    *
    * Same scale shape as [[bm25]]: document frequencies aggregated for
    * all terms once; the query table (rows = queries × terms per
    * query — broadcast-sized by construction, a query workload is
    * human-written text) is joined to its dfs and broadcast into the
    * posting scan, so only postings of query terms survive the map
    * side; tf aggregation shuffles O(matching docs × query-term rows).
    * A query term absent from the corpus has tf=0 in every document
    * and scores nothing — the inner df join dropping it IS the BM25
    * semantics. The per-query top-k is a query_id-partitioned rank
    * window over the already-aggregated O(queries × matching docs)
    * frame — each query's sort is one partition's work, distributed
    * across queries. */
  def bm25Multi(documents: DataFrame, queries: DataFrame,
      topK: Int = Bm25TopK): DataFrame = {
    val tk = documents
      .select(col("doc_id"), toks(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    // pinned: consumed by the df aggregate AND the tf scorer
    val posting = CacheScope.pin(tk.select(col("doc_id"),
      size(col("toks")).as("dl"), explode(col("toks")).as("term")))
    val dfTbl = posting.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val qt = dfTbl.join(
      broadcast(queries.select(col("query_id"), col("term")).distinct()),
      Seq("term"))
    val stats = tk.agg(count(lit(1)).as("n_docs"),
      avg(size(col("toks"))).as("avgdl"))
    val scored = posting
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("term"), col("df"),
        col("dl"))
      .agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(stats))
      // association order matters for float parity with the twin SQL —
      // keep character-for-character parallel to [[bm25]]
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * col("tf") * lit(Bm25K1 + 1.0) /
          (col("tf") + lit(Bm25K1) *
            (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("score"))
    scored.withColumn("rk", row_number().over(
      Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rk") <= topK)
  }
}

/** DuckDB twin of [[LlmPrep]] — same tokenization, same md5 sample
  * order, same window frames, same entropy formula. */
object LlmPrepSql {

  /** Twin of [[LlmPrep.recrawlDedup]] over `events` keyed by
    * (user_id, event_type), 1800 s window — the lag IS the keep rule. */
  val recrawlSql: String =
    """SELECT event_id, user_id, event_type, ts FROM (
         SELECT event_id, user_id, event_type, ts,
           lag(ts) OVER (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id) AS prev_ts
         FROM events)
       WHERE prev_ts IS NULL
          OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
       ORDER BY event_id"""

  import LlmPrep._

  private val toksCte =
    """tk AS (SELECT doc_id, lang, text,
      list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')
        AS toks
      FROM documents)"""

  val contaminationSql: String =
    s"""WITH $toksCte,
    ng AS (SELECT doc_id,
      list_distinct([array_to_string(toks[i:i+${ContamN - 1}], ' ')
        for i in range(1, len(toks) - ${ContamN - 2})]) AS grams
      FROM tk WHERE len(toks) >= $ContamN),
    posting AS (SELECT doc_id, g.gram
      FROM ng, UNNEST(grams) AS g(gram)),
    ev AS (SELECT doc_id AS eval_id, gram FROM posting
      WHERE doc_id % $EvalMod = 0),
    tr AS (SELECT doc_id AS train_id, gram FROM (
      SELECT doc_id, gram, count(*) OVER (PARTITION BY gram) AS df
      FROM posting WHERE doc_id % $EvalMod <> 0) WHERE df <= $ContamDfCap)
    SELECT ev.eval_id, tr.train_id, count(*) AS n_shared
    FROM ev JOIN tr USING (gram)
    GROUP BY 1, 2
    HAVING count(*) >= $ContamMinShared"""

  /** Twin of [[LlmPrep.decontaminate]] — the contamination twin's
    * flagged train ids anti-joined off the train corpus. */
  val decontaminateSql: String =
    s"""WITH flagged AS (SELECT DISTINCT train_id AS doc_id
      FROM ($contaminationSql)),
    tk2 AS (SELECT doc_id,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
      FROM documents WHERE doc_id % $EvalMod <> 0)
    SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens
    FROM tk2 t ANTI JOIN flagged f ON t.doc_id = f.doc_id
    ORDER BY t.doc_id"""

  val sampleStratifiedSql: String =
    s"""SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
        CAST(row_number() OVER (PARTITION BY lang
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      FROM documents)
    WHERE rk <= $StratumCap"""

  val packSql: String =
    s"""SELECT doc_id, shard, n_tokens,
      CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        AS token_offset,
      CAST(floor(coalesce(sum(n_tokens) OVER (PARTITION BY shard
        ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        / $PackBudget) AS BIGINT) AS bin
    FROM (SELECT doc_id, doc_id % $PackShards AS shard,
      CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
        x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)"""

  /** Twin of [[LlmPrep.bpePairs]] — same pair construction, count,
    * and (n DESC, pair ASC) top-k cut. */
  val bpePairsSql: String =
    s"""WITH $toksCte,
    pr AS (SELECT toks[i] || ' ' || toks[i + 1] AS pair
      FROM tk, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2),
    cnt AS (SELECT pair, count(*) AS n FROM pr GROUP BY 1)
    SELECT pair, n,
      CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
    FROM cnt ORDER BY n DESC, pair LIMIT ${LlmPrep.BpePairsK}"""

  /** Twin of [[LlmPrep.skipgrams]] — same windowed ordered-pair
    * generator, count floor, and (n DESC, pair ASC) head cut. */
  val skipgramsSql: String =
    s"""WITH $toksCte,
    pr AS (SELECT toks[i] || ' ' || toks[i + o] AS pair
      FROM tk, UNNEST(range(1, len(toks))) AS u(i),
        UNNEST(range(1, ${LlmPrep.SkipWindow} + 1)) AS v(o)
      WHERE len(toks) >= 2 AND i + o <= len(toks)),
    cnt AS (SELECT pair, count(*) AS n FROM pr GROUP BY 1
      HAVING count(*) >= ${LlmPrep.SkipMinCount})
    SELECT pair, n,
      CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
    FROM (SELECT * FROM cnt ORDER BY n DESC, pair
      LIMIT ${LlmPrep.SkipK})
    ORDER BY rank"""

  /** Twin of [[LlmPrep.collocations]] — same pmi expression
    * association order, same rounded-score tie-break and cut. */
  val pmiSql: String =
    s"""WITH $toksCte,
    pr AS (SELECT toks[i] AS l, toks[i + 1] AS r
      FROM tk, UNNEST(range(1, len(toks))) AS u(i)
      WHERE len(toks) >= 2),
    pc AS (SELECT l, r, count(*) AS n FROM pr GROUP BY 1, 2),
    uni AS (SELECT t AS tok, count(*) AS n_tok
      FROM (SELECT unnest(toks) AS t FROM tk) GROUP BY 1),
    tot AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_uni,
      CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_pair
      FROM tk),
    scored AS (SELECT pc.l || ' ' || pc.r AS pair, pc.n,
        round(ln((CAST(pc.n AS DOUBLE) / n_pair) /
          ((CAST(a.n_tok AS DOUBLE) / n_uni) *
           (CAST(b.n_tok AS DOUBLE) / n_uni))), 6) AS pmi
      FROM pc JOIN uni a ON pc.l = a.tok
              JOIN uni b ON pc.r = b.tok, tot
      WHERE pc.n >= ${LlmPrep.PmiMinCount}),
    head AS (SELECT * FROM scored
      ORDER BY pmi DESC, pair LIMIT ${LlmPrep.PmiK})
    SELECT pair, n, pmi,
      CAST(row_number() OVER (ORDER BY pmi DESC, pair) AS BIGINT)
        AS rank
    FROM head ORDER BY rank"""

  /** Twin of [[LlmPrep.boilerplateScrub]] — same 1-based positions,
    * same df-cap, same space re-join. */
  val boilerplateSql: String = {
    val n = BoilerN; val cap = BoilerDfCap
    s"""WITH tk AS (SELECT doc_id,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
      FROM documents),
    base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tokens
      FROM tk WHERE len(toks) > 0),
    g AS (SELECT doc_id, i AS s,
        array_to_string(toks[i:i+${n - 1}], ' ') AS gram
      FROM base, UNNEST(range(1, len(toks) - ${n - 2})) AS u(i)
      WHERE len(toks) >= $n),
    bp AS (SELECT gram FROM (
        SELECT gram, count(DISTINCT doc_id) AS df FROM g GROUP BY 1)
      WHERE df > $cap),
    cov AS (SELECT DISTINCT g.doc_id, g.s + o AS p
      FROM g JOIN bp USING (gram), UNNEST(range(0, $n)) AS v(o)),
    tok AS (SELECT doc_id, p, toks[CAST(p AS INT)] AS tok
      FROM base, UNNEST(range(1, len(toks) + 1)) AS w(p)),
    kept AS (SELECT t.doc_id, t.p, t.tok FROM tok t
      ANTI JOIN cov ON t.doc_id = cov.doc_id AND t.p = cov.p),
    agg AS (SELECT doc_id, count(*) AS n_kept,
        string_agg(tok, ' ' ORDER BY p) AS clean_text
      FROM kept GROUP BY 1)
    SELECT b.doc_id, b.n_tokens,
      b.n_tokens - coalesce(agg.n_kept, 0) AS n_removed,
      coalesce(agg.clean_text, '') AS clean_text
    FROM base b LEFT JOIN agg USING (doc_id)"""
  }

  /** Twin of [[LlmPrep.chunk]] — DuckDB's 1-based inclusive list slice
    * `toks[a:b]` matches Spark's `slice(t, a, size)` with
    * `b = a + size − 1` (both clip at the list end). */
  val chunkSql: String = {
    val stride = ChunkSize - ChunkOverlap
    s"""WITH tk AS (SELECT doc_id,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
      FROM documents),
    c AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) > 0),
    nc AS (SELECT doc_id, toks,
      greatest(1, CAST(ceil((n - $ChunkOverlap) / $stride.0) AS BIGINT))
        AS n_chunks
      FROM c)
    SELECT doc_id, CAST(i AS BIGINT) AS chunk_ix,
      CAST(len(toks[i * $stride + 1 : i * $stride + $ChunkSize])
        AS BIGINT) AS n_chunk_tokens,
      array_to_string(toks[i * $stride + 1 : i * $stride + $ChunkSize],
        ' ') AS chunk
    FROM nc, UNNEST(range(0, n_chunks)) AS u(i)"""
  }

  // the thresholds below CAST the fraction literal to DOUBLE before
  // the multiply: DuckDB parses `0.002` as DECIMAL and its exact
  // decimal ceil can disagree with Spark's double ceil exactly when
  // frac*n lands on an integer (0.005*200 = 1.0 decimal but
  // 1.0000000000000002 double); forcing both engines onto doubles
  // makes the boundary identical
  val heavyTokensSql: String =
    s"""WITH $toksCte,
    t AS (SELECT tok.tok AS token FROM tk, UNNEST(toks) AS tok(tok))
    SELECT token, count(*) AS cnt FROM t
    GROUP BY token
    HAVING count(*) >= ceil(CAST(${LlmPrep.HeavyFrac} AS DOUBLE) *
      (SELECT count(*) FROM t))"""

  val heavyDomainTokensSql: String =
    s"""WITH tks AS (SELECT source,
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
      FROM documents WHERE source IS NOT NULL),
    t AS (SELECT source, tok.tok AS token FROM tks,
      UNNEST(toks) AS tok(tok)),
    g AS (SELECT source, token, count(*) AS cnt FROM t GROUP BY 1, 2),
    n AS (SELECT source, sum(cnt) AS n FROM g GROUP BY 1)
    SELECT g.source, g.token, g.cnt FROM g JOIN n ON g.source = n.source
    WHERE g.cnt >= ceil(CAST(${LlmPrep.HeavyDomFrac} AS DOUBLE) * n.n)"""

  val vocabSql: String =
    s"""WITH $toksCte,
    cnt AS (SELECT t.tok AS token, count(*) AS n
      FROM tk, UNNEST(toks) AS t(tok) GROUP BY 1),
    ranked AS (SELECT token, n,
      CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
      sum(n) OVER (ORDER BY n DESC, token
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM cnt)
    SELECT token, n, rank,
      round(CAST(cum AS DOUBLE) /
        (SELECT CAST(sum(n) AS DOUBLE) FROM cnt), 6) AS coverage
    FROM ranked WHERE rank <= ${LlmPrep.VocabSize}"""

  val sampleWeightedSql: String = {
    val cases = LlmPrep.MixRates.map { case (s, r) =>
      s"WHEN '$s' THEN '${LlmPrep.rateThreshold(r)}'"
    }.mkString(" ")
    s"""SELECT doc_id, source FROM documents
    WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE source $cases
        ELSE '${LlmPrep.rateThreshold(LlmPrep.MixDefaultRate)}' END"""
  }

  /** Twin of [[LlmPrep.splitAssign]] — same salt, same 4-hex-char
    * per-mille bucket, same thresholds. */
  val splitAssignSql: String =
    s"""SELECT doc_id, source,
      CASE WHEN pm < ${LlmPrep.SplitTrainPm} THEN 'train'
           WHEN pm < ${LlmPrep.SplitValPm} THEN 'val'
           ELSE 'test' END AS split
    FROM (SELECT doc_id, source,
        CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4)
          AS BIGINT) % 1000 AS pm
      FROM documents)"""

  /** Twin of [[LlmPrep.syntheticBlocklist]] + [[LlmPrep.blocklistFilter]]
    * — the exact anti-join the bloom-prefiltered plan must equal. */
  val blocklistSql: String =
    """WITH bl AS (SELECT DISTINCT md5(text) AS content_hash
      FROM documents WHERE doc_id % 17 = 0)
    SELECT d.doc_id, md5(d.text) AS content_hash
    FROM documents d ANTI JOIN bl ON md5(d.text) = bl.content_hash"""

  /** Twin of [[LlmPrep.corpusStats]] — `quantile_cont` is the same
    * linear-interpolation definition as Spark's exact `percentile`. */
  val corpusStatsSql: String =
    """WITH t AS (SELECT source,
      CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
        x -> x <> '')) AS BIGINT) AS n_tokens
      FROM documents)
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      round(avg(n_tokens), 6) AS mean_tokens,
      round(quantile_cont(n_tokens, 0.5), 6) AS p50_tokens,
      round(quantile_cont(n_tokens, 0.9), 6) AS p90_tokens,
      round(quantile_cont(n_tokens, 0.99), 6) AS p99_tokens
    FROM t GROUP BY source"""

  /** Twin of [[LlmPrep.withSyntheticPii]] + [[LlmPrep.piiScrub]]:
    * identical injection, RE2 spellings of the same ASCII patterns,
    * same email → IP → phone replace order. */
  val piiSql: String =
    s"""WITH pii AS (SELECT doc_id,
      text || CASE
        WHEN doc_id % 5 = 0 THEN ' contact user'
          || CAST(doc_id AS VARCHAR) || '@example.com'
        WHEN doc_id % 5 = 1 THEN ' call 415-555-'
          || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        WHEN doc_id % 5 = 2 THEN ' host 10.0.'
          || CAST(doc_id % 256 AS VARCHAR) || '.'
          || CAST(doc_id % 100 AS VARCHAR)
        ELSE '' END AS text
      FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT)
        AS n_emails,
      CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT)
        AS n_phones,
      CAST(len(regexp_extract_all(text, '$IpRe')) AS BIGINT) AS n_ips,
      regexp_replace(regexp_replace(regexp_replace(text,
        '$EmailRe', '<EMAIL>', 'g'),
        '$IpRe', '<IP>', 'g'),
        '$PhoneRe', '<PHONE>', 'g') AS clean_text,
      CAST(len(regexp_extract_all(text, '$EmailRe'))
        + len(regexp_extract_all(text, '$PhoneRe'))
        + len(regexp_extract_all(text, '$IpRe')) > 0 AS INTEGER)
        AS pii_found
    FROM pii"""

  val entropySql: String =
    s"""WITH $toksCte,
    cf AS (SELECT doc_id, c.u, count(*) AS k
      FROM documents,
        UNNEST(list_filter(string_split(text, ''), x -> x <> ''))
          AS c(u)
      GROUP BY 1, 2),
    ce AS (SELECT doc_id,
      round(log2(sum(k)) - sum(k * log2(k)) / sum(k), 6) AS char_entropy
      FROM cf GROUP BY doc_id),
    tf AS (SELECT doc_id, t.u, count(*) AS k
      FROM tk, UNNEST(toks) AS t(u)
      GROUP BY 1, 2),
    te AS (SELECT doc_id,
      round(log2(sum(k)) - sum(k * log2(k)) / sum(k), 6) AS token_entropy
      FROM tf GROUP BY doc_id)
    SELECT d.doc_id, coalesce(ce.char_entropy, 0.0) AS char_entropy,
      coalesce(te.token_entropy, 0.0) AS token_entropy
    FROM documents d
    LEFT JOIN ce ON ce.doc_id = d.doc_id
    LEFT JOIN te ON te.doc_id = d.doc_id"""

  /** Twin of [[LlmPrep.bm25]] — same df-ranked query pick, same
    * association order in the score formula (ulp-level float parity;
    * the round(6) on the summed score absorbs ln/libm last-bit
    * differences). */
  val bm25Sql: String = {
    import LlmPrep.{Bm25B, Bm25K1, Bm25QSkip, Bm25QTerms, Bm25TopK}
    s"""WITH $toksCte,
    tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) > 0),
    posting AS (SELECT doc_id, len(toks) AS dl, t.term
      FROM tk2, UNNEST(toks) AS t(term)),
    dft AS (SELECT term, count(DISTINCT doc_id) AS df
      FROM posting GROUP BY 1),
    q AS (SELECT term, df FROM (
        SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM dft)
      WHERE rk > $Bm25QSkip AND rk <= ${Bm25QSkip + Bm25QTerms}),
    stats AS (SELECT count(*) AS n_docs,
      avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM tk2),
    tf AS (SELECT p.doc_id, p.term, q.df, p.dl, count(*) AS tf
      FROM posting p JOIN q USING (term) GROUP BY 1, 2, 3, 4),
    sc AS (SELECT tf.doc_id,
      round(sum(
        ln(1.0 + (s.n_docs - tf.df + 0.5) / (tf.df + 0.5))
          * tf.tf * ${Bm25K1 + 1.0} /
          (tf.tf + $Bm25K1 *
            (${1.0 - Bm25B} + $Bm25B * tf.dl / s.avgdl))), 6) AS score
      FROM tf, stats s GROUP BY 1)
    SELECT doc_id, score,
      CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        AS rk
    FROM sc ORDER BY score DESC, doc_id LIMIT $Bm25TopK"""
  }

  /** Twin of [[LlmPrep.bm25Multi]] over the [[LlmPrep.bm25FixtureQueries]]
    * fixture — same df-ranked query slices, same association order in
    * the score formula, same per-query rank cut. */
  val bm25MultiSql: String = {
    import LlmPrep.{Bm25B, Bm25K1, Bm25NQueries, Bm25QSkip, Bm25QTerms,
      Bm25TopK}
    val last = Bm25QSkip + Bm25NQueries * Bm25QTerms
    s"""WITH $toksCte,
    tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) > 0),
    posting AS (SELECT doc_id, len(toks) AS dl, t.term
      FROM tk2, UNNEST(toks) AS t(term)),
    dft AS (SELECT term, count(DISTINCT doc_id) AS df
      FROM posting GROUP BY 1),
    qt AS (SELECT
        CAST((rk - $Bm25QSkip - 1) // $Bm25QTerms + 1 AS BIGINT)
          AS query_id, term, df
      FROM (
        SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk
        FROM dft)
      WHERE rk > $Bm25QSkip AND rk <= $last),
    stats AS (SELECT count(*) AS n_docs,
      avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM tk2),
    tf AS (SELECT qt.query_id, p.doc_id, p.term, qt.df, p.dl,
        count(*) AS tf
      FROM posting p JOIN qt USING (term) GROUP BY 1, 2, 3, 4, 5),
    sc AS (SELECT tf.query_id, tf.doc_id,
      round(sum(
        ln(1.0 + (s.n_docs - tf.df + 0.5) / (tf.df + 0.5))
          * tf.tf * ${Bm25K1 + 1.0} /
          (tf.tf + $Bm25K1 *
            (${1.0 - Bm25B} + $Bm25B * tf.dl / s.avgdl))), 6) AS score
      FROM tf, stats s GROUP BY 1, 2)
    SELECT query_id, doc_id, score,
      CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id) AS BIGINT) AS rk
    FROM sc
    QUALIFY rk <= $Bm25TopK
    ORDER BY query_id, rk"""
  }
}
