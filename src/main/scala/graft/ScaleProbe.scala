package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Rco
import graft.operators._
import graft.sources.Tables

/** Scale-up probe (not part of the driver contract): synthesizes K×
  * the sf0.1 event log in two shapes and times the RCO spine +
  * downstream operators on each, to test the claims in COVERAGE.md:
  *
  *  - `wide`:  K× more LINEs (new user_id ranges) — partition
  *    parallelism should absorb this linearly;
  *  - `dense`: K× more events per LINE (time-shifted copies) — the
  *    stress case for the per-LINE window formulations, whose state is
  *    a sort per partition, so this should also stay near-linear (and
  *    NOT quadratic like the reference's per-CO loops).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.ScaleProbe 10"
  * Optional section filter (comma list of rco,emb,text,fleet):
  *   SPARK_GRAFT_PROBE=text sbt "runMain graft.ScaleProbe 10"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val knownSections =
      Set("rco", "emb", "text", "fleet", "ingest", "vecingest", "temporal",
        "curation", "layout", "analytics", "pagerank", "dfcap", "resolve",
        "ganttprof", "cooccur", "basketcap", "simscale", "recall",
        "ngramstage", "embpqstage", "serve", "recallc", "embpq768",
        "compactserve")
    val sections = sys.env.get("SPARK_GRAFT_PROBE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(knownSections)
    // fail fast on a typo: a probe run that silently matches zero
    // sections exits 0 with no timings and reads as a clean pass
    val unknown = sections -- knownSections
    require(sections.nonEmpty,
      s"SPARK_GRAFT_PROBE is empty — valid: ${knownSections.mkString(",")}")
    require(unknown.isEmpty,
      s"SPARK_GRAFT_PROBE: unknown section(s) ${unknown.mkString(",")} — " +
        s"valid: ${knownSections.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.events(spark, sfDir)
    def copyN(shift: Int => DataFrame => DataFrame): DataFrame =
      (0 until k).map(i => shift(i)(base)).reduce(_ unionByName _)

    val wide = copyN(i => df => df
      .withColumn("user_id", col("user_id") + lit(i * 100000))
      .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L)))
    val dense = copyN(i => df => df
      .withColumn("ts", col("ts") + expr(s"INTERVAL ${i * 31} DAYS"))
      .withColumn("event_id", col("event_id") + lit(i.toLong * 10000000L)))

    def bench(tag: String, events: DataFrame,
        silent: Boolean = false): Unit = {
      val dir = s"/tmp/graft_scale_$tag"
      events.write.mode("overwrite").parquet(dir)
      val ev = spark.read.parquet(dir)
      val full = Rco.downtimeLogDeduped(ev)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ses = Sessionize(Rco.coFilter(full, Rco.testCoPredicate),
        Sessionize.Params(120.0))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val agg = CoAggregate(ses)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def time(name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        if (!silent)
          println(f"$tag%-6s $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      time("spine")(agg) // materializes full+ses+agg
      time("brandcode")(BrandcodeResolve(agg, full))
      time("first_stop")(FirstStopAfterCo.firstStops(agg, full))
      time("gantt") {
        val cons = full.filter(col("MACHINE").endsWith(" M0"))
          .join(ses.select(col("LINE"), col("downtime_id")).distinct()
            .withColumn("CO_Event", lit(1)),
            Seq("LINE", "downtime_id"), "left")
          .na.fill(0, Seq("CO_Event"))
        GanttGenerate.ganttData(agg, full, cons)
      }
      if (!silent)
        println(s"$tag rows=${ev.count()} lines=" +
          full.select("LINE").distinct().count())
      Seq(full, ses, agg).foreach(_.unpersist())
    }

    if (sections("rco")) {
      // untimed warmup pass: the first execution of each operator pays
      // the whole janino+C2 storm (r8 measured base1x gantt 79s cold vs
      // 4.5s for the SAME plan warm) — a cold first section makes every
      // scale ratio read sub-linear. Code warms; the data caches are
      // unpersisted at the end of the pass, so the timed base1x still
      // materializes everything itself.
      bench("warm", base, silent = true)
      bench("base1x", base)
      bench("wide", wide)
      bench("dense", dense)
    }

    // Stage attribution for the dense-gantt number (VERDICT r12 #8):
    // noop-write each successive stage of the gantt chain; the
    // INCREMENT between consecutive cumulative timings attributes the
    // cost — bucket-assign join vs the per-(CO,machine) point-kernel
    // window sort vs the monotonic correction + Generate explosion.
    if (sections("ganttprof")) {
      val dir = "/tmp/graft_scale_ganttprof"
      dense.write.mode("overwrite").parquet(dir)
      val ev = spark.read.parquet(dir)
      def chain(tag: String, silent: Boolean): Unit = {
        val full = Rco.downtimeLogDeduped(ev)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ses = Sessionize(Rco.coFilter(full, Rco.testCoPredicate),
          Sessionize.Params(120.0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val agg = CoAggregate(ses)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cons = full.filter(col("MACHINE").endsWith(" M0"))
          .join(ses.select(col("LINE"), col("downtime_id")).distinct()
            .withColumn("CO_Event", lit(1)),
            Seq("LINE", "downtime_id"), "left")
          .na.fill(0, Seq("CO_Event"))
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent) println(f"ganttprof $tag%-6s $name%-10s " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        time("spine")(agg)
        val tagged = GanttGenerate.taggedLog(full, cons)
        time("tagged")(tagged)
        val assigned = GanttGenerate.assign(agg, tagged)
        time("assign")(assigned)
        val pts = GanttGenerate.points(assigned,
          col(GanttGenerate.StatusCol))
        time("points")(pts)
        time("gantt")(GanttGenerate.corrected(pts))
        Seq(full, ses, agg).foreach(_.unpersist())
      }
      chain("warm", silent = true)
      chain(s"${k}x", silent = false)
    }

    // LLM path: K× the embeddings corpus (fresh vec_ids; dim content
    // perturbed per copy via a deterministic shift so near-dup buckets
    // don't explode artificially). Bucketed IVF should scale linearly
    // in corpus size; knnBrute is the quadratic-ish baseline foil.
    val embBase = Tables.embeddings(spark, sfDir)
    val embK = (0 until k).map(i => embBase
      .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
      .withColumn("embedding",
        transform(col("embedding"), x => x + lit(i * 0.01f))))
      .reduce(_ unionByName _)
    def timeEmb(tag: String, e: DataFrame, kx: Int,
        silent: Boolean = false): Unit = {
      val dir = s"/tmp/graft_scale_emb_$tag"
      e.write.mode("overwrite").parquet(dir)
      val ev = spark.read.parquet(dir)
      // semDedup's codebook must GROW with the corpus (the SemDeDup
      // k ∝ corpus rule): +log2(kx) sign dims keeps expected cluster
      // size fixed. semddK0 is the fixed-k foil — its within-cluster
      // pair join is quadratic in cluster size by design.
      val grownDims = LlmSim.IvfDims +
        math.ceil(math.log(kx.toDouble) / math.log(2)).toInt
      // exactFold=false: the production avg-centroid training path —
      // the oracle-exact fold is only for the correctness gate
      Seq("ivf2" -> (() => LlmSim.knnIvfTrained(ev, exactFold = false)),
          "ivf1" -> (() => LlmSim.knnIvf(ev)),
          "semdd" -> (() =>
            LlmSim.semDedup(ev, exactFold = false, cellDims = grownDims)),
          "semddK0" -> (() => LlmSim.semDedup(ev, exactFold = false)),
          "lblnoise" -> (() =>
            LlmSim.labelNoise(ev, cellDims = grownDims)),
          // quant is a pure per-row projection — the probe documents
          // that it stays shuffle-free (flat per-row cost) at K×
          "quant" -> (() => LlmSim.embedQuant(ev)),
          // exact broadcast-eval screen: linear in corpus size with an
          // n_eval multiplier (eval side grows with the K× fixture
          // here; production eval suites are fixed-size)
          "contam" -> (() => LlmSim.contaminationEmbed(ev)),
          "brute" -> (() => LlmSim.knnBrute(ev))).foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        if (!silent)
          println(f"emb_$tag%-6s $n%-6s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
            s" rows=${ev.count()}")
      }
    }
    if (sections("emb")) {
      timeEmb("warm", embBase, 1, silent = true) // JIT warmup, see rco
      timeEmb("1x", embBase, 1)
      timeEmb(s"${k}x", embK, k)
    }

    // Text operators: K× corpus with per-copy token prefixes — DISJOINT
    // gram spaces, because a 10× corpus at scale is new content, not 10
    // copies of the same bytes. Candidate growth then measures the PLAN
    // (the df-capped inverted index should stay ~linear in corpus size),
    // not an artificial K² blowup of true duplicate pairs.
    val docBase = Tables.documents(spark, sfDir)
    val docK = (0 until k).map(i => docBase
      .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
      .withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"c${i}_" + "$1")))
      .reduce(_ unionByName _)
    def timeText(tag: String, d0: DataFrame,
        silent: Boolean = false): Unit = {
      val dir = s"/tmp/graft_scale_doc_$tag"
      d0.write.mode("overwrite").parquet(dir)
      val d = spark.read.parquet(dir)
      val ((), release) = CacheScope.collect {
        val sh = CacheScope.pin(LlmText.shingles(d))
        val t0 = System.nanoTime()
        val nCand = LlmText.ngramCandidates(sh).count()
        if (!silent)
          println(f"doc_$tag%-8s ngram_cand  ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
            s" candidates=$nCand docs=${d.count()}")
        def time(name: String)(df: => DataFrame): Unit = {
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"doc_$tag%-8s $name%-12s ${(System.nanoTime() - t1) / 1e9}%8.2f s")
        }
        time("dedup_ngram")(LlmText.dedupNgram(d))
        time("curate")(LlmText.curate(d))
        // components: rounds scale with cluster diameter (constant
        // under corpus growth), per-round work with the pair count
        time("dedup_cluster")(LlmText.dedupClusters(d))
        // prep operators: the one-sided inverted index (df-capped train
        // postings × small eval side) should stay ~linear; pack/entropy
        // are per-shard windows / map-side aggregates; the stratified
        // sample's per-stratum sort is the deliberate stress (strata
        // grow K× while the cap stays fixed)
        time("contamination")(LlmPrep.contamination(d))
        time("pack")(LlmPrep.pack(d))
        time("entropy")(LlmPrep.entropy(d))
        time("sample_strat")(LlmPrep.sampleStratified(d))
        time("vocab")(LlmPrep.vocab(d))
        // repetition/pii are single codegen'd projections (fused
        // kernels / regex scans, no shuffle) — the probe documents
        // that both stay linear in corpus size. The synthetic-PII
        // injection is FIXTURE cost: materialize it first so the pii
        // number measures the scrub alone.
        time("repetition")(LlmText.repetition(d))
        val piiDir = s"/tmp/graft_scale_pii_$tag"
        LlmPrep.withSyntheticPii(d).write.mode("overwrite").parquet(piiDir)
        time("pii")(LlmPrep.piiScrub(spark.read.parquet(piiDir)))
        // blocklist: bloom build (distributed agg + scalar collect)
        // plus the prefiltered anti-join — both inside the timing
        time("blocklist")(
          LlmPrep.blocklistFilter(d, LlmPrep.syntheticBlocklist(d)))
        // multi-query BM25: fixture derivation + one-pass scoring of 3
        // queries; scale term is the posting scan, same as bm25
        time("bm25_multi")(
          LlmPrep.bm25Multi(d, LlmPrep.bm25FixtureQueries(d)))
        // corpus ops: shuffle-shard is one hash projection + the shard
        // exchange the export write needs anyway; unigram LM is two
        // term-keyed shuffles (count + score join); substr_dup is the
        // span-df window — all should stay ~linear in corpus size
        time("shards")(LlmCorpus.shuffleShards(d))
        time("unigram_lm")(LlmCorpus.unigramLm(d))
        time("substr_dup")(LlmCorpus.substrDup(d))
        // classifier/keywords/encode: all posting-scan shaped — one
        // term-keyed shuffle plus a broadcast model (clf), a
        // doc-partitioned rank window (keywords), a broadcast vocab
        // join (encode) — each should stay ~linear in corpus size
        time("quality_clf")(LlmCorpus.qualityClf(d))
        time("keywords")(LlmCorpus.keywords(d))
        time("vocab_encode")(LlmCorpus.vocabEncode(d))
        // profile: two source-keyed aggs with constant-size HLL state
        // (map-side partial merge) — should stay linear in corpus size
        time("profile")(LlmCorpus.profileSketch(d))
      }
      release()
    }
    if (sections("text")) {
      timeText("warm", docBase, silent = true) // JIT warmup, see rco
      timeText("1x", docBase)
      timeText(s"${k}x", docK)
    }

    // Fleet spine at K× wide: runSites over the 3 heterogeneous sites
    // (the production entry point, sinks included) — should be ~linear
    // in data volume AND show no per-site slowdown slope (CacheScope
    // releases each site's pins).
    def timeFleet(tag: String): Unit = {
      val ev = spark.read.parquet(s"/tmp/graft_scale_$tag")
      val full = Rco.downtimeLogDeduped(ev)
      val prodL = Rco.productionLog(ev)
      val outDir = s"/tmp/graft_scale_fleet_$tag"
      val outPath = new org.apache.hadoop.fs.Path(outDir)
      val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(outPath)) fs.delete(outPath, true)
      val t0 = System.nanoTime()
      val log = graft.pipeline.RcoEtl.runSites(spark,
        graft.pipeline.RcoEtl.fleetSiteParams, full, prodL, outDir)
      println(f"fleet_$tag%-8s 3sites ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        s" statuses=$log")
      // second run against the EXISTING tables — the production
      // incremental path: windowed delete+append reading back only
      // touched buckets (the bench's create-path entry never sees it)
      val t1 = System.nanoTime()
      val log2 = graft.pipeline.RcoEtl.runSites(spark,
        graft.pipeline.RcoEtl.fleetSiteParams, full, prodL, outDir)
      println(f"fleet_$tag%-8s upsert ${(System.nanoTime() - t1) / 1e9}%8.2f s" +
        s" statuses=$log2")
    }
    if (sections("fleet")) {
      // fleet reads the rco section's scaled event dumps. When rco ran
      // THIS invocation they are fresh; otherwise ALWAYS regenerate —
      // an existence check would silently reuse a dump left by a
      // previous run with a different k or SPARK_GRAFT_SF_DIR and
      // mislabel the fleet numbers.
      if (!sections("rco"))
        Seq("base1x" -> base, "wide" -> wide).foreach { case (tag, ev) =>
          ev.write.mode("overwrite").parquet(s"/tmp/graft_scale_$tag")
        }
      timeFleet("base1x")
      timeFleet("wide")
    }

    // Incremental-ingest probe: a FIXED small batch against a band
    // index grown 1×→K× — the O(batch) claim of LlmIngest.ingestDedup
    // (probe scan and append touch only the batch's buckets). Bucket
    // geometry is the at-scale shape reproduced small: rows-per-bucket
    // shrunk so bucket COUNT grows with the index while bucket SIZE
    // stays fixed, exactly what RowsPerBucket=8M yields on a real
    // corpus. Under the default the whole probe-scale index sits in
    // MinBuckets=8 dirs, every probe touches all of them, and the
    // numbers measure O(index) geometry instead of the plan. Passing
    // looks like: probe seconds and bytes_read ~flat while index_rows
    // grows K×.
    if (sections("ingest")) {
      spark.conf.set(graft.sinks.ParquetSinks.RowsPerBucketConf, "1000")
      val probeDir = "/tmp/graft_scale_ingest_probe"
      docBase.filter(pmod(col("doc_id"), lit(2500)) === 7)
        .withColumn("doc_id", col("doc_id") + lit(900000000L))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", "pr_$1"))
        .write.mode("overwrite").parquet(probeDir)
      val bytesRead = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      def timeIngest(tag: String, corpus: DataFrame,
          silent: Boolean = false): Unit = {
        val idx = s"/tmp/graft_scale_ingest_$tag"
        val p = new org.apache.hadoop.fs.Path(idx)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        LlmIngest.ingestDedup(spark, corpus, idx) // seed index, untimed
        // GC barrier: the K× seed leaves a full young gen plus the
        // ContextCleaner's backlog of its dropped cache blocks; without
        // this the timed probe absorbs the seed's collection pauses
        // (measured 3.7–54 s at 20× on identical code)
        System.gc(); Thread.sleep(1000)
        val probe = spark.read.parquet(probeDir)
        bytesRead.set(0L)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val accepted = LlmIngest.ingestDedup(spark, probe, idx).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // listener bus drains async
        spark.sparkContext.removeSparkListener(listener)
        if (!silent)
          println(f"ingest_$tag%-8s probe $secs%8.2f s accepted=$accepted" +
            s" bytes_read=${bytesRead.get}" +
            s" index_rows=${spark.read.parquet(idx).count()}")
      }
      timeIngest("warm", docBase, silent = true) // JIT warmup, see rco
      timeIngest("1x", docBase)
      timeIngest(s"${k}x", docK)
      spark.conf.unset(graft.sinks.ParquetSinks.RowsPerBucketConf)
    }

    // Vector-ingest probe: the same FIXED-batch-vs-grown-index
    // measurement for LlmIngest.ingestVectors — same bucket geometry
    // reproduction, same pass criterion (probe seconds and bytes_read
    // ~flat while index_rows grows K×). Two fixture requirements the
    // doc probe meets with token prefixes and this one meets with
    // sign-flip patterns: K× content must be NOVEL (a scaled/shifted
    // copy keeps its direction, is cosine-rejected by the seed dedup,
    // and the "10×" index barely grows), and the CODEBOOK must grow
    // with the index (+log2 K sign dims — the ingestVectors scaladoc's
    // k ∝ corpus rule; at fixed 2^4 cells, per-cell membership and
    // with it probe cost is linear in the index, by construction).
    if (sections("vecingest")) {
      // flip ~half the dims by a pattern that varies with the copy
      // seed: cosine to any other seed's copy ≈ 0 — novel content
      def flipped(e: DataFrame, seed: Int): DataFrame = e
        .withColumn("embedding",
          transform(col("embedding"), (x, idx) =>
            when(pmod(lit(seed.toLong * 2654435761L) + idx * lit(40503L),
              lit(100)) < 50, x).otherwise(-x)))
      val embNovelK = (0 until k).map(i =>
        flipped(embBase, i)
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
      spark.conf.set(graft.sinks.ParquetSinks.RowsPerBucketConf, "100")
      val probeDir = "/tmp/graft_scale_vecingest_probe"
      flipped(embBase.filter(pmod(col("vec_id"), lit(1000)) === 7), 999)
        .withColumn("vec_id", col("vec_id") + lit(900000000L))
        .write.mode("overwrite").parquet(probeDir)
      val bytesRead = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      def timeVecIngest(tag: String, corpus: DataFrame, dims: Int,
          silent: Boolean = false): Unit = {
        val idx = s"/tmp/graft_scale_vecingest_$tag"
        val p = new org.apache.hadoop.fs.Path(idx)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        // seed index, untimed (dims fixed per index lifetime)
        LlmIngest.ingestVectors(spark, corpus, idx, cellDims = dims)
        System.gc(); Thread.sleep(1000) // see the ingest section
        val probe = spark.read.parquet(probeDir)
        bytesRead.set(0L)
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val accepted = LlmIngest
          .ingestVectors(spark, probe, idx, cellDims = dims).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
        if (!silent)
          println(f"vecingest_$tag%-8s probe $secs%8.2f s" +
            s" accepted=$accepted bytes_read=${bytesRead.get}" +
            s" index_rows=${spark.read.parquet(idx).count()}")
      }
      val grownDims = LlmSim.IvfDims +
        math.ceil(math.log(k.toDouble) / math.log(2)).toInt
      timeVecIngest("warm", embBase, LlmSim.IvfDims, silent = true)
      timeVecIngest("1x", embBase, LlmSim.IvfDims)
      timeVecIngest(s"${k}x", embNovelK, grownDims)
      spark.conf.unset(graft.sinks.ParquetSinks.RowsPerBucketConf)
    }
    // Temporal-join probe: asofBackward + intervalJoinPoints on the
    // scaled event log, both sides grown together. `dense` is the
    // stress shape: K× points AND K× intervals per user key, where a
    // naive per-key theta join does K² work — the merged-stream window
    // (one sort per key) and the time-bucketed equi-join (copies are
    // time-shifted, so bucket keys stay selective) should both stay
    // ~linear. Passing looks like: wide and dense ≈ K × base1x, not K².
    if (sections("temporal")) {
      def timeTemporal(tag: String, events: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_tmpjoin_$tag"
        events.write.mode("overwrite").parquet(dir)
        val ev = spark.read.parquet(dir)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"tmp_$tag%-8s $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("view_value"))
        time("asof")(TemporalJoins.asofBackward(
          purchases, views, Seq("user_id"), "ts", "ts"))
        time("asof_fwd")(TemporalJoins.asofForward(
          purchases, views, Seq("user_id"), "ts", "ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val iv = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ws"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("we"),
            col("event_id").as("ivid"))
        time("interval")(TemporalJoins.intervalJoinPoints(
          clicks, iv, Seq("user_id"), "ts", "ws", "we",
          bucketWidthSec = 3600L))
        val iv2 = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cs"),
            (col("ts") + expr("INTERVAL 1 HOUR")).as("ce"),
            col("event_id").as("cid"))
        time("overlap")(TemporalJoins.intervalJoinIntervals(
          iv, iv2, Seq("user_id"), "ws", "we", "cs", "ce",
          bucketWidthSec = 3600L))
      }
      timeTemporal("warm", base, silent = true) // JIT warmup, see rco
      timeTemporal("1x", base)
      timeTemporal("wide", wide)
      timeTemporal("dense", dense)

      // Hot-key shape: HALF of all rows collapse onto ONE user key,
      // grown K× dense-style (time-shifted copies, so the hot key's
      // HISTORY deepens K×). This is the shape the window-based
      // temporal operators cannot salt away: the plain as-of scans the
      // hot key's whole history in one task, the sliced variant
      // spreads it over (key, slice) tasks. Passing looks like:
      // asof_slice ≈ linear in K while asof_plain degrades toward the
      // single-task ceiling; gap_plain is measured to PIN the known
      // serial contract of sessionization (a running per-key count has
      // no sliced form — its boundary state is order-dependent).
      def timeSkew(tag: String, events: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_tmpskew_$tag"
        events.write.mode("overwrite").parquet(dir)
        val ev = spark.read.parquet(dir)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"tmp_$tag%-8s $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("view_value"))
        time("asof_plain")(TemporalJoins.asofBackward(
          purchases, views, Seq("user_id"), "ts", "ts"))
        time("asof_slice")(TemporalJoins.asofBackwardSliced(
          purchases, views, Seq("user_id"), "ts", "ts",
          sliceWidthSec = 86400L))
        time("near_plain")(TemporalJoins.asofNearest(
          purchases, views, Seq("user_id"), "ts", "ts"))
        time("near_slice")(TemporalJoins.asofNearestSliced(
          purchases, views, Seq("user_id"), "ts", "ts",
          sliceWidthSec = 86400L))
        time("gap_plain")(TemporalJoins.sessionizeByGap(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          Seq("user_id"), "ts", 1800L))
        time("gap_slice")(TemporalJoins.sessionizeByGapSliced(
          ev.select(col("event_id"), col("user_id"), col("ts")),
          Seq("user_id"), "ts", 1800L, sliceWidthSec = 86400L))
      }
      val mkSkew: DataFrame => DataFrame = df =>
        df.withColumn("user_id",
          when(pmod(col("event_id"), lit(2)) === 0, lit(424242L))
            .otherwise(col("user_id")))
      timeSkew("skwarm", mkSkew(base), silent = true)
      timeSkew("skew1x", mkSkew(base))
      timeSkew("skewKx", mkSkew(dense))
    }

    // Curation operators at K× corpus: the exact tercile form pays a
    // sort per language (its documented ceiling — languages are FIXED
    // while the corpus grows, so per-language partitions deepen K×);
    // the cutoff form is one sketch aggregate + a broadcast compare
    // and should track the corpus scan. domainMix is one groupBy.
    if (sections("curation")) {
      def timeCur(tag: String, d0: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_cur_$tag"
        d0.write.mode("overwrite").parquet(dir)
        val d = spark.read.parquet(dir)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"cur_$tag%-8s $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        time("ppl_ntile")(LlmCorpus.pplBucket(d))
        time("ppl_cutoff")(LlmCorpus.pplBucketByCutoff(d))
        time("domain_mix")(LlmCorpus.domainMix(d, Map.empty))
      }
      timeCur("warm", docBase, silent = true) // JIT warmup, see rco
      timeCur("1x", docBase)
      timeCur(s"${k}x", docK)
    }

    // Layout: z-ordering is a bounds/sketch aggregate + one range
    // shuffle — the same cost class as any sorted write; both probes
    // should scale with the data like a sort does, in both shapes.
    if (sections("layout")) {
      def timeLay(tag: String, e0: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_lay_$tag"
        e0.write.mode("overwrite").parquet(dir)
        val ev = spark.read.parquet(dir)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"lay_$tag%-8s $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        time("z_linear")(ZOrder.clusterByZ(ev, Seq("user_id", "value")))
        time("z_quantile")(
          ZOrder.clusterByZQuantile(ev, Seq("user_id", "value")))
      }
      timeLay("warm", base, silent = true) // JIT warmup, see rco
      timeLay("1x", base)
      timeLay("wide", wide)
      timeLay("dense", dense)
    }

    // Analytics breadth (round 11 wave 4): the funnel is one
    // whole-partition window stack (scales like the per-key windows);
    // session paths add a bounded per-session collect on top of the
    // gap sessionizer; the outlier screen is an O(types) aggregate +
    // one scan; tfidf pairs are a df-capped posting self-join whose
    // candidate count the cap bounds (same discipline as dedup_ngram).
    if (sections("analytics")) {
      def timeEv(tag: String, e0: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_an_$tag"
        e0.write.mode("overwrite").parquet(dir)
        val ev = spark.read.parquet(dir)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          if (!silent)
            println(f"an_$tag%-8s $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        time("funnel")(Funnel.counts(ev, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase")))
        time("paths")(ClassicQueries.sessionPathsOf(
          ev.select(col("event_id"), col("user_id"), col("ts"),
            col("event_type"))))
        time("outliers")(ClassicQueries.outlierAudit(
          ev.select(col("event_type"), col("value"))))
      }
      def timeDocs(tag: String, d0: DataFrame,
          silent: Boolean = false): Unit = {
        val dir = s"/tmp/graft_scale_antf_$tag"
        d0.write.mode("overwrite").parquet(dir)
        val d = spark.read.parquet(dir)
        val t0 = System.nanoTime()
        LlmCorpus.tfidfPairs(d).write.format("noop").mode("overwrite").save()
        if (!silent)
          println(f"an_$tag%-8s tfidf_pairs  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      timeEv("warm", base, silent = true) // JIT warmup, see rco
      timeEv("1x", base)
      timeEv("wide", wide)
      timeEv("dense", dense)
      timeDocs("warm", docBase, silent = true)
      timeDocs("1x", docBase)
      timeDocs(s"${k}x", docK)
    }

    // CooccurIngest O(batch) claim (round 14): folding an IDENTICAL
    // batch into a 1× vs K× registry must be ~flat — the basket read
    // is bucket-pruned to the batch's users and the pair/item folds
    // rewrite touched buckets only, so state size never enters the
    // per-batch cost (the er_fold contract, for the co-occurrence
    // family).
    if (sections("cooccur")) {
      import graft.operators.CooccurIngest
      val ui = base
        .filter(col("user_id").isNotNull && col("props").isNotNull)
        .select(col("user_id"),
          expr("from_json(props, 'k BIGINT')").getField("k").as("item"))
        .filter(col("item").isNotNull)
      def uiShift(i: Int): DataFrame = ui.select(
        (col("user_id") + lit(i * 1000000L)).as("user_id"), col("item"))
      def fold(tag: String, mult: Int): Unit = {
        val path = s"/tmp/graft_scale_cooc_$tag"
        val hp = new org.apache.hadoop.fs.Path(path)
        hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(hp, true)
        (1 to mult).foreach(i => CooccurIngest.ingest(spark,
          uiShift(i), path, "user_id", "item", s"pre_$i"))
        val t0 = System.nanoTime()
        CooccurIngest.ingest(spark, uiShift(0), path, "user_id",
          "item", "probe")
        println(f"cooccur ${tag}%-8s fold         " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      fold("warm", 1)
      fold("1x", 1)
      fold(s"${k}x", k)
    }

    // MaxBasket guard (round 16): one synthetic hyperactive user
    // (20k distinct items — C(20k,2) ≈ 2·10⁸ pairs on ONE shuffle
    // key) mixed into the organic baskets. Capped, the run must cost
    // what the bot-free run costs; uncapped shows the quadratic
    // fan-out the cap removes. Bounded bot size so the uncapped
    // leg terminates — the point is the RATIO, not a hang.
    if (sections("basketcap")) {
      import graft.operators.ClassicQueries
      val ui = base
        .filter(col("user_id").isNotNull && col("props").isNotNull)
        .select(col("user_id"),
          expr("from_json(props, 'k BIGINT')").getField("k").as("item"))
        .filter(col("item").isNotNull)
        .distinct()
      val bot = spark.range(1, 20001)
        .select(lit(999999999L).as("user_id"), col("id").as("item"))
      def timeCap(tag: String, in: DataFrame, maxBasket: Int): Unit = {
        val t0 = System.nanoTime()
        ClassicQueries.itemCooccurOf(in, maxBasket)
          .write.format("noop").mode("overwrite").save()
        println(f"basketcap ${tag}%-12s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      timeCap("warm", ui, ClassicQueries.MaxBasket)
      timeCap("nobot", ui, ClassicQueries.MaxBasket)
      timeCap("bot_capped", ui.unionByName(bot),
        ClassicQueries.MaxBasket)
      timeCap("bot_uncapped", ui.unionByName(bot), Int.MaxValue)
    }

    // Dedup/ANN scale ladder (VERDICT r14 #5 / r15 #4): the LSH and
    // IVF families' scale evidence previously topped out at 10×. A
    // 1×/10×/K× ladder over the scale-path operators with the
    // codebook GROWN per rung (IvfDims + log2(rung) — the same
    // k ∝ corpus rule semDedup documents): constant expected
    // cell/bucket size means rung K should cost ~K× the 1× time
    // (scan-bound linear), never K². Content per copy is
    // decorrelated so true-pair counts grow ~linearly and the probe
    // measures the PLAN, not an artificial K² duplicate blowup:
    // disjoint token prefixes for text (a bigger corpus is new
    // content, not repeated bytes); for embeddings a per-(copy,dim)
    // deterministic ±0.35 perturbation — perturbation norm ≈ 2.8×
    // the vector norm (dims are ~N(0, 0.125²)·64) puts the copy's
    // cosine to its original ≈ 0.33, below the 0.4 dup threshold,
    // and the hash-signed flips keep the quantizer cells uniform
    // (a constant shift would drift every dim positive by copy 30
    // and collapse the codebook onto one cell).
    // grown-corpus builders shared by simscale and ngramstage (content
    // decorrelated per copy — see the simscale comment above)
    def docsAt(kk: Int): DataFrame =
      if (kk == 1) docBase
      else (0 until kk).map(i => docBase
          .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(\\S+)", s"c${i}_" + "$1")))
        .reduce(_ unionByName _)

    def embAt(kk: Int): DataFrame =
      if (kk == 1) embBase
      else (0 until kk).map { i =>
        if (i == 0) embBase
        else embBase
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
          .withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              x + when(pmod(hash(lit(i), j), lit(2)) === 0, lit(0.35f))
                .otherwise(lit(-0.35f))))
      }.reduce(_ unionByName _)

    // Per-VECTOR decorrelated growth (vec_id joins the perturbation
    // hash): [[embAt]]'s perturbation depends only on (copy, dim), so
    // every vector of a copy shares ONE offset whose norm (≈ 2.8)
    // dwarfs the base vector — each copy is a tight cluster with
    // within-copy pairwise cosine ≈ 0.8, i.e. the grown corpus is
    // DUP-SATURATED (measured at 100×: 98.4% of the 197M within-cell
    // candidate pairs are genuine ≥-threshold near-dups). That regime
    // is the right stress for index/search entries (cells stay
    // uniform) but the WRONG one for pair-level dedup economics: a
    // real mostly-unique corpus is dup-RARE, where a candidate
    // prefilter earns its keep. This variant perturbs per vector —
    // within-copy pairs become noise-like and near-dups stay rare —
    // mirroring the doc ladder's new-content-per-copy principle. */
    def embAtUnique(kk: Int): DataFrame =
      if (kk == 1) embBase
      else (0 until kk).map { i =>
        if (i == 0) embBase
        else embBase
          .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
          .withColumn("embedding",
            transform(col("embedding"), (x, j) =>
              x + when(
                pmod(hash(lit(i), j, col("vec_id")), lit(2)) === 0,
                lit(0.35f)).otherwise(lit(-0.35f))))
      }.reduce(_ unionByName _)

    if (sections("simscale")) {
      val rungs = Seq(1, 10, k).distinct.sorted.filter(_ <= k)
      def runSim(tag: String, kk: Int, silent: Boolean = false): Unit = {
        val grown = LlmSim.IvfDims +
          math.ceil(math.log(kk.toDouble) / math.log(2)).toInt
        val dDir = s"/tmp/graft_scale_sim_doc_$tag"
        val eDir = s"/tmp/graft_scale_sim_emb_$tag"
        docsAt(kk).write.mode("overwrite").parquet(dDir)
        embAt(kk).write.mode("overwrite").parquet(eDir)
        val d = spark.read.parquet(dDir)
        val e = spark.read.parquet(eDir)
        // per-ENTRY cache scope: an operator's pins are released
        // before the next entry times, so entries measure their own
        // plan rather than the previous entry's memory pressure (the
        // first 100× run had semdd's pinned frames inflating ivf2)
        def time(name: String)(df: => DataFrame): Unit = {
          val t0 = System.nanoTime()
          val ((), release) = CacheScope.collect {
            df.write.format("noop").mode("overwrite").save()
          }
          release()
          if (!silent)
            println(f"sim_$tag%-7s $name%-12s " +
              f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        time("dedup_near")(LlmText.dedupNear(d))
        time("dedup_ngram")(LlmText.dedupNgram(d))
        time("simhash")(LlmText.simhash(d))
        time("dedup_embed")(LlmSim.dedupEmbed(e, cellDims = grown))
        // NOTE: this frame's grown copies are DUP-SATURATED (see
        // embAtUnique's comment) — fine for index/search entries, the
        // wrong regime for prefilter economics; dedupEmbedPq is
        // measured against both regimes in the embpqstage section.
        time("semdd")(
          LlmSim.semDedup(e, exactFold = false, cellDims = grown))
        time("ivf2")(LlmSim.knnIvfTrained(e, exactFold = false,
          cellDims = grown))
        // PQ: codebook is constant-size (M×256) at ANY corpus — the
        // ladder should show pure linear scan behavior. queryMod is
        // SCALED so the query set stays fixed (~100) as the corpus
        // grows: production ADC serves a bounded query workload, and
        // leaving the fixture's %-convention alone would measure a
        // Q∝N artifact (Q×N join), not the operator
        time("pq_search")(Pq.search(e, exactFold = false,
          queryMod = LlmSim.QueryMod * kk))
        if (!silent)
          println(s"sim_$tag docs=${d.count()} vecs=${e.count()} " +
            s"cellDims=$grown")
      }
      runSim("warm", 1, silent = true)
      rungs.foreach(kk => runSim(s"${kk}x", kk))
    }

    // ANN recall/cost frontier (VERDICT r16 #8): annRecall across
    // nprobe × cellDims on the sf fixture — the tuning table a 100-TB
    // operator consults instead of guessing an nprobe. The exact side
    // is bounded (queries only), so the sweep's cost is dominated by
    // the IVF side it is grading. exactFold = false (the production
    // trainer); recall is the mean over queries at k = IvfTopK.
    if (sections("recall")) {
      for (dims <- Seq(4, 6, 8); np <- Seq(1, 2, 4, 8)) {
        val t0 = System.nanoTime()
        val ((n, mean), release) = CacheScope.collect {
          val r = LlmSim.annRecall(embBase, k = LlmSim.IvfTopK,
            nprobe = np, cellDims = dims, exactFold = false)
            .agg(count(lit(1)).as("n"), avg(col("recall")).as("m"))
            .head()
          (r.getLong(0), r.getDouble(1))
        }
        release()
        println(f"recall dims=$dims%-2d np=$np%-2d queries=$n%6d " +
          f"recall@${LlmSim.IvfTopK}=$mean%.4f " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }

    // Stage attribution for dedupEmbedPq (margin mode) at K× — same
    // restated-stages idiom as ngramstage: codebook train+collect,
    // packing, pair volume, prefilter keep rate, survivor fetch.
    if (sections("embpqstage")) {
      val grown = LlmSim.IvfDims +
        math.ceil(math.log(k.toDouble) / math.log(2)).toInt
      def t[A](name: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"embpqstage $name%-12s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      // Both growth regimes, cold, for the baseline-vs-prefilter
      // economics: `sat` = dup-saturated (embAt — ~98% of candidates
      // are true dups, so EVERY method must fetch floats for nearly
      // every pair and a prefilter can only lose); `uniq` = dup-rare
      // (embAtUnique — the realistic regime, where the prefilter's
      // keep-rate is the whole game).
      for ((tag, frame) <- Seq("sat" -> embAt(k),
          "uniq" -> embAtUnique(k))) {
        val dir = s"/tmp/graft_scale_embpq_$tag"
        frame.write.mode("overwrite").parquet(dir)
        val emT = spark.read.parquet(dir)
        val ((), rel) = CacheScope.collect {
          t(s"base_cold_$tag")(LlmSim.dedupEmbed(emT, cellDims = grown)
            .write.format("noop").mode("overwrite").save())
          // DELIBERATE CAP, not a silent one: pqm on the saturated
          // frame is the measured known-pathology (98.4% keep → the
          // prefilter only adds work; 785 s at 100×, ~100 GB of
          // pair-frame spill that filled this host's disk) — the
          // number is on record in COVERAGE; re-measuring it every
          // probe run buys nothing.
          if (tag != "sat")
            t(s"pqm_cold_$tag")(LlmSim.dedupEmbedPq(emT, grown,
                exactBound = false)
              .write.format("noop").mode("overwrite").save())
        }
        rel()
      }
      val em = spark.read.parquet("/tmp/graft_scale_embpq_uniq")
      val ((), release) = CacheScope.collect {
        val (cvsL, bbsL) = t("codebook")(
          Pq.localCodebook(Pq.codebook(em, exactFold = false)))
        val e = CacheScope.pin(LlmSim.cellRows(em, grown))
        t("cells_pin")(e.write.format("noop").mode("overwrite").save())
        val vn = when(col("norm") > 0,
          transform(col("v"), x => x / col("norm"))).otherwise(col("v"))
        val codes = CacheScope.pin(Pq
          .withPacked(e.withColumn("vn", vn), col("vn"), cvsL, bbsL)
          .select(col("vec_id"), col("cell"), col("packed"), col("err")))
        t("pack_pin")(
          codes.write.format("noop").mode("overwrite").save())
        val aSide = codes.select(col("cell"), col("vec_id").as("id_a"),
          col("packed").as("pa"), col("err").as("ea"))
        val bSide = codes.select(col("cell"), col("vec_id").as("id_b"),
          col("packed").as("pb"), col("err").as("eb"))
        val pairs = aSide.join(bSide, Seq("cell"))
          .filter(col("id_a") < col("id_b"))
        t("pairs")(println(s"embpqstage n_pairs=${pairs.count()}"))
        val sdcSq = call_function("graft_sdc", col("pa"), col("pb"),
          cvsL, bbsL)
        // the r18 RAW keep rule (see dedupEmbedPq scaladoc: the +e²
        // debias over-penalized correlated-residual true pairs)
        val cand = pairs.filter(
          lit(1.0) - sdcSq / 2 >=
            lit(LlmSim.EmbedDupThreshold - 0.2))
          .select(col("id_a"), col("id_b"))
        t("prefilter")(println(s"embpqstage n_kept=${cand.count()}"))
        t("fetch_verify")(cand
          .join(e.select(col("vec_id").as("id_a"), col("v").as("va"),
            col("norm").as("na")), Seq("id_a"))
          .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"),
            col("norm").as("nb")), Seq("id_b"))
          .withColumn("cosine",
            round(call_function("graft_dot", col("va"), col("vb")) /
              (col("na") * col("nb")), 6))
          .filter(col("cosine") >= LlmSim.EmbedDupThreshold)
          .write.format("noop").mode("overwrite").save())
        t("full")(LlmSim.dedupEmbedPq(em, grown, exactBound = false)
          .write.format("noop").mode("overwrite").save())
      }
      release()
    }

    // Stored-index SERVING ladder (VERDICT r18 item 1's done-bar):
    // freeze+encode a 1×/10×/K× corpus into the partitioned codes
    // layout, then time Pq.searchIvfIndex with a FIXED ~100-query
    // batch at fixed nprobe and per-rung-grown cellDims (k ∝ corpus).
    // Expected membership per probe ≈ nprobe·N/2^cellDims stays ~flat
    // across rungs, so SERVE TIME MUST STAY ~FLAT while the corpus
    // grows K× — that is the whole point of the cent_id-partitioned
    // layout (the r17 plan shuffled O(corpus) per query batch and
    // would have scaled linearly here). Build time is reported
    // separately (it IS linear — one map-only encode pass).
    if (sections("serve")) {
      val queries = embBase
        .filter(col("vec_id") % LlmSim.QueryMod === 0)
        .select(col("vec_id"), col("embedding"))
      queries.write.mode("overwrite")
        .parquet("/tmp/graft_scale_serve_q")
      val q = spark.read.parquet("/tmp/graft_scale_serve_q")
      println(s"serve queries=${q.count()}")
      for (kk <- Seq(1, 10, k).distinct.sorted.filter(_ <= k)) {
        val grown = LlmSim.IvfDims +
          math.ceil(math.log(kk.toDouble) / math.log(2)).toInt
        val dir = s"/tmp/graft_scale_serve_corpus_$kk"
        embAtUnique(kk).write.mode("overwrite").parquet(dir)
        val corpus = spark.read.parquet(dir)
        val idx = s"/tmp/graft_scale_serve_idx_$kk"
        val fsP = new org.apache.hadoop.fs.Path(idx)
        fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(fsP, true)
        val t0 = System.nanoTime()
        Pq.buildIndexIfAbsent(spark, corpus, idx,
          exactFold = false, cellDims = grown)
        println(f"serve_${kk}x build  " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s " +
          s"vecs=${corpus.count()} cellDims=$grown")
        // two timed serves: the second is the steady-state number
        // (first pays codegen + footer reads)
        for (rep <- 1 to 2) {
          val t1 = System.nanoTime()
          Pq.searchIvfIndex(spark, q, idx)
            .write.format("noop").mode("overwrite").save()
          println(f"serve_${kk}x query$rep " +
            f"${(System.nanoTime() - t1) / 1e9}%8.2f s")
        }
      }
    }

    // Compaction rung (round 18): a long-lived STREAMED index accrues
    // one dir per batch, so probe enumeration is O(batches × probed
    // cells) and each cell's membership splinters across one file per
    // batch — after the per-cell clustering fix, batch count is the
    // remaining multiplier on the serving scan's file count. Build the
    // 10× corpus as 64 streamed chops, serve, Pq.compact, serve again:
    // the query must get FASTER (≈64× fewer files per probed cell) and
    // the answer must not change.
    if (sections("compactserve")) {
      val nB = 64
      val dir = "/tmp/graft_scale_cserve_corpus"
      embAtUnique(10).write.mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      val queries = embBase
        .filter(col("vec_id") % LlmSim.QueryMod === 0)
        .select(col("vec_id"), col("embedding"))
      val idx = "/tmp/graft_scale_cserve_idx"
      val fsP = new org.apache.hadoop.fs.Path(idx)
      val fsh = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fsh.delete(fsP, true)
      val grown = LlmSim.IvfDims + 4 // the serve rung's k ∝ N rule, 10×
      Pq.freeze(spark, corpus, idx, exactFold = false, cellDims = grown)
      val t0 = System.nanoTime()
      for (b <- 0 until nB)
        graft.streaming.StreamingPqEncode.applyBatch(spark,
          corpus.filter(pmod(col("vec_id"), lit(nB)) === b),
          idx, b.toLong)
      println(f"cserve build($nB%d chops) " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s " +
        s"vecs=${corpus.count()} cellDims=$grown")
      def codeFiles(): Int = {
        val it = fsh.listFiles(
          new org.apache.hadoop.fs.Path(s"$idx/codes"), true)
        var n = 0
        while (it.hasNext) {
          if (it.next().getPath.getName.endsWith(".parquet")) n += 1
        }
        n
      }
      def serve(tag: String): Long = {
        var sig = 0L
        for (rep <- 1 to 2) {
          val t1 = System.nanoTime()
          val rows = Pq.searchIvfIndex(spark, queries, idx)
            .agg(count(lit(1)), sum(col("vec_id"))).collect()
          println(f"cserve ${tag}_q$rep " +
            f"${(System.nanoTime() - t1) / 1e9}%8.2f s")
          sig = rows.head.getLong(1)
        }
        sig
      }
      println(s"cserve files_before=${codeFiles()}")
      val sigBefore = serve("batched")
      val t2 = System.nanoTime()
      Pq.compact(spark, idx)
      println(f"cserve compact " +
        f"${(System.nanoTime() - t2) / 1e9}%8.2f s")
      println(s"cserve files_after=${codeFiles()}")
      val sigAfter = serve("compacted")
      require(sigBefore == sigAfter,
        s"compaction changed the answer: $sigBefore != $sigAfter")
    }

    // Clustered-corpus recall frontier (VERDICT r18 #6): R7's
    // nprobe×cellDims table was measured on the isotropic-noise
    // fixture — the hardest case for ANY quantizer, so its absolute
    // recalls understate every real deployment. This reruns the sweep
    // on PLANTED-cluster fixtures (cluster term + per-vector noise,
    // both hash-deterministic), at two tightness settings, so the
    // table gives absolute operating points for data with structure:
    //   tight: cluster scale 0.35 vs noise 0.15 (within cos ≈ 0.84)
    //   loose: cluster scale 0.25 vs noise 0.25 (within cos ≈ 0.50)
    if (sections("recallc")) {
      def clustered(nClusters: Int, a: Double, b: Double): DataFrame =
        embBase.select(col("vec_id"),
            pmod(hash(col("vec_id")), lit(nClusters)).as("cid"),
            col("embedding"))
          .withColumn("embedding",
            transform(col("embedding"), (_, j) =>
              ((pmod(hash(lit(7), col("cid"), j), lit(2001)) - 1000)
                .cast("double") / 1000.0 * a +
               (pmod(hash(lit(11), col("vec_id"), j), lit(2001)) - 1000)
                .cast("double") / 1000.0 * b).cast("float")))
          .select(col("vec_id"), col("embedding"))
      for ((tag, a, b) <- Seq(("tight", 0.35, 0.15),
          ("loose", 0.25, 0.25))) {
        val dir = s"/tmp/graft_scale_recallc_$tag"
        clustered(64, a, b).write.mode("overwrite").parquet(dir)
        val e = spark.read.parquet(dir)
        for (dims <- Seq(4, 6, 8); np <- Seq(1, 2, 4, 8)) {
          val t0 = System.nanoTime()
          val ((n, mean), release) = CacheScope.collect {
            val r = LlmSim.annRecall(e, k = LlmSim.IvfTopK,
              nprobe = np, cellDims = dims, exactFold = false)
              .agg(count(lit(1)).as("n"), avg(col("recall")).as("m"))
              .head()
            (r.getLong(0), r.getDouble(1))
          }
          release()
          println(f"recallc_$tag dims=$dims%-2d np=$np%-2d " +
            f"queries=$n%6d recall@${LlmSim.IvfTopK}=$mean%.4f " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      }
    }

    // 768-dim dedupEmbedPq economics (VERDICT r18 #4): the prefilter
    // pays nothing at 64 dims (embpqstage's honest negative — an SDC
    // lookup saves a 64-mult dot, too cheap to beat the packing tax).
    // At 768 dims the verify dot costs 12× more per pair while the
    // SDC estimate still costs M=8 lookups over the SAME 8-byte word
    // — this measures whether (and where) that flips the economics,
    // on a clustered dup-rare fixture (cluster term the 96-dim-
    // subspace codebook can capture, per-vector noise keeping true
    // dups rare). Reports base vs prefiltered wall time plus the
    // keep-rate, at 1× and K×.
    if (sections("embpq768")) {
      val dims768 = 768
      def emb768(kk: Int, nClusters: Int): DataFrame =
        (0 until kk).map { i =>
          embBase.select(
              (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"))
            .withColumn("cid",
              pmod(hash(col("vec_id")), lit(nClusters)))
            .withColumn("embedding",
              transform(sequence(lit(0), lit(dims768 - 1)), j =>
                ((pmod(hash(lit(7), col("cid"), j), lit(2001)) - 1000)
                  .cast("double") / 1000.0 * 0.2 +
                 (pmod(hash(lit(11), col("vec_id"), j), lit(2001))
                  - 1000).cast("double") / 1000.0 * 0.3)
                  .cast("float")))
            .select(col("vec_id"), col("embedding"))
        }.reduce(_ unionByName _)
      for (kk <- Seq(1, k).distinct.sorted.filter(_ <= k)) {
        val grown = LlmSim.IvfDims +
          math.ceil(math.log(kk.toDouble) / math.log(2)).toInt
        val dir = s"/tmp/graft_scale_embpq768_$kk"
        emb768(kk, 64 * kk).write.mode("overwrite").parquet(dir)
        val e = spark.read.parquet(dir)
        def t(name: String)(body: => Unit): Unit = {
          val t0 = System.nanoTime()
          body
          println(f"embpq768_${kk}x $name%-12s " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        val ((), rel) = CacheScope.collect {
          t("base_cold")(LlmSim.dedupEmbed(e, cellDims = grown)
            .write.format("noop").mode("overwrite").save())
        }
        rel()
        val ((), rel2) = CacheScope.collect {
          t("pqm_cold")(LlmSim.dedupEmbedPq(e, grown,
              exactBound = false, dims = dims768)
            .write.format("noop").mode("overwrite").save())
          t("pqx_cold")(LlmSim.dedupEmbedPq(e, grown,
              exactBound = true, dims = dims768)
            .write.format("noop").mode("overwrite").save())
        }
        rel2()
        // recall audit of the margin mode at this dimension
        val exact = LlmSim.dedupEmbed(e, cellDims = grown).count()
        val kept = LlmSim.dedupEmbedPq(e, grown, exactBound = false,
          dims = dims768).count()
        println(s"embpq768_${kk}x pairs exact=$exact margin=$kept")
      }
    }

    // Stage attribution for dedupNgram at K× — the ladder times the
    // operator end-to-end; this splits pin-build / candidates /
    // verify so a superlinear rung is DIAGNOSED, not guessed
    // (each stage timed over pinned inputs, so it measures itself).
    if (sections("ngramstage")) {
      val dir = "/tmp/graft_scale_ngramstage"
      docsAt(k).write.mode("overwrite").parquet(dir)
      val d = spark.read.parquet(dir)
      def t[A](name: String)(body: => A): A = {
        val t0 = System.nanoTime()
        val r = body
        println(f"ngramstage $name%-14s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      // the operator end-to-end, COLD (own cache scope, nothing shared
      // with the decomposition below) — this is the ladder's number
      val ((), releaseCold) = CacheScope.collect {
        t("full_cold")(LlmText.dedupNgram(d)
          .write.format("noop").mode("overwrite").save())
      }
      releaseCold()
      val ((), release) = CacheScope.collect {
        val sh = CacheScope.pin(LlmText.shingles(d))
        t("shingles_pin")(
          sh.write.format("noop").mode("overwrite").save())
        val hsh = CacheScope.pin(LlmText.hashedShingles(sh))
        t("hashed_pin")(
          hsh.write.format("noop").mode("overwrite").save())
        // the candidate stage decomposed (same expressions as
        // ngramCandidates, restated so each exchange times alone)
        val posting = sh
          .select(col("doc_id"), explode(col("shingles")).as("g0"))
          .select(col("doc_id"), xxhash64(col("g0")).as("gram"))
        t("post_explode")(
          println(s"ngramstage n_postings=${posting.count()}"))
        // restates the r18 skew-safe formulation: groupBy df (map-side
        // partials) + join-back, replacing the per-gram count window
        // whose partition materialized on one task
        val rareGrams = posting.groupBy(col("gram"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= LlmText.NgramDfCap)
          .select(col("gram"))
        val rare = CacheScope.pin(posting
          .join(rareGrams, Seq("gram"))
          .select(col("doc_id"), col("gram")))
        t("df_join_pin")(
          rare.write.format("noop").mode("overwrite").save())
        val pre = rare.as("x").join(rare.as("y"),
            col("x.gram") === col("y.gram") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        t("pair_join")(
          println(s"ngramstage n_prepairs=${pre.count()}"))
        t("pair_agg")(println("ngramstage n_agg=" +
          pre.groupBy(col("id_a"), col("id_b"))
            .agg(count(lit(1)).as("shared")).count()))
        val cand = CacheScope.pin(LlmText.ngramCandidates(sh))
        t("candidates")(println(s"ngramstage n_cand=${cand.count()}"))
        t("verify_only")(LlmText.verifyJaccard(cand, hsh)
          .write.format("noop").mode("overwrite").save())
        t("full_replay")(LlmText.dedupNgram(d)
          .write.format("noop").mode("overwrite").save())
      }
      release()

      // Zipfian HOT-GRAM rung (VERDICT r17 #5): every document gets
      // the same appended sentence, planting ~7 corpus-wide grams
      // whose posting lists are each the WHOLE corpus. Under the old
      // count-window df those lists funneled through single tasks
      // before the cap dropped them; under the groupBy+join they
      // arrive as map-side partials and the join probes an absent
      // key. Pass = hotgram_cold lands in the same band as full_cold
      // (the hot grams are all > NgramDfCap, so the OUTPUT pair set
      // is identical to the no-suffix corpus's).
      val hotDir = "/tmp/graft_scale_ngramhot"
      docsAt(k)
        .withColumn("text", concat(col("text"),
          lit(" zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8")))
        .write.mode("overwrite").parquet(hotDir)
      val hot = spark.read.parquet(hotDir)
      val ((), releaseHot) = CacheScope.collect {
        t("hotgram_cold")(LlmText.dedupNgram(hot)
          .write.format("noop").mode("overwrite").save())
      }
      releaseHot()
    }

    // PageRank at K× edges (VERDICT r12 #4): the per-round cost is
    // the edge scan + the groupBy(dst) transpose — with the edge
    // list cache-pinned on src, K× edges should cost ~K× per round,
    // never K² (no re-shuffle of edges, rank frame stays node-sized).
    // Its own section so the 100× edge case can run without the rest
    // of the analytics battery.
    if (sections("analytics") || sections("pagerank")) {
      def timePr(tag: String, mult: Int, silent: Boolean = false)
          : Unit = {
        val dir = s"/tmp/graft_scale_pr_$tag"
        val nc = 30000L
        (0 until mult).map(i => base
            .filter(col("user_id").isNotNull)
            .select((col("user_id") + lit(i * 100000L)).as("src"),
              pmod(col("event_id") * 131 + 7 + lit(i), lit(nc))
                .as("dst")))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(dir)
        val edges = spark.read.parquet(dir)
        val t0 = System.nanoTime()
        PageRank.run(edges, iters = 10, scale = 7)
          .write.format("noop").mode("overwrite").save()
        if (!silent)
          println(f"an_$tag%-8s pagerank10   " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      timePr("warm", 1, silent = true)
      timePr("1x", 1)
      timePr(s"${k}x", k)
    }

    // df-cap policy (round 12): a growth model where DUPLICATION
    // scales with the corpus — every seed doc appears `dup` times.
    // Past dup > NgramDfCap every gram of a copy family crosses the
    // ABSOLUTE cap, so per-doc candidate work collapses to zero and
    // recall with it; the corpus-fraction cap admits the same constant
    // FRACTION of the corpus at any size, so the copies keep finding
    // each other. (tfidfPairs shares the knob and the arithmetic.)
    if (sections("dfcap")) {
      val dup = math.max(25, 3 * k) // > NgramDfCap at any probe k
      val seedN = 200
      docBase.limit(seedN)
        .write.mode("overwrite").parquet("/tmp/graft_scale_dfcap_seed")
      val sd = spark.read.parquet("/tmp/graft_scale_dfcap_seed")
      (0 until dup).map(i =>
          sd.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet("/tmp/graft_scale_dfcap")
      val grown = spark.read.parquet("/tmp/graft_scale_dfcap")
      // frac chosen so ceil(frac·N) == NgramDfCap at SEED size: the 1×
      // behavior is identical, only the growth behavior differs
      val frac = LlmText.NgramDfCap.toDouble / seedN
      def probeCap(tag: String, d: DataFrame, f: Double): Unit = {
        val t0 = System.nanoTime()
        val pairs = LlmText.dedupNgram(d, dfCapFraction = f).count()
        println(f"dfcap  $tag%-12s pairs=$pairs%9d " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      probeCap("warm", sd, 0.0)
      probeCap("abs_1x", sd, 0.0)
      probeCap(s"abs_${dup}x", grown, 0.0)
      probeCap(s"frac_${dup}x", grown, frac)
    }

    // Round-12 additions: entity resolution (pair work bounded per
    // entity -> linear in rows), the fused quality audit (one scan),
    // PMI collocations (two aggregates + vocab joins), and BPE
    // training (per-round cost ∝ DISTINCT words, which grows far
    // slower than the corpus).
    if (sections("resolve")) {
      def t(tag: String, name: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"resolve $tag%-8s $name%-12s " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      val cust = Tables.customer(spark, sfDir)
      def entities(mult: Int): DataFrame = {
        val rep = (0 until mult).map(i => cust.withColumn("c_custkey",
          col("c_custkey") + lit(i.toLong * 10000000L)))
          .reduce(_ unionByName _)
        // same guarantees as cls_entity_res: clean keys are padded
        // multiples of 11 (pairwise >= 2 edits), variants 1 edit off
        rep.filter(col("c_custkey").isNotNull)
          .withColumn("__e", pmod(col("c_custkey"), lit(30000L)))
          .withColumn("__clean", concat(lit("E"),
            lpad((col("__e") * 11).cast("string"), 7, "0")))
          .withColumn("__v", pmod(floor(col("c_custkey") / 30000L),
            lit(3)))
          .withColumn("__nm",
            when(col("__v") === 1, concat(col("__clean"), lit("x")))
              .when(col("__v") === 2,
                concat(lit("z"), expr("substring(__clean, 2)")))
              .otherwise(col("__clean")))
      }
      // On a SHORT DENSE key space the q=3 gram vocabulary saturates
      // (~4k grams), per-gram df grows linearly with rows and the
      // candidate equi-join quadratically — measured 2.6 s -> 372 s at
      // 10x (and larger q only shunts these 8-char keys into the poor
      // branch). resolve(k<=2) therefore routes through the FastSS
      // deletion-neighborhood join, whose per-key fan-in is bounded by
      // string VALUES within distance k of the key (alphabet x length,
      // independent of row count). That bounds CANDIDATES per row, not
      // wall-clock to strict linearity: the measured 10x growth
      // (0.99 s -> 40 s, r12) is shuffle/dedup constants on a 10x
      // bigger candidate set, i.e. the quadratic blowup is gone but
      // super-constant shuffle scaling remains on record — judge the
      // probe against the gram path's 372 s, not against an ideal 10x.
      def ent(tag: String, mult: Int): Unit =
        t(tag, "entity_del1")(EntityResolution
          .resolve(entities(mult), "c_custkey", "__nm", k = 1))
      def ent2(tag: String, mult: Int): Unit =
        t(tag, "entity_del2")(EntityResolution
          .resolve(entities(mult), "c_custkey", "__nm", k = 2))
      def entGram(tag: String, mult: Int): Unit =
        t(tag, "entity_gram3")(FuzzyJoin.selfJoin(
          entities(mult).select(col("c_custkey").as("id"),
            col("__nm").as("s")), "id", "s", k = 1, q = 3))
      ent("warm", 1); ent("1x", 1); ent(s"${k}x", k)
      ent2("1x", 1); ent2(s"${k}x", k)
      entGram("1x", 1)

      // round-14 dense-output guard: radius-2 on a SATURATING numeral
      // space (1000 distinct 4-digit codes, tripled) is detected by
      // the candidate-bound probe before the join starts — the
      // no-silent-caps rule for the one regime no blocking scheme can
      // outrun (the true pair set itself is dense)
      {
        val sat = spark.range(3000L).select(col("id"),
          lpad(pmod(col("id"), lit(1000L)).cast("string"), 4, "0")
            .as("s"))
        val tripped =
          try {
            FuzzyJoin.selfJoin2(sat, "id", "s", denseGuard = "error")
              .write.format("noop").mode("overwrite").save()
            false
          } catch { case e: IllegalStateException =>
            e.getMessage.contains("dense-output regime")
          }
        require(tripped, "dense-output guard did not trip on the " +
          "saturating radius-2 fixture")
        println("resolve dense_guard   tripped as designed on the " +
          "saturating radius-2 fixture")
      }

      // Poor branch (strings below the gram-theorem threshold, round
      // 13): the length-bucket EQUI-join replacing the BNLJ-shaped
      // length-band probe. The plan assertion is the proof; the
      // timings record the inherent cost semantics — with NO gram
      // guarantee the poor branch must verify every same-length-band
      // pair, so candidates grow ~quadratically in the POOR row count
      // by construction (the branch exists for residual fractions,
      // not poor-majority corpora). What the rewrite fixes is the
      // join MECHANISM: shuffled per-length buckets instead of
      // broadcasting one side under a nested loop.
      {
        def shorts(n: Int): DataFrame = spark.range(n.toLong)
          .select(col("id"),
            lpad(pmod(col("id"), lit(100000L)).cast("string"), 5, "0")
              .as("s"))
        def poorProbe(tag: String, n: Int): Unit = {
          val out = FuzzyJoin.selfJoin(shorts(n), "id", "s", k = 2, q = 3)
          val plan = out.queryExecution.executedPlan.toString
          require(!plan.contains("BroadcastNestedLoopJoin"),
            s"poor branch planned as BNLJ:\n$plan")
          t(tag, "poor_eqjoin")(out)
        }
        poorProbe("1x", 500); poorProbe(s"${k}x", 500 * k)
      }

      import graft.operators.QualityChecks
      def qa(tag: String, ev: DataFrame): Unit =
        t(tag, "quality")(QualityChecks.audit(ev, "events", Seq(
          QualityChecks.NotNull("user_id"),
          QualityChecks.InRange("value", 0.0, 500.0),
          QualityChecks.AcceptedValues("event_type",
            Seq("view", "cart", "purchase")),
          QualityChecks.Unique(Seq("event_id")))))
      qa("1x", base); qa(s"${k}x", wide)

      def pmi(tag: String, d: DataFrame): Unit =
        t(tag, "pmi")(LlmPrep.collocations(d))
      pmi("1x", docBase); pmi(s"${k}x", docK)

      def bpe(tag: String, d: DataFrame): Unit = {
        val t0 = System.nanoTime()
        BpeTrain.train(d, merges = 4, minCount = 2L).count()
        println(f"resolve $tag%-8s bpe_train4   " +
          f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
      bpe("1x", docBase); bpe(s"${k}x", docK)

      // Incremental ER: per-batch fold cost must track the BATCH, not
      // the registry — same O(batch) claim (and probe shape) as the
      // vector ingest. Grow the registry k× via pre-folds, then time
      // an identical batch against small vs grown state.
      {
        val erPath = "/tmp/graft_scale_er"
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(erPath))
        // doubled batch tag keeps batches >= 2 edits apart: each fold
        // opens a fresh entity space, so the probe isolates
        // state-growth cost from true-duplicate density (which is
        // output-bound by nature)
        def batchOf(i: Int): DataFrame = entities(1)
          .select((col("c_custkey") + lit(i.toLong * 100000000L))
            .as("id"),
            concat(lit(s"${i}_${i}_"), col("__nm")).as("s"))
        def foldTimed(tag: String, i: Int): Unit = {
          val t0 = System.nanoTime()
          ErIngest.ingest(spark, batchOf(i), erPath, "id", "s", s"b$i")
          println(f"resolve $tag%-8s er_fold      " +
            f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
        foldTimed("warm", 0); foldTimed("1x", 1)
        (2 until k).foreach(i =>
          ErIngest.ingest(spark, batchOf(i), erPath, "id", "s", s"b$i"))
        foldTimed(s"${k}x", k)
      }
    }
    spark.stop()
  }
}
