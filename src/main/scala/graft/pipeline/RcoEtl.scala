package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sinks.ParquetSinks

/** Per-site end-to-end orchestration — the engine-side equivalent of
  * `site_server_overall_etl` (`App/etl/overall_etl.py:52-240`,
  * `ref/RCO_Overall_orchestrator.R`) and `mes_etl_main`
  * (`App/etl/transform/mes_etl.py:23-289`): one call computes every
  * output table of the reference pipeline from a canonical downtime +
  * production log, honoring the per-site analysis toggles
  * (`App/rco_main.py:95-106`), and [[load]] writes them through the
  * idempotent sinks.
  *
  * A user of the reference switches by supplying their site's
  * [[SiteParams]] (CO predicate SQL, trigger parameter, toggles) and
  * the two canonical logs; every downstream table then derives from
  * one shared spine (computed once — the reference's single-pass
  * structure, here made explicit).
  */
object RcoEtl {

  /** Site configuration (Site_Config row, SURVEY §1.2). */
  case class SiteParams(
      server: String,
      coPredicateSql: String,
      triggerParam: Double = 120.0,
      splitOnCause: Boolean = false,
      changeoverFailureNoSplit: Boolean = false,
      pythonFactor4: Boolean = false,
      machineLevel: Boolean = true,
      firstStop: Boolean = true,
      multiConstraint: Boolean = false,
      constraintMachineSuffixes: Seq[String] = Seq("M0"))

  /** All output tables, keyed by their reference names.
    * @param constraintCounts optional (LINE, Number_of_Constraints) —
    *        multi-constraint lines skip the Gantt constraint pass */
  def run(fullLog0: DataFrame, prodLog: DataFrame, p: SiteParams,
      constraintCounts: Option[DataFrame] = None)
      : Map[String, DataFrame] =
    runReleasable(fullLog0, prodLog, p, constraintCounts)._1

  /** [[run]] plus a release handle that unpersists every frame pinned
    * while building this site's plans — the five spine frames below
    * AND the operator-internal caches (BrandcodeResolve's per-CO frame,
    * the Gantt passes' ranked stops), captured via [[CacheScope]]. A
    * single-site caller can ignore the handle (the session keeps one
    * site's spine warm, which is what its queries want) — but anything
    * that LOOPS sites must call it per site, or the cache accumulates
    * O(sites) dead frames and eviction pressure lands on whichever
    * site runs last (the exact pathology the bench had to work around
    * with clearState). [[runSites]] does. */
  def runReleasable(fullLog0: DataFrame, prodLog: DataFrame, p: SiteParams,
      constraintCounts: Option[DataFrame] = None)
      : (Map[String, DataFrame], () => Unit) = CacheScope.collect {
    def pin(df: DataFrame): DataFrame = CacheScope.pin(df)
    // Every output table re-reads the canonical log (the Gantt passes
    // alone consume it four times); without a persist each consumer
    // re-executes the dedup + UPTIME windows from the source scan —
    // measured 2x+ on the end-to-end wall time. The reference computes
    // this frame once per site run (`App/etl/overall_etl.py:52-80`).
    // A frame that arrives ALREADY persisted belongs to the caller (a
    // fleet loop sharing the canonical log across sites) — pinning it
    // into this site's scope would let the site's release evict the
    // shared cache mid-fleet, so leave its lifecycle to its owner.
    val fullLog =
      if (fullLog0.storageLevel != org.apache.spark.storage
        .StorageLevel.NONE) fullLog0
      else pin(fullLog0)
    val sesParams = Sessionize.Params(p.triggerParam, p.splitOnCause,
      p.changeoverFailureNoSplit, p.pythonFactor4)
    val coLog = graft.model.Rco.coFilter(fullLog, p.coPredicateSql)
    val ses = pin(Sessionize(coLog, sesParams))
    val agg = pin(CoAggregate(ses))
    // shared by uptime-till-next-CO and first-stop (computed once)
    val assigned = pin(FirstStopAfterCo.assignedStops(agg, fullLog))

    val bc = BrandcodeResolve(agg, fullLog)
    // pinned: consumed twice by load (table write + Script_Data aggregate)
    val coAggregated = pin(agg
      // MultiConstraint sites report the prorated downtime
      // (`App/etl/transform/mes_etl.py:225-230` divides in place)
      .withColumn("CO_DOWNTIME",
        if (p.multiConstraint) col("CO_DOWNTIME_prorated")
        else col("CO_DOWNTIME"))
      .join(bc.select("CO_Identifier", "Current_BRANDCODE",
        "Next_BRANDCODE", "Brandcode_Status"), Seq("CO_Identifier"))
      .join(
        FirstStopAfterCo.uptimeTillNextCo(agg, fullLog, Some(assigned))
          .select("CO_Identifier", "Total_Uptime_till_Next_CO"),
        Seq("CO_Identifier"))
      .withColumn("Server", lit(p.server)))

    val eventLog = ses
      .join(agg.select(col("CO_Identifier")), Seq("CO_Identifier"),
        "left_semi")
      .withColumn("OPERATOR_COMMENT",
        regexp_replace(regexp_replace(col("OPERATOR_COMMENT"),
          "\\r\\n", " "), "\\n", " "))
      .filter(col("LINE").isNotNull)
      .withColumn("Server", lit(p.server))

    val base = Map(
      "CO_Aggregated_Data" -> coAggregated,
      "CO_Event_Log" -> eventLog,
      "Runtime_per_Day_data" ->
        ProdOps.runtimePerDay(fullLog).withColumn("Server", lit(p.server)),
      "Day_Start" ->
        ProdOps.dayStart(fullLog).withColumn("Server", lit(p.server)),
      "BRANDCODE_data" -> ProdOps
        .brandcodeMaster(prodLog.filter(col("LineStatus") === "In Production"))
        .withColumn("Server", lit(p.server)))

    val withFs = if (!p.firstStop) base
      else base + ("First_Stop_after_CO_Data" ->
        FirstStopAfterCo.firstStops(agg, fullLog, Some(assigned))
          .withColumn("Server", lit(p.server)))

    if (!p.machineLevel) withFs
    else {
      val consLog = GanttGenerate.constraintLog(fullLog, ses,
        p.constraintMachineSuffixes)
      // ONE window-assignment join feeds both Gantt tables (it is the
      // Gantt chain's expensive stage); pinned so the point kernel and
      // the G4 event log don't re-run it
      val gAssigned = pin(GanttGenerate.assignedTagged(agg, fullLog,
        consLog, constraintCounts))
      withFs +
        ("Gantt_Data" -> GanttGenerate.ganttDataFromAssigned(gAssigned)
          .withColumn("Server", lit(p.server))) +
        ("Event_Log_for_Gantt" -> GanttGenerate
          .eventLogFromAssigned(gAssigned)
          .withColumn("Server", lit(p.server)))
    }
  }

  /** The 3-site heterogeneous fleet configuration
    * ([[graft.operators.RcoQueries.fleetSites]]) as full [[SiteParams]]
    * — what the fleet bench entry and the scale probe drive through
    * [[runSites]]. */
  def fleetSiteParams: Seq[SiteParams] =
    RcoQueries.fleetSites.map { case (server, pred, sp) =>
      SiteParams(server, pred, sp.triggerParam, sp.splitOnCause,
        sp.changeoverFailureNoSplit, sp.pythonFactor4)
    }

  /** Entry-point-1 semantics (`App/rco_main.py:90-118`,
    * `ref/RCO_Overall_orchestrator.R`): iterate the site-config rows,
    * run+load each site independently, and capture a per-site status —
    * one failing site must not abort the fleet (the reference's run log
    * records `Success` / `Failure (reason)` per server and continues).
    * Returns the run-log map in config order. */
  def runSites(spark: SparkSession, sites: Seq[SiteParams],
      fullLog: DataFrame, prodLog: DataFrame, baseDir: String)
      : Map[String, String] = {
    // The canonical logs are site-INDEPENDENT: every site re-reads
    // them (the dedup + UPTIME windows for fullLog, the In-Production
    // scan for prodLog). Persist them ONCE across the loop instead of
    // letting each site's scope pin-and-release its own copy — N-1
    // recomputes of the spine for an N-site fleet. Frames the caller
    // already persisted keep their caller-owned lifecycle.
    import org.apache.spark.storage.StorageLevel
    val ownFull = fullLog.storageLevel == StorageLevel.NONE
    val ownProd = prodLog.storageLevel == StorageLevel.NONE
    if (ownFull) fullLog.persist(StorageLevel.MEMORY_AND_DISK)
    if (ownProd) prodLog.persist(StorageLevel.MEMORY_AND_DISK)
    try sites.map { p =>
      p.server -> (try {
        // releasable variant: a fleet run pins five spine frames PER
        // SITE — without the per-site unpersist the Nth site computes
        // under N-1 sites' dead cache (eviction pressure, phantom
        // slowdowns; see the bench's clearState history)
        val (outputs, release) = runReleasable(fullLog, prodLog, p)
        try load(spark, outputs, baseDir, p.server) finally release()
        "Success"
      } catch {
        // NonFatal only: an OutOfMemoryError/LinkageError means the JVM
        // (and likely the SparkContext) is corrupt — recording it as a
        // per-site Failure and continuing the fleet would be lying
        case scala.util.control.NonFatal(e) =>
          s"Failure (${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString})"
      })
    }.toMap
    finally {
      if (ownFull) fullLog.unpersist()
      if (ownProd) prodLog.unpersist()
    }
  }

  /** Script_Data metadata row per line (A8/S11 stats,
    * `App/etl/overall_etl.py:200-211`) with the reference's full column
    * set (`ref/RCO_Overall_orchestrator.R:236-281,502-546`): System and
    * BU are Line_Input_Data config passthroughs (System defaults to the
    * line name, BU to "FHC" exactly as the reference hardcodes it),
    * MES_Line_Name IS the line name, Data_Update_Time is the run
    * timestamp the NEXT incremental run reads back as its T1 watermark
    * (`ref/RCO_Overall_orchestrator.R:68-72`;
    * [[graft.sources.ConfigOps.scriptDataWatermark]] is the read side).
    * Day_Start_hours comes from the Day_Start table (default 6); NA
    * Number_of_Constraints → 1, raised by the multi-constraint config
    * when larger. Number_of_COs is this engine's A8 surplus stat.
    * @param lineConfig optional (LINE, System[, BU]) config rows —
    *        the Line_Input_Data stand-in */
  def scriptData(coAggregated: DataFrame, server: String,
      dayStart: Option[DataFrame] = None,
      constraintCounts: Option[DataFrame] = None,
      updateTime: Option[java.sql.Timestamp] = None,
      lineConfig: Option[DataFrame] = None,
      bu: String = "FHC"): DataFrame = {
    val base = coAggregated.groupBy(col("LINE"))
      .agg(min(col("CO_StartTime")).as("First_Available_Data_Point"),
        max(col("CO_StartTime")).as("Last_Available_Data_Point"),
        count(lit(1)).as("Number_of_COs"))
    val withDs = dayStart match {
      case Some(ds) => base.join(
        broadcast(ds.select(col("LINE"), col("Day_Start_hours"))),
        Seq("LINE"), "left")
      case None =>
        base.withColumn("Day_Start_hours", lit(null).cast("double"))
    }
    val withCc = constraintCounts match {
      case Some(cc) => withDs.join(
        broadcast(cc.select(col("LINE"), col("Number_of_Constraints"))),
        Seq("LINE"), "left")
      case None =>
        withDs.withColumn("Number_of_Constraints", lit(null).cast("int"))
    }
    val withCfg = lineConfig match {
      case Some(cfg) => withCc.join(
        broadcast(cfg.select(
          (Seq("LINE") ++ Seq("System", "BU").filter(cfg.columns.contains))
            .map(col): _*)),
        Seq("LINE"), "left")
      case None => withCc
    }
    def defaulted(df: DataFrame, name: String, dflt: Column): DataFrame =
      if (df.columns.contains(name))
        df.withColumn(name, coalesce(col(name), dflt))
      else df.withColumn(name, dflt)
    defaulted(defaulted(withCfg, "System", col("LINE")), "BU", lit(bu))
      .na.fill(Map("Day_Start_hours" -> 6.0, "Number_of_Constraints" -> 1))
      .withColumn("Server", lit(server))
      .withColumn("Data_Update_Time",
        updateTime.map(t => lit(t)).getOrElse(current_timestamp())
          .cast("timestamp"))
      .withColumnRenamed("LINE", "MES_Line_Name")
      .select(col("System"), col("Data_Update_Time"),
        col("First_Available_Data_Point"),
        col("Last_Available_Data_Point"), col("MES_Line_Name"),
        col("Server"), col("Day_Start_hours"), col("BU"),
        col("Number_of_Constraints"), col("Number_of_COs"))
  }

  /** One-time migration of a Script_Data table written before the
    * schema-parity change (SURVEY §1.2): the old layout keyed rows on
    * `LINE` and had no System / BU / Data_Update_Time. The keyed merge
    * below joins on (Server, MES_Line_Name) and would otherwise throw
    * AnalysisException on the first load after an upgrade. Backfills
    * follow the same defaults [[scriptData]] emits (System ← line name,
    * BU ← "FHC"); Data_Update_Time backfills NULL — `max` ignores it,
    * so [[graft.sources.ConfigOps.scriptDataWatermark]] degrades to the
    * documented first-run full extract rather than inventing a
    * watermark the old table never recorded. */
  private def migrateLegacyScriptData(spark: SparkSession, path: String)
      : Unit =
    ParquetSinks.migrateLayout(spark, path) { stored =>
      if (stored.columns.contains("MES_Line_Name") ||
          !stored.columns.contains("LINE")) None
      else Some(stored
        .withColumnRenamed("LINE", "MES_Line_Name")
        .withColumn("System", col("MES_Line_Name"))
        .withColumn("BU", lit("FHC"))
        .withColumn("Data_Update_Time", lit(null).cast("timestamp")))
    }

  /** Idempotent load (S8–S11): the windowed tables go through the
    * delete+append upsert keyed on LINE — including the S9 CASCADE to
    * the event-log / Gantt / first-stop tables with the reference's
    * pads (`ref/RCO_Overall_orchestrator.R:302-499`: event log by event
    * end, Gantt with a 20-minute pad) — the brandcode master through
    * full-replace-with-dedup, Script_Data through the keyed merge.
    *
    * CO_Aggregated_Data is materialized FIRST (one count against its
    * persisted frame): that single pass fills every shared spine cache
    * (full log, sessionized, coAgg, assigned stops) the other tables
    * read. The table writes then all run CONCURRENTLY — independent
    * jobs on disjoint paths reading cached frames (Spark schedules
    * concurrent actions fine); sequential writes would leave the
    * cluster idle through each job's commit phase (~2x end-to-end wall
    * measured at sf0.1). */
  def load(spark: SparkSession, outputs: Map[String, DataFrame],
      baseDir: String, server: String,
      updateTime: Option[java.sql.Timestamp] = None): Unit = {
    // One run timestamp for every Script_Data row of this load — the
    // watermark the next incremental run reads back (T1 round-trip).
    val runTime = updateTime.getOrElse(
      new java.sql.Timestamp(System.currentTimeMillis()))
    outputs.get("CO_Aggregated_Data").foreach(df => { df.count(); () })
    // Every write goes through the reference's adaptive decimal
    // reduction first (`ref/RCO_Overall_orchestrator.R:119-131` — the
    // reducer runs on each frame right before its SQL append). The
    // magnitude probe is an extra action, so the frame is pinned for
    // the probe+write pair and released after — without the persist
    // each table's DAG would execute twice (probe, then write).
    def rounded(df: DataFrame)(write: DataFrame => Unit): Unit = {
      val alreadyCached = df.storageLevel.useMemory || df.storageLevel.useDisk
      val p = if (alreadyCached) df
        else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try write(graft.operators.ProdOps.roundAdaptiveAll(p))
      finally if (!alreadyCached) { p.unpersist(); () }
    }
    val writes: Seq[() => Unit] = Seq(
      outputs.get("CO_Aggregated_Data").map(df => () => {
        rounded(df)(r =>
          ParquetSinks.upsertWindow(spark, r, s"$baseDir/CO_Aggregated_Data",
            "LINE", "CO_Start_EPOCH", scopeCols = Seq("Server")))
        migrateLegacyScriptData(spark, s"$baseDir/Script_Data")
        rounded(scriptData(df, server, outputs.get("Day_Start"),
          updateTime = Some(runTime)))(r =>
          ParquetSinks.upsertByKey(spark, r,
            s"$baseDir/Script_Data", Seq("Server", "MES_Line_Name")))
      }),
      outputs.get("CO_Event_Log").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.upsertWindow(spark, r, s"$baseDir/CO_Event_Log",
            "LINE", "END_EPOCH", scopeCols = Seq("Server")))),
      outputs.get("First_Stop_after_CO_Data").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.upsertWindow(spark, r,
            s"$baseDir/First_Stop_after_CO_Data", "LINE", "START_TIME",
            scopeCols = Seq("Server")))),
      outputs.get("Gantt_Data").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.upsertWindow(spark, r, s"$baseDir/Gantt_Data",
            "Line", "StartTime", padSec = 20 * 60.0,
            scopeCols = Seq("Server")))),
      outputs.get("Event_Log_for_Gantt").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.upsertWindow(spark, r,
            s"$baseDir/Event_Log_for_Gantt", "LINE", "START_TIME",
            padSec = 20 * 60.0, scopeCols = Seq("Server")))),
      outputs.get("BRANDCODE_data").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.replaceDedup(spark, r, s"$baseDir/BRANDCODE_data",
            "BRANDCODE", scopeCols = Seq("Server")))),
      // keyed merge, NOT a plain append — re-running the same load must
      // not duplicate daily rows (the idempotency contract above)
      outputs.get("Runtime_per_Day_data").map(df => () =>
        rounded(df)(r =>
          ParquetSinks.upsertByKey(spark, r,
            s"$baseDir/Runtime_per_Day_data", Seq("Server", "Date", "LINE"))))
    ).flatten
    if (writes.nonEmpty) {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      import scala.util.{Failure, Try}
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(writes.size)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      // Each write is wrapped in Try so the sequence NEVER fails early:
      // load() must not return (or throw) while sibling writes are
      // still in flight — runSites starts the next site against the
      // same table paths, and an in-flight write racing the next
      // site's upsert could delete the other's staging dirs mid-swap.
      // All writes finish, THEN the first failure (if any) is rethrown.
      val results = try Await.result(
        Future.sequence(writes.map(w => Future(Try(w())))), Duration.Inf)
      finally pool.shutdown()
      // Rethrow the first failure with any siblings attached as
      // suppressed — several tables failing in one site run is one
      // diagnosis, not writes.size - 1 silently dropped stack traces.
      val failures = results.collect { case Failure(e) => e }
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(first.addSuppressed)
        throw first
      }
    }
  }
}
