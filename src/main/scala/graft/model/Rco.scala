package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Canonical RCO downtime-log model (SURVEY §1.2), instantiated over the
  * driver's `events` table so every operator has a DuckDB-checkable oracle.
  *
  * Mapping (deterministic, SQL-replicable on both engines):
  *   downtime_id = event_id          LINE       = 'L' + user_id
  *   START_TIME  = ts (sec-trunc)    DOWNTIME   = value (minutes)
  *   CAUSE_1     = event_type        CAUSE_2/3/4 = from props "k" (k%5/3/4)
  *   BRANDCODE   = 'B' + k%7         MACHINE    = LINE + ' M' + event_id%3
  * plus the reference's derived flags (`App/etl/extract/data_from_mdc.py:69-85`):
  * Planned_Stop_Check / Idle_Check / isExcluded / isStop.
  *
  * Derived times are carried as epoch-second doubles (START_EPOCH/END_EPOCH):
  * whole-second epochs plus `value*60` are exact IEEE arithmetic on both
  * engines, which sidesteps timestamp-precision parity issues (events.parquet
  * is ns-precision; Spark truncates to µs).
  *
  * The DuckDB-side twin of this adapter lives in [[RcoSql]] — keep in sync.
  */
object Rco {

  /** Tie-break/order key: numeric downtime id (carried as a real column
    * by [[downtimeLog]] so Spark and the DuckDB twin stay symmetric). */
  val dtid: Column = col("dtid")

  /** Ordered-within-LINE window every RCO operator shares (SURVEY §2.7). */
  val lineWindow = Window.partitionBy("LINE").orderBy(col("START_EPOCH"), dtid)

  /** Normalize `events` to the canonical downtime log (P1/P2 + F2-F5). */
  def downtimeLog(events: DataFrame): DataFrame = {
    val k = regexp_extract(col("props"), "[0-9]+", 0).cast("int")
    events
      .withColumn("k", k)
      .select(
        col("event_id").cast("string").as("downtime_id"),
        col("event_id").cast("long").as("dtid"),
        concat(lit("L"), col("user_id").cast("string")).as("LINE"),
        date_trunc("second", col("ts")).as("START_TIME"),
        col("value").as("DOWNTIME"),
        col("event_type").as("CAUSE_LEVELS_1_NAME"),
        when(col("k") % 5 === 4, lit("Changeover Failure"))
          .otherwise(concat(lit("K"), (col("k") % 5).cast("string")))
          .as("CAUSE_LEVELS_2_NAME"),
        concat(lit("M"), (col("k") % 3).cast("string"))
          .as("CAUSE_LEVELS_3_NAME"),
        concat(lit("N"), (col("k") % 4).cast("string"))
          .as("CAUSE_LEVELS_4_NAME"),
        // source-carried attribution columns (SURVEY §1.2: Fault, TEAM,
        // SHIFT, ProdDesc, ProcessOrder, Reason1..4Category ride every
        // downtime row in the reference extract and surface unchanged in
        // First_Stop / CO_Event_Log / Event_Log_for_Gantt)
        concat(lit("FLT"), (col("k") % 11).cast("string")).as("Fault"),
        concat(lit("T"), (col("k") % 4).cast("string")).as("TEAM"),
        concat(lit("S"), (col("k") % 3).cast("string")).as("SHIFT"),
        concat(lit("P"), (col("k") % 5).cast("string"), lit("-N"),
          (col("k") % 9).cast("string")).as("ProdDesc"),
        concat(lit("PO"), (col("k") % 17).cast("string"))
          .as("ProcessOrder"),
        // Reason1Category drives the reference's Proficy planned-stop
        // rule — keep it coherent with Planned_Stop_Check (signup)
        when(col("event_type") === "signup", lit("Planned Downtime"))
          .otherwise(concat(lit("Unplanned-"), (col("k") % 3).cast("string")))
          .as("Reason1Category"),
        concat(lit("R2C-"), (col("k") % 3).cast("string"))
          .as("Reason2Category"),
        concat(lit("R3C-"), (col("k") % 5).cast("string"))
          .as("Reason3Category"),
        concat(lit("R4C-"), (col("k") % 7).cast("string"))
          .as("Reason4Category"),
        concat(lit("B"), (col("k") % 7).cast("string")).as("BRANDCODE"),
        concat(lit("L"), col("user_id").cast("string"), lit(" M"),
          (col("event_id") % 3).cast("string")).as("MACHINE"),
        // comments carry literal CR/LF so the CO-event-log scrub
        // (`ref/RCO_MES_ETL.R:274-275`) has something to clean
        when(col("k") % 3 === 1, concat(lit("c\nnl "), col("k")))
          .when(col("k") % 3 === 2, concat(lit("c\r\ncrlf "), col("k")))
          .otherwise(concat(lit("c "), col("k")))
          .as("OPERATOR_COMMENT"),
        when(col("event_type") === "signup", 1).otherwise(0)
          .as("Planned_Stop_Check"),
        when(col("event_type") === "view" && col("k") % 2 === 0, 1).otherwise(0)
          .as("Idle_Check"),
        (col("k") % 11 === 0).as("isExcluded"),
        (!col("event_type").isin("view", "signup")).as("isStop"))
      .withColumn("START_EPOCH", col("START_TIME").cast("double"))
      .withColumn("END_EPOCH", col("START_EPOCH") + col("DOWNTIME") * 60)
  }

  /** D1 multi-constraint dedup on (START_TIME, LINE), deterministic keep of
    * the smallest downtime_id (`App/etl/extract/data_from_mdc.py:91-94`;
    * the reference's keep='first' depends on input order — we define a
    * total order, SURVEY §7.4), then the UPTIME-since-previous-event
    * derivation (minutes, 0 for the first event per line, clamped >= 0).
    *
    * Both steps ride ONE exchange+sort: within [[lineWindow]]'s
    * (START_EPOCH, dtid) order, a (LINE, START_EPOCH) duplicate group is
    * consecutive with the smallest dtid first, so "keep first per group"
    * is `START_EPOCH != lag(START_EPOCH)` — same partitioning as the
    * UPTIME lag that follows, so Catalyst plans a single shuffle of the
    * log instead of two (a partitionBy(LINE, START_EPOCH) row_number
    * would re-hash the full log a second time). The DuckDB twin keeps
    * the row_number formulation — an independent spelling of the same
    * semantics is exactly what the oracle should be. */
  def downtimeLogDeduped(events: DataFrame): DataFrame = {
    val prevEpoch = lag(col("START_EPOCH"), 1).over(lineWindow)
    val gap =
      (col("START_EPOCH") - lag(col("END_EPOCH"), 1).over(lineWindow)) / 60.0
    downtimeLog(events)
      .withColumn("__prev_epoch", prevEpoch)
      .filter(col("__prev_epoch").isNull ||
        col("__prev_epoch") =!= col("START_EPOCH"))
      .drop("__prev_epoch")
      .withColumn("UPTIME",
        when(gap.isNull || gap < 0, lit(0.0)).otherwise(gap))
  }

  /** F7 dynamic CO predicate surface: per-site predicate arrives as a SQL
    * string (the Spark-SQL analogue of the reference's pandas `df.query`
    * strings from SharePoint, `App/etl/transform/mes_etl.py:9-20`). */
  def coFilter(dt: DataFrame, predicateSql: String): DataFrame =
    dt.filter(expr(predicateSql))

  /** Canonical PRODUCTION_LOG model (P2,
    * `App/etl/extract/data_from_mdc.py:150-181`), instantiated over the
    * production-side event types. ProdDesc carries the `X-Y` shape the
    * brandcode-master BRANDNAME split rules expect
    * (`App/etl/extract/data_from_mdc.py:288-299`); StatFactor straddles 0
    * so the `> 0` max-filter (A5) is exercised. Mirrored in
    * [[RcoSql.prodCte]]. */
  def productionLog(events: DataFrame): DataFrame = {
    val k = regexp_extract(col("props"), "[0-9]+", 0).cast("int")
    events
      .filter(col("event_type").isin("view", "signup"))
      .withColumn("k", k)
      .select(
        col("event_id").cast("string").as("event_id"),
        col("event_id").cast("long").as("evid"),
        concat(lit("L"), col("user_id").cast("string")).as("LINE"),
        date_trunc("second", col("ts")).as("START_TIME"),
        concat(lit("B"), (col("k") % 7).cast("string")).as("BRANDCODE"),
        concat(lit("P"), (col("k") % 5).cast("string"), lit("-N"),
          (col("k") % 9).cast("string")).as("ProdDesc"),
        concat(lit("F"), (col("k") % 4).cast("string")).as("ProdFam"),
        concat(lit("G"), (col("k") % 3).cast("string")).as("ProdGroup"),
        (col("k") % 6).as("FirstPackCount"),
        (col("value") - 25.0).as("StatFactor"),
        when(col("k") % 13 === 0, "PR Out").otherwise("In Production")
          .as("LineStatus"))
  }

  /** F6: keep only In-Production rows
    * (`App/etl/extract/data_from_mdc.py:183`). */
  def productionLogPrIn(events: DataFrame): DataFrame =
    productionLog(events).filter(col("LineStatus") === "In Production")

  /** The CO predicate used by the test queries (F7/F8 stand-in). */
  val testCoPredicate = "CAUSE_LEVELS_1_NAME IN ('error','click','purchase')"
}

/** DuckDB twin of [[Rco]]: CTE snippets the oracle SQL strings compose.
  * Any change to the Spark adapter must be mirrored here.
  */
object RcoSql {

  /** dt = canonical (deduped) downtime log with UPTIME. */
  val dtCte: String =
    """WITH dt0 AS (
      SELECT CAST(event_id AS VARCHAR) AS downtime_id,
             event_id AS dtid,
             'L' || CAST(user_id AS VARCHAR) AS LINE,
             date_trunc('second', ts) AS START_TIME,
             epoch(date_trunc('second', ts)) AS START_EPOCH,
             value AS DOWNTIME,
             event_type AS CAUSE_LEVELS_1_NAME,
             CASE WHEN k % 5 = 4 THEN 'Changeover Failure'
                  ELSE 'K' || CAST(k % 5 AS VARCHAR) END AS CAUSE_LEVELS_2_NAME,
             'M' || CAST(k % 3 AS VARCHAR) AS CAUSE_LEVELS_3_NAME,
             'N' || CAST(k % 4 AS VARCHAR) AS CAUSE_LEVELS_4_NAME,
             'FLT' || CAST(k % 11 AS VARCHAR) AS Fault,
             'T' || CAST(k % 4 AS VARCHAR) AS TEAM,
             'S' || CAST(k % 3 AS VARCHAR) AS SHIFT,
             'P' || CAST(k % 5 AS VARCHAR) || '-N' ||
               CAST(k % 9 AS VARCHAR) AS ProdDesc,
             'PO' || CAST(k % 17 AS VARCHAR) AS ProcessOrder,
             CASE WHEN event_type = 'signup' THEN 'Planned Downtime'
                  ELSE 'Unplanned-' || CAST(k % 3 AS VARCHAR) END
               AS Reason1Category,
             'R2C-' || CAST(k % 3 AS VARCHAR) AS Reason2Category,
             'R3C-' || CAST(k % 5 AS VARCHAR) AS Reason3Category,
             'R4C-' || CAST(k % 7 AS VARCHAR) AS Reason4Category,
             'B' || CAST(k % 7 AS VARCHAR) AS BRANDCODE,
             'L' || CAST(user_id AS VARCHAR) || ' M' ||
               CAST(event_id % 3 AS VARCHAR) AS MACHINE,
             CASE WHEN k % 3 = 1 THEN 'c' || chr(10) || 'nl ' || k
                  WHEN k % 3 = 2 THEN 'c' || chr(13) || chr(10) || 'crlf ' || k
                  ELSE 'c ' || k END AS OPERATOR_COMMENT,
             CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END
               AS Planned_Stop_Check,
             CASE WHEN event_type = 'view' AND k % 2 = 0 THEN 1 ELSE 0 END
               AS Idle_Check,
             k % 11 = 0 AS isExcluded,
             event_type NOT IN ('view', 'signup') AS isStop,
             epoch(date_trunc('second', ts)) + value * 60 AS END_EPOCH
      FROM (SELECT *, TRY_CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k
            FROM events)),
    dt1 AS (
      SELECT *, row_number() OVER (PARTITION BY LINE, START_EPOCH
        ORDER BY dtid) AS __rn FROM dt0),
    dt AS (
      SELECT * EXCLUDE (__rn, gap),
        CASE WHEN gap IS NULL OR gap < 0 THEN 0.0 ELSE gap END AS UPTIME
      FROM (SELECT *, (START_EPOCH - lag(END_EPOCH) OVER (PARTITION BY LINE
              ORDER BY START_EPOCH, dtid)) / 60.0 AS gap
            FROM (SELECT * FROM dt1 WHERE __rn = 1)))"""
      .replaceAll("\\s+", " ")

  val coPredicate = "CAUSE_LEVELS_1_NAME IN ('error','click','purchase')"

  /** prod = canonical production log (twin of [[Rco.productionLog]]);
    * prodin = F6 In-Production filter. */
  val prodCte: String =
    """prod AS (
      SELECT CAST(event_id AS VARCHAR) AS event_id,
             event_id AS evid,
             'L' || CAST(user_id AS VARCHAR) AS LINE,
             date_trunc('second', ts) AS START_TIME,
             'B' || CAST(k % 7 AS VARCHAR) AS BRANDCODE,
             'P' || CAST(k % 5 AS VARCHAR) || '-N' || CAST(k % 9 AS VARCHAR)
               AS ProdDesc,
             'F' || CAST(k % 4 AS VARCHAR) AS ProdFam,
             'G' || CAST(k % 3 AS VARCHAR) AS ProdGroup,
             k % 6 AS FirstPackCount,
             value - 25.0 AS StatFactor,
             CASE WHEN k % 13 = 0 THEN 'PR Out' ELSE 'In Production' END
               AS LineStatus
      FROM (SELECT *, TRY_CAST(regexp_extract(props, '[0-9]+') AS INTEGER) AS k
            FROM events)
      WHERE event_type IN ('view', 'signup')),
    prodin AS (SELECT * FROM prod WHERE LineStatus = 'In Production')"""
      .replaceAll("\\s+", " ")
}
