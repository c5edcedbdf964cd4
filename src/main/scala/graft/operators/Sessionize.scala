package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization of changeover (CO) events — the defining computation of
  * the reference pipeline (SURVEY §2.7 W1–W5, `ref/RCO_MES_ETL.R:77-147`).
  *
  * Adjacent CO-filtered downtime events on the same LINE are merged into
  * one CO session when ANY of four disjuncts holds
  * (`ref/RCO_MES_ETL.R:112-124`; gap = minutes between previous event's
  * end and this event's start):
  *   1. gap < P              and same cause trio (CO_Trigger_Column)
  *   2. gap < P*4/3          and same cause trio and same brandcode
  *   3. gap < P              and same brandcode
  *   4. gap < P/3*2          (nothing else required)
  * P is the site-level `CO_Trigger_Parameter`. The 4th factor is the
  * R-authoritative 2/3 (`ref/RCO_MES_ETL.R:122`), NOT the Python port's
  * 3/2 (`App/etl/transform/mes_etl.py:106` — documented divergence,
  * SURVEY §7.4a).
  *
  * Overrides, applied in reference order:
  *   - splitOnCause (`ref/RCO_MES_ETL.R:127-132`): force a new session
  *     whenever the cause trio differs from the previous event;
  *   - changeoverFailureNoSplit (`ref/RCO_MES_ETL.R:134-139`, the
  *     Lima-SUD rule): suppress a split when the cause trio contains
  *     "Changeover Failure" and the gap is under 120 minutes.
  *
  * Session id (`ref/RCO_MES_ETL.R:141-147`): the first event of each
  * session gets `LINE - substr(START_TIME,1,10) - substr(downtime_id,1,10)`
  * and the id is forward-filled (W5/W10).
  *
  * Spark-first formulation: ONE shuffle — everything is window functions
  * over `Window.partitionBy(LINE).orderBy(START_EPOCH, dtid)`. The
  * reference's global sort + global lag with sentinel defaults
  * (`lag(..., default=0)`) is replaced by per-LINE partitions with null
  * lag defaults: every disjunct and override requires LINE == previous
  * LINE, so null comparisons at partition edges evaluate exactly like the
  * reference's always-false sentinel comparisons, and the first event per
  * LINE always starts a new session — which also makes the forward-fill
  * safe to run per partition. This holds at any scale: no global sort, no
  * driver loop, state is one row of lag per partition stream.
  *
  * Keep in sync with [[SessionizeSql]] (the DuckDB oracle twin).
  */
object Sessionize {

  /** @param triggerParam             site CO_Trigger_Parameter, minutes
    * @param splitOnCause             Split_COs_based_on_Cause_Model=="yes"
    * @param changeoverFailureNoSplit Lima-SUD Changeover-Failure rule
    * @param pythonFactor4            compat switch for the documented
    *        R/Python fork in disjunct 4 (SURVEY §7.4a): false = the
    *        R-authoritative `P/3*2` (`ref/RCO_MES_ETL.R:122`), true =
    *        the Python port's `P*3/2`
    *        (`App/etl/transform/mes_etl.py:106`) for users migrating
    *        from the Python deployment */
  case class Params(
      triggerParam: Double = 30.0,
      splitOnCause: Boolean = false,
      changeoverFailureNoSplit: Boolean = false,
      pythonFactor4: Boolean = false)

  val w = Window.partitionBy("LINE").orderBy(col("START_EPOCH"), col("dtid"))
  private val wFill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Input: CO-filtered canonical downtime log (Rco.downtimeLogDeduped ∘
    * coFilter) with LINE/START_TIME/START_EPOCH/END_EPOCH/DOWNTIME/
    * CAUSE_LEVELS_1..3_NAME/BRANDCODE/downtime_id/dtid columns.
    * Output: input + CO_Trigger_Column, MinutesDifference, CO_Trigger,
    * CO_Identifier. */
  def apply(coLog: DataFrame, p: Params): DataFrame = {
    val pr = lit(p.triggerParam)
    val trigCol = concat_ws(" - ",
      coalesce(col("CAUSE_LEVELS_1_NAME"), lit("")),
      coalesce(col("CAUSE_LEVELS_2_NAME"), lit("")),
      coalesce(col("CAUSE_LEVELS_3_NAME"), lit("")))

    val withLag = coLog
      .withColumn("CO_Trigger_Column", trigCol)
      .withColumn("__prev_brand", lag(col("BRANDCODE"), 1).over(w))
      .withColumn("__prev_trig", lag(col("CO_Trigger_Column"), 1).over(w))
      .withColumn("MinutesDifference",
        (col("START_EPOCH") - lag(col("END_EPOCH"), 1).over(w)) / 60.0)

    val gap = col("MinutesDifference")
    val sameTrig = col("CO_Trigger_Column") === col("__prev_trig")
    val sameBrand = col("BRANDCODE") === col("__prev_brand")
    // Threshold arithmetic mirrors the reference's literal shapes
    // (P*4/3, P/3*2 resp. P*3/2) so IEEE evaluation order — hence the
    // doubles — matches the oracle.
    val factor4 = if (p.pythonFactor4) pr * 3 / 2 else pr / 3 * 2
    val sameCo =
      (gap < pr && sameTrig) ||
        (gap < pr * 4 / 3 && sameTrig && sameBrand) ||
        (gap < pr && sameBrand) ||
        (gap < factor4)

    val base = when(sameCo, 0).otherwise(1)
    val afterSplit =
      if (!p.splitOnCause) base
      else when(col("CO_Trigger_Column") =!= col("__prev_trig"), 1)
        .otherwise(base)
    val afterLima =
      if (!p.changeoverFailureNoSplit) afterSplit
      else when(afterSplit === 1 &&
          col("CO_Trigger_Column").contains("Changeover Failure") &&
          gap < 120, 0)
        .otherwise(afterSplit)

    withLag
      .withColumn("CO_Trigger", afterLima)
      .withColumn("__new_id",
        when(col("CO_Trigger") === 1,
          concat(col("LINE"), lit(" - "),
            substring(col("START_TIME").cast("string"), 1, 10), lit(" - "),
            substring(col("downtime_id"), 1, 10))))
      .withColumn("CO_Identifier",
        last(col("__new_id"), ignoreNulls = true).over(wFill))
      .drop("__prev_brand", "__prev_trig", "__new_id")
  }
}

/** DuckDB twin of [[Sessionize]] — emits the CTE chain the oracle SQL
  * strings compose. Any change to the Spark operator must be mirrored
  * here (same expression shapes, same evaluation order). */
object SessionizeSql {

  /** CTE chain `co0 … ses` over an existing `dt` CTE (RcoSql.dtCte).
    * `ses` = CO-filtered log + CO_Trigger_Column/MinutesDifference/
    * CO_Trigger/CO_Identifier. */
  def sesCte(predicate: String, p: Sessionize.Params): String = {
    val pr = p.triggerParam
    val f4 = if (p.pythonFactor4) s"$pr*3/2" else s"$pr/3*2"
    val base = s"""CASE WHEN
      (gap < $pr AND CO_Trigger_Column = prev_trig) OR
      (gap < $pr*4/3 AND CO_Trigger_Column = prev_trig
         AND BRANDCODE = prev_brand) OR
      (gap < $pr AND BRANDCODE = prev_brand) OR
      (gap < $f4)
      THEN 0 ELSE 1 END"""
    val afterSplit =
      if (!p.splitOnCause) base
      else s"CASE WHEN CO_Trigger_Column <> prev_trig THEN 1 ELSE ($base) END"
    val afterLima =
      if (!p.changeoverFailureNoSplit) afterSplit
      else s"""CASE WHEN ($afterSplit) = 1
        AND CO_Trigger_Column LIKE '%Changeover Failure%'
        AND gap < 120 THEN 0 ELSE ($afterSplit) END"""
    s"""co0 AS (SELECT * FROM dt WHERE $predicate),
    co1 AS (SELECT *,
      concat_ws(' - ', coalesce(CAUSE_LEVELS_1_NAME, ''),
        coalesce(CAUSE_LEVELS_2_NAME, ''),
        coalesce(CAUSE_LEVELS_3_NAME, '')) AS CO_Trigger_Column
      FROM co0),
    co2 AS (SELECT *,
      lag(BRANDCODE) OVER lw AS prev_brand,
      lag(CO_Trigger_Column) OVER lw AS prev_trig,
      (START_EPOCH - lag(END_EPOCH) OVER lw) / 60.0 AS gap
      FROM co1 WINDOW lw AS (PARTITION BY LINE ORDER BY START_EPOCH, dtid)),
    co3 AS (SELECT *, $afterLima AS CO_Trigger FROM co2),
    co4 AS (SELECT *, CASE WHEN CO_Trigger = 1 THEN
        LINE || ' - ' || substr(CAST(START_TIME AS VARCHAR), 1, 10)
             || ' - ' || substr(downtime_id, 1, 10) END AS new_id
      FROM co3),
    ses AS (SELECT *,
      last_value(new_id IGNORE NULLS) OVER (PARTITION BY LINE
        ORDER BY START_EPOCH, dtid
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS CO_Identifier
      FROM co4)"""
  }
}
