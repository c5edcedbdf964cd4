package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CO aggregation (SURVEY §2.6 A1/A7, §2.5 J1; `ref/RCO_MES_ETL.R:150-170`,
  * `App/etl/transform/mes_etl.py:133-152,225-230`).
  *
  * Per (CO_Identifier, LINE): session start/end, summed downtime, the
  * downtime_id of the first and last event, and the multi-constraint
  * proration divisor (distinct machines active in the CO).
  *
  * Spark-first notes:
  *  - The reference materializes a row index, aggregates min/max(index),
  *    then self-joins TWICE to recover the first/last event ids
  *    (`ref/RCO_MES_ETL.R:161-170`). Here `min_by/max_by(downtime_id,
  *    START_EPOCH)` fold both lookups into the same single-shuffle
  *    aggregate — no index, no joins. START_EPOCH is unique within a
  *    session (D1 dedup guarantees unique (LINE, START_EPOCH) and a
  *    session never spans lines), so no tie-break is needed.
  *  - Proration (`App/etl/transform/mes_etl.py:225-230`) is a
  *    count(DISTINCT MACHINE) in the same aggregate instead of the
  *    reference's two-level groupby + merge.
  *  - CO_EndTime is carried as END_EPOCH (double, exact IEEE — see
  *    Rco scaladoc) rather than a fractional-second timestamp.
  *
  * Keep in sync with [[CoAggregateSql]].
  */
object CoAggregate {

  /** Input: [[Sessionize]] output. One row per (CO_Identifier, LINE). */
  def apply(ses: DataFrame): DataFrame =
    ses.groupBy(col("CO_Identifier"), col("LINE"))
      .agg(
        min(col("START_TIME")).as("CO_StartTime"),
        min(col("START_EPOCH")).as("CO_Start_EPOCH"),
        max(col("END_EPOCH")).as("CO_End_EPOCH"),
        round(sum(col("DOWNTIME")), 4).as("CO_DOWNTIME"),
        min_by(col("downtime_id"), col("START_EPOCH"))
          .as("downtime_id_of_First_CO_Event"),
        max_by(col("downtime_id"), col("START_EPOCH"))
          .as("downtime_id_of_Last_CO_Event"),
        count(lit(1)).as("n_events"),
        // UPTIME of the session's first event — consumed by
        // FirstStopAfterCo's uptime-till-next-CO totals
        // (`ref/RCO_subETL_First_Stop_after_CO.R:75-79`).
        min_by(col("UPTIME"), col("START_EPOCH")).as("first_ev_UPTIME"),
        countDistinct(col("MACHINE")).as("Number_of_Machines"),
        round(sum(col("DOWNTIME")) / countDistinct(col("MACHINE")), 4)
          .as("CO_DOWNTIME_prorated"))
}

/** DuckDB twin of [[CoAggregate]]. */
object CoAggregateSql {

  /** `agg` CTE over an existing `ses` CTE ([[SessionizeSql.sesCte]]). */
  val aggCte: String =
    """agg AS (SELECT CO_Identifier, LINE,
      min(START_TIME) AS CO_StartTime,
      min(START_EPOCH) AS CO_Start_EPOCH,
      max(END_EPOCH) AS CO_End_EPOCH,
      round(sum(DOWNTIME), 4) AS CO_DOWNTIME,
      arg_min(downtime_id, START_EPOCH) AS downtime_id_of_First_CO_Event,
      arg_max(downtime_id, START_EPOCH) AS downtime_id_of_Last_CO_Event,
      count(*) AS n_events,
      arg_min(UPTIME, START_EPOCH) AS first_ev_UPTIME,
      count(DISTINCT MACHINE) AS Number_of_Machines,
      round(sum(DOWNTIME) / count(DISTINCT MACHINE), 4)
        AS CO_DOWNTIME_prorated
      FROM ses GROUP BY CO_Identifier, LINE)"""
}
