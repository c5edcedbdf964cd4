package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Rco, RcoSql}
import graft.sources.Tables

/** RCO analytical-core queries + their DuckDB oracles, wired over the
  * driver's `events` table via the [[graft.model.Rco]] adapter. Each query
  * name maps 1:1 to a SURVEY §2 operator cluster; the oracle SQL is built
  * from the paired *Sql twins so Spark/DuckDB stay in lockstep.
  */
object RcoQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Site parameter used by every test query (CO_Trigger_Parameter=120
    * min picked so sf0.01 yields ~15% merged events, overlap-negative
    * gaps included — see TESTDATA stats in the round notes). */
  val P = Sessionize.Params(triggerParam = 120.0)
  val Psplit = Sessionize.Params(triggerParam = 120.0, splitOnCause = true,
    changeoverFailureNoSplit = true)

  private def coLog(s: SparkSession, dir: String): DataFrame =
    Rco.coFilter(Rco.downtimeLogDeduped(Tables.events(s, dir)),
      Rco.testCoPredicate)

  private val sesCols = Seq("CO_Identifier", "LINE", "downtime_id",
    "START_TIME", "DOWNTIME", "UPTIME", "BRANDCODE", "CO_Trigger_Column",
    "CO_Trigger", "MinutesDifference")

  def sessionize(params: Sessionize.Params): Q = (s, dir) =>
    Sessionize(coLog(s, dir), params)
      .select(sesCols.map(col): _*)

  private def sessionizeOracle(params: Sessionize.Params): String =
    s"""${RcoSql.dtCte},
    ${SessionizeSql.sesCte(RcoSql.coPredicate, params)}
    SELECT CO_Identifier, LINE, downtime_id, START_TIME, DOWNTIME, UPTIME,
           BRANDCODE, CO_Trigger_Column, CO_Trigger,
           gap AS MinutesDifference
    FROM ses"""

  def coAgg: Q = (s, dir) => CoAggregate(Sessionize(coLog(s, dir), P))

  private val coAggOracle: String =
    s"""${RcoSql.dtCte},
    ${SessionizeSql.sesCte(RcoSql.coPredicate, P)},
    ${CoAggregateSql.aggCte}
    SELECT CO_Identifier, LINE, CO_StartTime, CO_Start_EPOCH, CO_End_EPOCH,
           CO_DOWNTIME, downtime_id_of_First_CO_Event,
           downtime_id_of_Last_CO_Event, n_events, Number_of_Machines,
           CO_DOWNTIME_prorated
    FROM agg"""

  def brandcode: Q = (s, dir) => {
    val full = Rco.downtimeLogDeduped(Tables.events(s, dir))
    BrandcodeResolve(
      CoAggregate(Sessionize(Rco.coFilter(full, Rco.testCoPredicate), P)),
      full)
  }

  private val brandcodeOracle: String =
    s"""${RcoSql.dtCte},
    ${SessionizeSql.sesCte(RcoSql.coPredicate, P)},
    ${CoAggregateSql.aggCte},
    ${BrandcodeResolveSql.bcCte}
    SELECT CO_Identifier, LINE, CO_StartTime, Current_BRANDCODE,
           Next_BRANDCODE,
           CASE WHEN Current_BRANDCODE = Next_BRANDCODE THEN 'Not Changed'
                ELSE 'OK' END AS Brandcode_Status
    FROM bc"""

  val queries: Map[String, Q] = Map(
    "rco_sessionize" -> sessionize(P),
    "rco_sessionize_split" -> sessionize(Psplit),
    "rco_co_agg" -> coAgg,
    "rco_brandcode" -> brandcode)

  val oracles: Map[String, String] = Map(
    "rco_sessionize" -> sessionizeOracle(P),
    "rco_sessionize_split" -> sessionizeOracle(Psplit),
    "rco_co_agg" -> coAggOracle,
    "rco_brandcode" -> brandcodeOracle)
}
