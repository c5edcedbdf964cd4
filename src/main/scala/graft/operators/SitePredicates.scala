package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-site CO predicate catalog (SURVEY §2.3 F7/F8) and the
  * constraint-machine filter (F1).
  *
  * The reference hardcodes 24 per-site CO filters as R subsetting
  * expressions (`ref/RCO_MES_ETL.R:7-69`; grammar notes
  * `ref/condition_management_notes.md:34-124`) and evaluates the
  * SharePoint-configured variants with pandas `df.query` strings
  * (`App/etl/transform/mes_etl.py:9-20`). The Spark-first surface for
  * BOTH is one thing: a SQL predicate string evaluated with
  * `expr(...)` ([[graft.model.Rco.coFilter]]) — Catalyst parses,
  * optimizes and pushes it down like any built-in filter, which
  * subsumes the pandas-query grammar.
  *
  * Each catalog entry re-expresses one reference site's rule shape over
  * the canonical column model (equality, contains, case-variant
  * contains, negation, null-guard, multi-column disjunction — every
  * construct in the R catalog appears at least once). Sites whose rules
  * hinge on columns outside the canonical model (LINE_SUBSTATE,
  * Reason*Category) are expressed over their canonical stand-ins.
  */
object SitePredicates {

  /** site name → SQL predicate over the canonical downtime log. */
  val catalog: Map[String, String] = Map(
    // equality + contains disjunction (`ref/RCO_MES_ETL.R:36-38`)
    "StLouis Maple" ->
      """CAUSE_LEVELS_1_NAME = 'error' AND
         (contains(CAUSE_LEVELS_2_NAME, 'Changeover')
          OR contains(CAUSE_LEVELS_2_NAME, 'K1'))""",
    // single contains (`ref/RCO_MES_ETL.R:34-35`)
    "StLouis Proficy" -> "contains(CAUSE_LEVELS_2_NAME, 'Changeover')",
    // conjunction of equality + contains (`ref/RCO_MES_ETL.R:39-40`)
    "Takasaki SUD" ->
      "CAUSE_LEVELS_1_NAME = 'error' AND contains(CAUSE_LEVELS_2_NAME, 'K')",
    // negated contains (`ref/RCO_MES_ETL.R:47-50`)
    "Gebze DL" ->
      """contains(CAUSE_LEVELS_2_NAME, 'K')
         AND contains(CAUSE_LEVELS_1_NAME, 'click')
         AND NOT contains(CAUSE_LEVELS_2_NAME, 'K3')""",
    // case-variant contains (`ref/RCO_MES_ETL.R:31-33`)
    "Tabler HDW" ->
      """contains(CAUSE_LEVELS_1_NAME, 'error')
         AND (contains(CAUSE_LEVELS_3_NAME, 'M1')
              OR contains(lower(CAUSE_LEVELS_3_NAME), 'm2'))""",
    // multi-level disjunction (`ref/RCO_MES_ETL.R:51-53`)
    "Cabuyao" ->
      """contains(CAUSE_LEVELS_2_NAME, 'Changeover')
         OR contains(CAUSE_LEVELS_3_NAME, 'M0')""",
    // null-guard (`ref/RCO_MES_ETL.R:22-24`)
    "Alex SUD" ->
      """CAUSE_LEVELS_1_NAME = 'purchase'
         AND (CAUSE_LEVELS_2_NAME = 'K2'
              OR contains(CAUSE_LEVELS_2_NAME, 'K4'))
         AND CAUSE_LEVELS_1_NAME IS NOT NULL""",
    // IN-list + equality (`ref/RCO_MES_ETL.R:12-16` shape)
    "Rakona LIQ" ->
      """CAUSE_LEVELS_1_NAME IN ('error', 'click')
         AND contains(CAUSE_LEVELS_2_NAME, 'K')
         AND NOT contains(CAUSE_LEVELS_3_NAME, 'M2')""")

  /** F1 (`App/etl/extract/data_from_mdc.py:62-69,89`): keep events of
    * the configured constraint machines, where the config ships machine
    * SUFFIXES and the full machine name is LINE + ' ' + suffix. The
    * suffix list is per-deployment config (small) → broadcast isin. */
  def constraintFilter(dt: DataFrame, machineSuffixes: Seq[String])
      : DataFrame =
    if (machineSuffixes.isEmpty) dt.filter(lit(false))
    else dt.filter(
      machineSuffixes
        .map(sfx => col("MACHINE") === concat(col("LINE"), lit(" " + sfx)))
        .reduce(_ || _))
}
