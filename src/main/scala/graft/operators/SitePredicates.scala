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
  * The catalog carries ALL 24 server branches of the R dispatch, each
  * re-expressing that site's rule shape over the canonical column model
  * (equality, contains, case-variant contains, negation, null-guard,
  * multi-column disjunction, IN-lists, shared branches). Sites whose
  * rules hinge on columns outside the canonical model (LINE_SUBSTATE,
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
         AND NOT contains(CAUSE_LEVELS_3_NAME, 'M2')""",
    // 3-way substate disjunction × equality × (equality|contains)
    // (`ref/RCO_MES_ETL.R:7-11`)
    "Lima SUD" ->
      """(contains(CAUSE_LEVELS_3_NAME, 'M0')
          OR contains(CAUSE_LEVELS_3_NAME, 'M2')
          OR contains(CAUSE_LEVELS_2_NAME, 'Changeover'))
         AND CAUSE_LEVELS_1_NAME = 'error'
         AND (CAUSE_LEVELS_2_NAME = 'K1'
              OR contains(CAUSE_LEVELS_2_NAME, 'K3'))""",
    // substate disjunction × bare equality (`ref/RCO_MES_ETL.R:17-19`)
    "Rakona DL" ->
      """(contains(CAUSE_LEVELS_3_NAME, 'M1')
          OR contains(CAUSE_LEVELS_3_NAME, 'M2'))
         AND CAUSE_LEVELS_2_NAME = 'K2'""",
    // equality × (equality|contains) (`ref/RCO_MES_ETL.R:20-21`)
    "Amiens SUD" ->
      """CAUSE_LEVELS_1_NAME = 'purchase'
         AND (CAUSE_LEVELS_2_NAME = 'K0'
              OR contains(CAUSE_LEVELS_2_NAME, 'K'))""",
    // shares the Alex SUD branch verbatim (`ref/RCO_MES_ETL.R:22`)
    "Alex SUD Proficy" ->
      """CAUSE_LEVELS_1_NAME = 'purchase'
         AND (CAUSE_LEVELS_2_NAME = 'K2'
              OR contains(CAUSE_LEVELS_2_NAME, 'K4'))
         AND CAUSE_LEVELS_1_NAME IS NOT NULL""",
    // server-name prefix group: (equality|contains) × contains × contains
    // (`ref/RCO_MES_ETL.R:25-28`)
    "Amiens FE" ->
      """(CAUSE_LEVELS_3_NAME = 'M0'
          OR contains(CAUSE_LEVELS_3_NAME, 'M'))
         AND contains(CAUSE_LEVELS_1_NAME, 'err')
         AND contains(CAUSE_LEVELS_2_NAME, 'K1')""",
    // contains × contains × negated contains on aux reason columns
    // (`ref/RCO_MES_ETL.R:29-30`)
    "Novo" ->
      """contains(CAUSE_LEVELS_3_NAME, 'M')
         AND contains(CAUSE_LEVELS_2_NAME, 'K')
         AND NOT contains(CAUSE_LEVELS_3_NAME, 'M2')""",
    // equality × contains (`ref/RCO_MES_ETL.R:41-42`)
    "Gattatico" ->
      """CAUSE_LEVELS_1_NAME = 'click'
         AND contains(CAUSE_LEVELS_2_NAME, 'Changeover')""",
    // equality × leading-space contains (`ref/RCO_MES_ETL.R:43-44`)
    "London HDW" ->
      """CAUSE_LEVELS_1_NAME = 'error'
         AND contains(CAUSE_LEVELS_2_NAME, 'Failure')""",
    // 2-way equality disjunction × contains (`ref/RCO_MES_ETL.R:45-46`)
    "Gebze HDW" ->
      """(CAUSE_LEVELS_2_NAME = 'K0' OR CAUSE_LEVELS_2_NAME = 'K1')
         AND contains(CAUSE_LEVELS_1_NAME, 'pur')""",
    // equality-or-contains on one column (`ref/RCO_MES_ETL.R:54-55`)
    "Lima LIQ" ->
      """CAUSE_LEVELS_1_NAME = 'view'
         OR contains(CAUSE_LEVELS_1_NAME, 'click')""",
    // single contains on level 3 (`ref/RCO_MES_ETL.R:56-57`)
    "Chengdu" -> "contains(CAUSE_LEVELS_3_NAME, 'M1')",
    // (equality AND equality) OR equality (`ref/RCO_MES_ETL.R:58-60`)
    "Binh Duong" ->
      """(CAUSE_LEVELS_1_NAME = 'error' AND CAUSE_LEVELS_2_NAME = 'K1')
         OR CAUSE_LEVELS_1_NAME = 'purchase'""",
    // 3-way code contains (`ref/RCO_MES_ETL.R:61-62`)
    "Gebze BabyCare" ->
      """contains(CAUSE_LEVELS_2_NAME, 'K0')
         OR contains(CAUSE_LEVELS_2_NAME, 'K1')
         OR contains(CAUSE_LEVELS_2_NAME, 'K2')""",
    // aux-category equality × upper-cased contains
    // (`ref/RCO_MES_ETL.R:63-64`)
    "Gebze FemCare" ->
      """CAUSE_LEVELS_1_NAME = 'signup'
         AND contains(upper(CAUSE_LEVELS_2_NAME), 'CHANGEOVER')""",
    // single contains on level 1 (`ref/RCO_MES_ETL.R:65-66`)
    "Alexandria HDL" -> "contains(CAUSE_LEVELS_1_NAME, 'chase')",
    // equality × contains (`ref/RCO_MES_ETL.R:67-69`)
    "Alexandria DL" ->
      """CAUSE_LEVELS_1_NAME = 'click'
         AND contains(CAUSE_LEVELS_2_NAME, 'K2')""")

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
