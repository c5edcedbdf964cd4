package graft.operators

/** DuckDB twin of [[GanttGenerate]] — same kernel (ranked stops →
  * prefix-scan own_time/last_prev → UNION-ALL point emission → clamp →
  * closing pair → W11 correction), expressed as generated CTE chains
  * over the `dt` / `ses` / `agg` CTEs. */
object GanttGenerateSql {

  import GanttGenerate.{MinutesAfter, MinutesBefore}

  /** Constraint log: constraint machines of each line + J6 CO-event
    * flag from the session log. Generated from the same suffix list as
    * the Spark side ([[GanttGenerate.constraintLog]]) with the same
    * LINE-prefix equality — a LIKE '% M0' would also match a machine
    * with that suffix belonging to a different line. */
  def consCte(suffixes: Seq[String] = Seq("M0")): String = {
    val pred = suffixes
      .map(sfx => s"d.MACHINE = d.LINE || ' $sfx'").mkString(" OR ")
    s"""cons AS (SELECT d.*, CASE WHEN s.downtime_id IS NOT NULL
          THEN 1 ELSE 0 END AS CO_Event
      FROM dt d LEFT JOIN (SELECT DISTINCT LINE, downtime_id FROM ses) s
        USING (LINE, downtime_id)
      WHERE $pred)"""
  }

  val constraintStatusSql: String =
    """CASE WHEN CO_Event = 1 THEN 1.0
       WHEN Planned_Stop_Check = 1 THEN 1.7
       WHEN Idle_Check = 0 THEN 2.3 ELSE 4.0 END"""

  /** CO Gantt windows + range-join assignment of `stops` ([[tag]]ged). */
  private def asgCte(tag: String, stopsCte: String): String =
    s"""asg_$tag AS (SELECT d.*, c.CO_Identifier, c.min_t, c.max_t
      FROM $stopsCte d JOIN (SELECT CO_Identifier, LINE,
          CO_Start_EPOCH - ${MinutesBefore * 60} AS min_t,
          CO_End_EPOCH + ${MinutesAfter * 60} AS max_t FROM agg) c
        USING (LINE)
      WHERE d.END_EPOCH > c.min_t AND d.START_EPOCH < c.max_t)"""

  /** Point-emission kernel for one pass: produces `all_$tag`
    * (CO_Identifier, LINE, MACHINE, max_t, t, s, pk, seq). */
  def kernelCtes(tag: String, stopsCte: String, statusExpr: String)
      : String = {
    val head = "CO_Identifier, LINE, MACHINE, max_t"
    s"""${asgCte(tag, stopsCte)},
    rk1_$tag AS (SELECT *, $statusExpr AS st,
      row_number() OVER w AS rn,
      DOWNTIME * 60 AS dt_sec, UPTIME * 60 AS up_sec,
      START_EPOCH - UPTIME * 60 AS prev_up_end
      FROM asg_$tag WINDOW w AS (PARTITION BY CO_Identifier, MACHINE
        ORDER BY START_EPOCH, dtid)),
    rk2_$tag AS (SELECT *,
      (rn = 1 AND min_t < START_EPOCH AND min_t > prev_up_end) AS case_a
      FROM rk1_$tag),
    rk3_$tag AS (SELECT *,
      CASE WHEN rn = 1 THEN
        (CASE WHEN dt_sec > 1 THEN END_EPOCH
              WHEN case_a THEN START_EPOCH ELSE min_t END)
      ELSE
        (CASE WHEN dt_sec > 1 THEN END_EPOCH
              WHEN up_sec >= 2 THEN START_EPOCH - 1 END) END AS own_time
      FROM rk2_$tag),
    rk4_$tag AS (SELECT *,
      last_value(own_time IGNORE NULLS) OVER (
        PARTITION BY CO_Identifier, MACHINE ORDER BY START_EPOCH, dtid
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_prev
      FROM rk3_$tag),
    pts_$tag AS (
      SELECT $head, min_t AS t,
        CASE WHEN case_a THEN 3.0 ELSE st END AS s,
        downtime_id AS pk, CAST(10 AS BIGINT) AS seq
      FROM rk4_$tag WHERE rn = 1
      UNION ALL SELECT $head, START_EPOCH - 1, 3.0, downtime_id, 11
      FROM rk4_$tag WHERE case_a
      UNION ALL SELECT $head, START_EPOCH, st, downtime_id, 12
      FROM rk4_$tag WHERE case_a
      UNION ALL SELECT $head, END_EPOCH, st, downtime_id, 13
      FROM rk4_$tag WHERE rn = 1 AND dt_sec > 1
      UNION ALL SELECT $head, last_prev + 1, 3.0, downtime_id, rn * 10
      FROM rk4_$tag WHERE rn > 1 AND up_sec >= 2
      UNION ALL SELECT $head, START_EPOCH - 1, 3.0, downtime_id, rn * 10 + 1
      FROM rk4_$tag WHERE rn > 1 AND up_sec >= 2
      UNION ALL SELECT $head, START_EPOCH, st, downtime_id, rn * 10 + 2
      FROM rk4_$tag WHERE rn > 1 AND dt_sec > 1
      UNION ALL SELECT $head, END_EPOCH, st, downtime_id, rn * 10 + 3
      FROM rk4_$tag WHERE rn > 1 AND dt_sec > 1),
    grp_$tag AS (SELECT $head, max(rn) AS max_rn,
      arg_max(own_time, rn) FILTER (WHERE own_time IS NOT NULL)
        AS last_final
      FROM rk4_$tag GROUP BY CO_Identifier, LINE, MACHINE, max_t),
    clamp_$tag AS (SELECT $head,
      CASE WHEN seq = max(seq) OVER (PARTITION BY CO_Identifier, MACHINE)
             AND t > max_t THEN max_t ELSE t END AS t,
      s, pk, seq
      FROM pts_$tag),
    close_$tag AS (
      SELECT $head, last_final + 1 AS t, 3.0 AS s, '' AS pk,
        CAST((max_rn + 1) * 10 AS BIGINT) AS seq
      FROM grp_$tag WHERE last_final <= max_t
      UNION ALL SELECT $head, max_t, 3.0, '',
        CAST((max_rn + 1) * 10 + 1 AS BIGINT)
      FROM grp_$tag WHERE last_final <= max_t),
    all_$tag AS (SELECT $head, t, s, pk, seq FROM clamp_$tag
      UNION ALL SELECT $head, t, s, pk, seq FROM close_$tag)"""
  }

  /** Gantt_Data: both passes + G3 anti-removal + W11 correction. */
  val ganttSql: String =
    s"""${consCte()},
    ${kernelCtes("n", "dt", "2.0")},
    ${kernelCtes("c", "cons", constraintStatusSql)},
    consmach AS (SELECT DISTINCT LINE, MACHINE FROM cons),
    gantt0 AS (
      SELECT a.CO_Identifier, a.LINE, a.MACHINE, a.t, coalesce(a.s, 2.3)
        AS s, a.pk, a.seq
      FROM all_n a ANTI JOIN consmach USING (LINE, MACHINE)
      UNION ALL SELECT CO_Identifier, LINE, MACHINE, t,
        coalesce(s, 2.3), pk, seq FROM all_c),
    gantt1 AS (SELECT *,
      lead(t) OVER w AS lead_t, lead(s) OVER w AS lead_s,
      lag(t) OVER w AS lag_t
      FROM gantt0 WINDOW w AS (PARTITION BY CO_Identifier, MACHINE
        ORDER BY seq)),
    gantt AS (SELECT CO_Identifier, LINE AS Line, MACHINE AS Machine, seq,
      CASE WHEN lead_t IS NOT NULL AND lag_t IS NOT NULL AND t >= lead_t
             AND s <> lead_s AND t > lag_t + 1 THEN t - 1 ELSE t END
        AS StartTime,
      s AS Downtime_Status, pk AS downtime_id
      FROM gantt1)"""

  /** Event_Log_for_Gantt. */
  val eventLogSql: String = {
    val cols = """START_TIME, round(DOWNTIME * 60 / 60, 2) AS DOWNTIME,
      round(UPTIME * 60 / 60, 2) AS UPTIME, Fault, CAUSE_LEVELS_1_NAME,
      CAUSE_LEVELS_2_NAME, CAUSE_LEVELS_3_NAME, CAUSE_LEVELS_4_NAME,
      BRANDCODE, OPERATOR_COMMENT, LINE, MACHINE,
      downtime_id, CO_Identifier"""
    s"""${consCte()},
    ${asgCte("en", "dt")},
    ${asgCte("ec", "cons")},
    consmach AS (SELECT DISTINCT LINE, MACHINE FROM cons),
    ev AS (
      SELECT $cols FROM
        (SELECT a.* FROM asg_en a ANTI JOIN consmach USING (LINE, MACHINE))
      UNION ALL SELECT $cols FROM asg_ec)"""
  }
}
