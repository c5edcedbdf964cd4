package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Production-side aggregates: runtime-per-day, day-start detection and
  * the brandcode master table (SURVEY §2.6 A3–A6, §2.4 D2, §2.5 J2;
  * `App/etl/extract/data_from_mdc.py:191-302`,
  * `ref/RCO_ProficyiODS_orchestrator.R:220-332`).
  *
  * Keep in sync with [[ProdOpsSql]].
  */
object ProdOps {

  /** A3: per (day, line) summed uptime + the MSU proxy summed downtime.
    * The reference extracts the log twice and merges two single-agg
    * frames (`data_from_mdc.py:237-249`); one grouped aggregate produces
    * the identical result with one shuffle.
    * @param clampDay     F11: cap runtime at 1440 min/day
    *                     (`ref/RCO_Maple_orchestrator.R:184`)
    * @param dropFirstDay F11: drop each line's first (partial) date
    *                     (`ref/RCO_Maple_orchestrator.R:179-183`) */
  def runtimePerDay(fullDtLog: DataFrame, clampDay: Boolean = false,
      dropFirstDay: Boolean = false): DataFrame = {
    val agg = fullDtLog
      .groupBy(to_date(col("START_TIME")).as("Date"), col("LINE"))
      .agg(round(sum(col("UPTIME")), 4).as("Runtime"),
        round(sum(col("DOWNTIME")), 4).as("Production_MSU"))
    val clamped =
      if (!clampDay) agg
      else agg.withColumn("Runtime", least(col("Runtime"), lit(1440.0)))
    if (!dropFirstDay) clamped
    else clamped
      .withColumn("__min_date",
        min(col("Date")).over(Window.partitionBy("LINE")))
      .filter(col("Date") > col("__min_date"))
      .drop("__min_date")
  }

  /** Adaptive decimal reduction
    * (`ref/RCO_Overall_orchestrator.R:119-131`): round each listed
    * double column to 1–5 places chosen from its mean |magnitude| —
    * big-valued columns get coarse rounding. Thresholds and the
    * NA/Inf-excluding mean match the reference's reducer exactly
    * (`<0.1→5, <1→4, <10→3, <100→2, else→1`; an all-NA column means 0
    * → 5 places). The magnitude probe is one driver-side aggregate
    * over all columns (not a per-column pass). */
  def roundAdaptive(df: DataFrame, cols: Seq[String]): DataFrame = {
    val magnitudes = df
      .select(cols.map { c =>
        avg(when(!isnan(col(c)) &&
          abs(col(c)) =!= Double.PositiveInfinity, abs(col(c)))).as(c)
      }: _*)
      .collect().headOption
    // one withColumns call: a per-column withColumn fold re-analyzes the
    // (often deep) plan once per column — O(cols × plan) driver time
    val rounded = cols.zipWithIndex.map { case (c, i) =>
      val mean = magnitudes.map(r =>
        if (r.isNullAt(i)) 0.0 else r.getDouble(i)).getOrElse(0.0)
      val places =
        if (mean < 0.1) 5
        else if (mean < 1) 4
        else if (mean < 10) 3
        else if (mean < 100) 2
        else 1
      c -> round(col(c), places)
    }.toMap
    if (rounded.isEmpty) df else df.withColumns(rounded)
  }

  /** [[roundAdaptive]] over every double column — the reference's
    * reducer walks all numeric columns of the frame it is given. */
  def roundAdaptiveAll(df: DataFrame): DataFrame =
    roundAdaptive(df, df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.DoubleType)
      .map(_.name).toSeq)

  /** A6 + F12: detect each line's production-day start hour — the modal
    * (majority-filtered) first-event hour-of-day.
    * @param takeMax Gebze-HDW variant takes max instead of min
    *                (`data_from_mdc.py:259-262`). */
  def dayStart(fullDtLog: DataFrame, takeMax: Boolean = false): DataFrame = {
    val wLine = Window.partitionBy("LINE")
    val firstPerDay = fullDtLog
      .groupBy(to_date(col("START_TIME")).as("Date"), col("LINE"))
      .agg(min(col("START_TIME")).as("first_start"))
      .withColumn("Shift_Start_hours",
        (unix_timestamp(col("first_start")) -
          unix_timestamp(col("Date").cast("timestamp"))) / 3600.0)
    val tallies = firstPerDay
      .groupBy(col("LINE"), col("Shift_Start_hours"))
      .agg(count(lit(1)).as("tally"))
      .withColumn("max_tally", max(col("tally")).over(wLine))
      .filter(col("tally") > col("max_tally") / 2)
    val pick = if (takeMax) max(col("Shift_Start_hours"))
      else min(col("Shift_Start_hours"))
    tallies.groupBy(col("LINE")).agg(pick.as("Day_Start_hours"))
  }

  /** A4 + D2 + A5 + J2 + the BRANDNAME split rules: brandcode master
    * rebuilt from the production log.
    *
    * D2's keep-most-frequent is input-order-dependent in the reference
    * (`drop_duplicates` after a tally-only sort, SURVEY §7.4) — here the
    * pick is totally ordered: tally desc, then the attribute tuple. The
    * reference's global `len(unique(B)) > 2` switch becomes a broadcast
    * scalar cross-join. */
  def brandcodeMaster(prodIn: DataFrame): DataFrame = {
    val wBrand = Window.partitionBy(col("BRANDCODE"))
      .orderBy(col("tally").desc, col("ProdDesc"), col("ProdFam"),
        col("ProdGroup"), col("FirstPackCount"))
    val top = prodIn
      .groupBy(col("BRANDCODE"), col("ProdDesc"), col("ProdFam"),
        col("ProdGroup"), col("FirstPackCount"))
      .agg(count(col("StatFactor")).as("tally"))
      .withColumn("__rn", row_number().over(wBrand))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val maxStat = prodIn.filter(col("StatFactor") > 0)
      .groupBy(col("BRANDCODE"))
      .agg(round(max(col("StatFactor")), 4).as("StatFactor"))

    val named = top
      .join(maxStat, Seq("BRANDCODE"), "left")
      .withColumn("__pd", regexp_replace(col("ProdDesc"), "-", ":"))
      .withColumn("__a", split(col("__pd"), ":").getItem(0))
      .withColumn("__b", coalesce(split(col("__pd"), ":").getItem(1),
        col("__a")))
    val nDistinctB = named.agg(countDistinct(col("__b")).as("__nb"))
    named.crossJoin(broadcast(nDistinctB))
      .withColumn("BRANDNAME",
        when(col("__nb") > 2, col("__b")).otherwise(col("__pd")))
      .select(col("BRANDCODE"), col("BRANDNAME"), col("ProdFam"),
        col("ProdGroup"), col("FirstPackCount").as("UNITS_PER_CASE"),
        col("StatFactor"), col("tally"))
  }
}

/** DuckDB twin of [[ProdOps]], over the `dt` / `prodin` CTEs. */
object ProdOpsSql {

  val runtimePerDaySql: String =
    """SELECT CAST(START_TIME AS DATE) AS Date, LINE,
      round(sum(UPTIME), 4) AS Runtime,
      round(sum(DOWNTIME), 4) AS Production_MSU
    FROM dt GROUP BY 1, 2"""

  def dayStartSql(takeMax: Boolean = false): String = {
    val pick = if (takeMax) "max" else "min"
    s"""fpd AS (
      SELECT CAST(START_TIME AS DATE) AS Date, LINE,
        min(START_TIME) AS first_start
      FROM dt GROUP BY 1, 2),
    hrs AS (SELECT LINE,
      (epoch(first_start) - epoch(CAST(Date AS TIMESTAMP))) / 3600.0
        AS Shift_Start_hours
      FROM fpd),
    tly AS (SELECT LINE, Shift_Start_hours, count(*) AS tally
      FROM hrs GROUP BY 1, 2),
    mj AS (SELECT * FROM (SELECT *,
        max(tally) OVER (PARTITION BY LINE) AS max_tally FROM tly)
      WHERE tally > max_tally / 2)
    SELECT LINE, $pick(Shift_Start_hours) AS Day_Start_hours
    FROM mj GROUP BY LINE"""
  }

  val brandcodeMasterSql: String =
    """top AS (SELECT * FROM (
      SELECT BRANDCODE, ProdDesc, ProdFam, ProdGroup, FirstPackCount,
        count(StatFactor) AS tally,
        row_number() OVER (PARTITION BY BRANDCODE
          ORDER BY count(StatFactor) DESC, ProdDesc, ProdFam, ProdGroup,
            FirstPackCount) AS rn
      FROM prodin
      GROUP BY BRANDCODE, ProdDesc, ProdFam, ProdGroup, FirstPackCount)
      WHERE rn = 1),
    mx AS (SELECT BRANDCODE, round(max(StatFactor), 4) AS StatFactor
      FROM prodin WHERE StatFactor > 0 GROUP BY BRANDCODE),
    named AS (SELECT t.*, mx.StatFactor,
        replace(t.ProdDesc, '-', ':') AS pd,
        string_split(replace(t.ProdDesc, '-', ':'), ':')[1] AS a,
        coalesce(string_split(replace(t.ProdDesc, '-', ':'), ':')[2],
          string_split(replace(t.ProdDesc, '-', ':'), ':')[1]) AS b
      FROM top t LEFT JOIN mx USING (BRANDCODE)),
    bm AS (SELECT BRANDCODE,
      CASE WHEN (SELECT count(DISTINCT b) FROM named) > 2
           THEN b ELSE pd END AS BRANDNAME,
      ProdFam, ProdGroup, FirstPackCount AS UNITS_PER_CASE, StatFactor,
      tally
      FROM named)"""
}
