package graft.sources

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, max}

/** Config/schema-drift helpers and the incremental-window rule
  * (SURVEY §2.2 P4/P7, §2.10 T1).
  */
object ConfigOps {

  /** P4 (`App/rco_main.py:62-67`): strip a prefix from every column
    * name that carries it (SharePoint lists arrive as `fields.*`). */
  def stripPrefix(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.map(c =>
      if (c.startsWith(prefix)) c.substring(prefix.length) else c)
      .toSeq: _*)

  /** P7 (`App/etl/transform/machine_level.py:32-37`,
    * `ref/RCO_subETL_Gantt_Data_generator.R:14-25`): rename drifted
    * source columns to canonical names when — and only when — the
    * drifted name is present. */
  def renameIfPresent(df: DataFrame, renames: Map[String, String])
      : DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** T1 (`App/utils/time_utils.py:6-56`,
    * `ref/RCO_Overall_orchestrator.R:56-76`): analysis window =
    * [watermark − lookback(hour), now + 1 day]. The lookback depends on
    * the wall-clock hour the run starts: 03h → 7 days (weekly deep
    * re-extract), 20h → 2, 21h → 14, 22h → 7, otherwise 3. The +1 day
    * end pads timezone skew for eastern sites. */
  def lookbackDays(hourOfDay: Int): Int = hourOfDay match {
    case 3 => 7
    case 20 => 2
    case 21 => 14
    case 22 => 7
    case _ => 3
  }

  /** Concrete window for a run starting at `now` against a stored
    * watermark (max Data_Update_Time, SURVEY S7). */
  def analysisWindow(watermark: LocalDateTime, now: LocalDateTime)
      : (LocalDateTime, LocalDateTime) =
    (watermark.minusDays(lookbackDays(now.getHour).toLong),
      now.plusDays(1))

  /** S7/T1 read side of the watermark round-trip
    * (`ref/RCO_Overall_orchestrator.R:68-72`: `SELECT
    * max(Data_Update_Time) FROM Script_Data WHERE Server=...`): the
    * Data_Update_Time each load stamps into Script_Data is what the
    * NEXT incremental run anchors its extraction window on. None when
    * the table doesn't exist yet or has no rows for this server —
    * first-ever run, caller falls back to a full extract. */
  def scriptDataWatermark(spark: SparkSession, baseDir: String,
      server: String): Option[java.sql.Timestamp] = {
    val path = new org.apache.hadoop.fs.Path(s"$baseDir/Script_Data")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val stored = spark.read.parquet(path.toString)
      // A table written before the schema-parity change has no
      // Data_Update_Time column: an upgraded deployment must degrade
      // to the documented first-run full extract, not crash on the
      // aggregate's unresolved column.
      if (!stored.columns.contains("Data_Update_Time")) None
      else stored
        .filter(col("Server") === server)
        .agg(max(col("Data_Update_Time"))).collect().headOption
        .flatMap(r => Option(r.getTimestamp(0)))
    }
  }

  /** The full stored-state T1 rule: stored watermark → concrete
    * analysis window for a run starting at `now`. None on the
    * first-ever run (no stored watermark). */
  def analysisWindowFromStore(spark: SparkSession, baseDir: String,
      server: String, now: LocalDateTime)
      : Option[(LocalDateTime, LocalDateTime)] =
    scriptDataWatermark(spark, baseDir, server)
      .map(w => analysisWindow(w.toLocalDateTime, now))
}
