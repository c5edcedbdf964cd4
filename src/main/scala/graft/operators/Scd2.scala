package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build from a changelog — the
  * lakehouse dimension-history shape: a stream of (key, time, attrs)
  * change records becomes one row per VERSION with a half-open
  * validity interval `[valid_from, valid_to)` and an `is_current`
  * flag, so facts can as-of join against the dimension's state at any
  * point in time ([[TemporalJoins.asofBackward]] consumes exactly this
  * shape, as does the reference's brandcode resolution — the interval
  * form is the MATERIALIZED twin of that join's state).
  *
  * Three window passes over ONE shuffle on the keys (all three windows
  * share the partitioning, so Catalyst plans a single Exchange):
  *
  *  1. instant dedup — several change records at the same (key, time)
  *     instant collapse to the one with the highest `seqCol`
  *     ("latest writer at the instant wins", the CDC convention;
  *     ties on seqCol itself are rejected nowhere — pick a unique
  *     sequence column, e.g. a log offset);
  *  2. change collapse — a record whose attributes null-safely equal
  *     the key's previous record opens no new version (a heartbeat
  *     re-stating the current value must not fragment the history);
  *  3. interval assembly — `valid_to` = next version's `valid_from`
  *     (NULL for the open current version).
  *
  * Scale shape: no joins, no driver state — one hash exchange on the
  * keys and three linear window scans per partition. A key's whole
  * history is one task's scan (the [[TemporalJoins]] ceiling); a
  * dimension key hot enough to matter here would be a data-model bug
  * (millions of versions of ONE entity), so no sliced variant exists.
  *
  * NULL contract: NULL-key records are dropped (a dimension row
  * without identity joins nothing downstream; the changelog's
  * extractor owns repairing them). NULL `time` records are dropped for
  * the same reason — an unanchored version has no place in the
  * history. Attribute NULLs are legitimate values: the change
  * comparison is null-safe (`<=>`), so NULL→NULL is "no change" and
  * NULL→x opens a version.
  */
object Scd2 {

  /** @param df      changelog with one row per change record
    * @param keys    dimension identity columns
    * @param time    change timestamp column
    * @param seqCol  unique-per-(keys, time) tiebreak column (log offset)
    * @param attrs   tracked attribute columns; any other column rides
    *                along untracked (its value is the version-opening
    *                record's)
    * @return one row per version: all input columns except `seqCol`,
    *         plus `valid_from`, `valid_to`, `is_current` */
  def fromChangelog(df: DataFrame, keys: Seq[String], time: String,
      seqCol: String, attrs: Seq[String]): DataFrame = {
    val reserved = Seq("valid_from", "valid_to", "is_current", "__rn",
      "__chg")
    val clash = df.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"scd2: column names ${clash.mkString(", ")} are reserved")
    require(attrs.nonEmpty, "scd2: at least one tracked attribute")

    val keyCols = keys.map(col)
    val wInstant = Window.partitionBy(keyCols :+ col(time): _*)
      .orderBy(col(seqCol).desc)
    val wKey = Window.partitionBy(keyCols: _*)
      .orderBy(col(time))

    val attrStruct = struct(attrs.map(col): _*)
    val deduped = df
      .filter(col(time).isNotNull && keys.map(col(_).isNotNull)
        .reduce(_ && _))
      .withColumn("__rn", row_number().over(wInstant))
      .filter(col("__rn") === 1)
    val versions = deduped
      // null-safe "did anything tracked change" vs the key's previous
      // instant. The first record of a key opens for free: its lag is
      // the NULL struct, and a non-null struct is never <=> NULL.
      .withColumn("__chg",
        !(attrStruct <=> lag(attrStruct, 1).over(wKey)))
      .filter(col("__chg"))
    versions
      .withColumn("valid_from", col(time))
      .withColumn("valid_to", lead(col(time), 1).over(wKey))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__rn", "__chg", seqCol)
  }
}
