package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-profile operator — the `ANALYZE TABLE` / data-quality-report
  * shape every ingestion pipeline runs before trusting a new drop:
  * per column, the row count, NULL count, exact distinct count, and
  * numeric min/max, emitted as one ROW PER COLUMN so the report joins
  * and diffs like data (yesterday's profile vs today's is an equi-join
  * on `col_name`).
  *
  * Shape: ONE aggregate over one scan produces a single wide row (4
  * cells per column); a literal `explode` then pivots it to the long
  * format. The multi-`count(DISTINCT)` lowers to Spark's single-
  * Expand plan — the scan is read once and expanded C+1 ways, the
  * same trade `cls_count_distinct` documents: linear in columns
  * profiled, ONE pass over the table, no self-joins. At 100 TB the
  * exact distinct is the expensive cell (it shuffles each column's
  * values once); [[approxProfile]] swaps it for the HLL sketch —
  * same report schema, one non-expanded pass, mergeable across
  * partitions — when the count needs to be cheap rather than exact.
  *
  * NULL contract: `count(col)` counts non-NULLs (so `n_nulls =
  * n_rows - count(col)`); `count(DISTINCT col)` ignores NULLs (the
  * NULL "value" is reported by `n_nulls`, not as a distinct value —
  * both engines agree); min/max ignore NULLs and are NULL on an
  * all-NULL column.
  */
object TableProfile {

  /** Exact profile of numeric `cols` (min/max emitted as double). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = true)

  /** Sketched profile: `n_distinct` is `approx_count_distinct` (HLL++,
    * default 5% rsd) — the 100 TB form. Report schema is identical so
    * dashboards/diffs don't care which produced it. */
  def approxProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileImpl(df, cols, exact = false)

  private def profileImpl(df: DataFrame, cols: Seq[String],
      exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"profile: no such column(s): ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = explode(array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__n").as("n_rows"),
      (col("__n") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").as("min_val"),
      col(s"__mx_$c").as("max_val"))): _*))
    wide.select(rows.as("p")).select(col("p.*"))
  }
}
