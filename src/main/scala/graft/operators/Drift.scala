package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a column —
  * the monitor a training pipeline runs between last week's corpus
  * and this week's (data drift), or between a training set and what
  * serving traffic looks like (population stability). Emits one row
  * per cell with both standard scores:
  *
  *  - PSI term `(p − q)·ln(p/q)` — the banking-industry population
  *    stability index, symmetric-ish and additive;
  *  - KL term `p·ln(p/q)` — forward KL(before‖after).
  *
  * Cells are Laplace-smoothed (`+0.5` per cell over the UNION of both
  * sides' value sets) so a value present on one side only contributes
  * a finite, deterministic term — no ±∞, no dropped cells, identical
  * arithmetic cross-engine (the expression is kept character-parallel
  * to the SQL twin; terms rounded to 6).
  *
  * Shape: two map-side-combined per-value counts, one full-outer
  * equi-join on the value (vocabulary-sized), one-row totals
  * broadcast — the [[LlmPrep.collocations]] cost profile. Numeric
  * columns route through [[numeric]], which buckets with the same
  * bit-exact fixed-width floor rule as the histogram gate and then
  * reuses the categorical kernel.
  *
  * Cite: generic ML-ops capability; no counterpart in the reference.
  */
object Drift {

  /** Per-value drift cells of a categorical column: `(value, n_before,
    * n_after, psi_term, kl_term)`, NULL values counted as the literal
    * "__null" cell (a missing-rate shift IS drift). */
  def categorical(before: DataFrame, after: DataFrame, c: String)
      : DataFrame = {
    val v = coalesce(col(c).cast("string"), lit("__null")).as("value")
    val nb = before.select(v).groupBy(col("value"))
      .agg(count(lit(1)).as("n"))
    val na = after.select(v).groupBy(col("value"))
      .agg(count(lit(1)).as("n"))
    fromCounts(nb, na)
  }

  /** The drift kernel over pre-aggregated per-value counts
    * `(value, n)` — the entry point for maintained/streaming counts
    * ([[graft.streaming.StreamingDrift]]) where the raw snapshots no
    * longer exist. */
  def fromCounts(beforeCounts: DataFrame, afterCounts: DataFrame)
      : DataFrame = {
    val cells = beforeCounts
      .select(col("value"), col("n").as("n_before"))
      .join(afterCounts.select(col("value"), col("n").as("n_after")),
        Seq("value"), "full_outer")
      .select(col("value"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
    val totals = cells.agg(
      sum(col("n_before")).cast("double").as("tb"),
      sum(col("n_after")).cast("double").as("ta"),
      count(lit(1)).cast("double").as("nv"))
    // keep character-parallel to the SQL twin
    val p = (col("n_before").cast("double") + lit(0.5)) /
      (col("tb") + lit(0.5) * col("nv"))
    val q = (col("n_after").cast("double") + lit(0.5)) /
      (col("ta") + lit(0.5) * col("nv"))
    cells.crossJoin(broadcast(totals))
      .select(col("value"), col("n_before"), col("n_after"),
        round((p - q) * log(p / q), 6).as("psi_term"),
        round(p * log(p / q), 6).as("kl_term"))
  }

  /** Numeric drift: fixed-width bins over `[lo, hi)` (underflow −1,
    * overflow `nbins` — range shifts land in named edge cells instead
    * of vanishing), then the categorical kernel on the bin id. */
  def numeric(before: DataFrame, after: DataFrame, c: String,
      lo: Double, hi: Double, nbins: Int): DataFrame = {
    require(nbins >= 1 && hi > lo, "drift.numeric: bad bin spec")
    val w = (hi - lo) / nbins
    def bin(df: DataFrame): DataFrame = df.select(
      when(col(c).isNull, lit(null))
        .when(col(c) < lo, lit(-1L))
        .when(col(c) >= hi, lit(nbins.toLong))
        .otherwise(floor((col(c) - lit(lo)) / lit(w)).cast("long"))
        .as(c))
    categorical(bin(before), bin(after), c)
  }
}
