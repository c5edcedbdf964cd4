package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation / change-data-capture derivation: given two
  * snapshots of the same keyed table, emit the changelog that turns
  * `before` into `after` — one row per changed key with an op code and
  * the exact columns that moved. The inverse of [[Scd2]] (which
  * ASSEMBLES history from a changelog, this EXTRACTS a changelog from
  * two states), and the audit primitive behind "did yesterday's load
  * drift?" reconciliation runs.
  *
  * Shape: one full-outer equi-join on the key — the only scale-correct
  * plan for diffing two tables too big to broadcast: both sides
  * shuffle once on the key, per-row comparison is a codegen'd
  * null-safe predicate, and unchanged rows (the overwhelming majority
  * between adjacent snapshots) are dropped BEFORE any further stage,
  * so the output is change-sized, not table-sized. Column-level
  * attribution is computed inline (no second pass): `changed_cols`
  * concatenates per-column `CASE WHEN a.x IS DISTINCT FROM b.x` arrays
  * in the caller's declared column order.
  *
  * Semantics:
  *  - key only in `after`  → op `I` (insert), changed_cols = all
  *    compare columns (everything "changed" from absent);
  *  - key only in `before` → op `D` (delete), changed_cols likewise;
  *  - key in both, any compare column differing under null-safe
  *    equality → op `U` with the differing columns;
  *  - key in both, all equal → no row.
  *
  * NULL keys never pair under an equi-join; both snapshots' NULL-key
  * rows are dropped up front (a diff keyed on NULL is undefined —
  * callers with nullable keys should coalesce first). Duplicate keys
  * within a snapshot are the caller's contract violation; rows then
  * pair combinatorially exactly as SQL would.
  *
  * Cite: the reference reconciles recomputed windows against a sink by
  * delete-then-append (ref/App/etl/load/mes_load.py:88) — this is the
  * observability twin: WHAT changed, before blindly rewriting it.
  */
object SnapshotDiff {

  /** Changelog of `before` → `after`, keyed by `keyCols`, comparing
    * `compareCols`: `keyCols*, op: string, changed_cols: array<string>`.
    */
  def diff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff: keyCols must be non-empty")
    require(compareCols.nonEmpty,
      "snapshotDiff: compareCols must be non-empty")
    val befP = "__b_"
    val aftP = "__a_"
    def pick(df: DataFrame, p: String) = df
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(p + c)): _*)
    // presence markers survive the outer join where all of a side's
    // payload columns may legitimately be NULL
    val b = pick(before, befP).withColumn("__in_b", lit(true))
    val a = pick(after, aftP).withColumn("__in_a", lit(true))
    val joined = b.join(a, keyCols, "full_outer")

    val inB = col("__in_b").isNotNull
    val inA = col("__in_a").isNotNull
    val changed = compareCols.map { c =>
      when(!(col(befP + c) <=> col(aftP + c)), array(lit(c)))
        .otherwise(array().cast("array<string>"))
    }.reduce(concat(_, _))

    joined
      .withColumn("op",
        when(inA && !inB, lit("I"))
          .when(inB && !inA, lit("D"))
          .otherwise(lit("U")))
      .withColumn("changed_cols",
        when(col("op") === "U", changed)
          .otherwise(typedLit(compareCols)))
      .filter(col("op") =!= "U" || size(col("changed_cols")) > 0)
      .select(keyCols.map(col) :+ col("op") :+ col("changed_cols"): _*)
  }

  /** [[diff]] carrying the AFTER-image values (NULL payload on `D`
    * rows) — the changelog shape [[applyChanges]] consumes, i.e. a
    * change-data feed a downstream table can be maintained from. */
  def diffFull(before: DataFrame, after: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val d = diff(before, after, keyCols, compareCols)
    val aft = after
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select((keyCols ++ compareCols).map(col): _*)
    d.join(aft, keyCols, "left")
      .select(keyCols.map(col) ++ (col("op") +: col("changed_cols") +:
        compareCols.map(col)): _*)
  }

  /** Apply a changelog (the [[diffFull]] shape) to a base snapshot:
    * `D` keys drop, `I`/`U` rows take their after-image. One
    * change-sized anti-join plus a union — never a rewrite of
    * untouched rows in the plan (the storage-level analogue is the
    * bucketed delete-then-append upsert in ParquetSinks); the
    * roundtrip law `applyChanges(before, diffFull(before, after)) ≡
    * after` (over non-NULL-key rows) is pinned in SnapshotDiffSpec.
    * NULL-key base rows pass through untouched — the changelog cannot
    * address them (same contract as [[diff]], which never emits
    * NULL-key ops). */
  def applyChanges(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "applyChanges: keyCols must be non-empty")
    val outCols = (keyCols ++ compareCols).map(col)
    val touched = changes.select(keyCols.map(col): _*).distinct()
    val kept = base.select(outCols: _*)
      .join(touched, keyCols, "left_anti")
    val upserts = changes.filter(col("op") =!= "D")
      .select(outCols: _*)
    kept.unionByName(upserts)
  }
}
