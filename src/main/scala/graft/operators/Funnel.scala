package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event funnels: "first A, then B strictly after it, then C
  * strictly after that" per entity, and the per-stage reach counts —
  * the conversion-analysis shape of an event warehouse (the
  * reference's per-CO ordered walks — first stop AFTER a changeover,
  * `ref/First_Stop_after_CO.R` — are this same pattern; here it is
  * the generic N-stage API).
  *
  * Plan shape: stage k's time is `min(ts) filtered to stage-k events
  * later than stage k-1's time` as a WHOLE-PARTITION window aggregate
  * over the entity key. All N stages stack over the SAME partitioning,
  * so Catalyst plans ONE exchange for the whole funnel regardless of
  * stage count — no self-joins, no per-entity collect, no sort even
  * (the frame is unbounded). Adding a stage adds a projection, not a
  * shuffle.
  */
object Funnel {

  /** Per-entity stage-completion times: one row per entity with a
    * `t_<stage>` timestamp column per stage — NULL from the first
    * stage the entity never reached (strictly-after semantics chain
    * NULLs forward automatically: `ts > NULL` is never true). */
  def stageTimes(events: DataFrame, entityCol: String, typeCol: String,
      timeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages,
      s"funnel stages must be distinct, got $stages")
    val w = Window.partitionBy(col(entityCol))
    val staged = stages.zipWithIndex.foldLeft(
      events.select(col(entityCol), col(typeCol), col(timeCol))) {
      case (df, (stage, i)) =>
        val afterPrev: Column =
          if (i == 0) lit(true)
          else col(timeCol) > col(s"t_${stages(i - 1)}")
        df.withColumn(s"t_$stage",
          min(when(col(typeCol) === stage && afterPrev, col(timeCol)))
            .over(w))
    }
    staged.groupBy(col(entityCol))
      .agg(max(col(s"t_${stages.head}")).as(s"t_${stages.head}"),
        stages.tail.map(st => max(col(s"t_$st")).as(s"t_$st")): _*)
  }

  /** Funnel reach: how many entities completed each stage prefix. */
  def counts(events: DataFrame, entityCol: String, typeCol: String,
      timeCol: String, stages: Seq[String]): DataFrame = {
    val st = stageTimes(events, entityCol, typeCol, timeCol, stages)
    st.agg(count(lit(1)).as("n_entities"),
      stages.map(s => count(col(s"t_$s")).as(s"n_$s")): _*)
  }
}
