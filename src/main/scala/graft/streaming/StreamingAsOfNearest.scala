package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingAsOfDual.{Enriched, Tagged}
import graft.streaming.StreamingAsOfDualLate.TaggedEt

/** Streaming nearest as-of join — the stream twin of
  * [[graft.operators.TemporalJoins.asofNearest]]: every fact is
  * enriched with the version CLOSEST in event time, either direction,
  * within ± `tolerance` (ties to the earlier version, the pandas
  * rule). Late arrivals up to the watermark `delay` are handled the
  * same way as [[StreamingAsOfDualLate]].
  *
  * Tolerance is REQUIRED here, and that is not an implementation
  * shortcut: a nearest match needs future knowledge — with no bound
  * on how far ahead the matching version may be, no fact could ever
  * be emitted (the next version might always be nearer). The bound
  * makes the decision point exact:
  *
  *  - a fact at `t` is decidable once `watermark >= t + tolerance` —
  *    Spark admits only rows with event time strictly above the
  *    watermark, so no version inside the fact's window
  *    `[t - tolerance, t + tolerance]` can still arrive;
  *  - a version at `vt` can only matter to facts with
  *    `t >= vt - tolerance`; undecided facts have
  *    `t > watermark - tolerance`, so versions at-or-below
  *    `watermark - 2*tolerance` are unreachable and pruned.
  *
  * State per key is therefore O(rows inside a 2·tolerance +
  * delay-wide moving window), independent of history length. An
  * event-time timeout armed at the earliest pending decision point
  * (`min(t) + tolerance`) releases facts on keys that go quiet.
  */
object StreamingAsOfNearest {

  /** Per-key state: versions still reachable by some future fact,
    * facts awaiting their decision point. */
  case class NearState(versions: Seq[Tagged], facts: Seq[Tagged])

  def processKey(toleranceSec: Long)(key: String,
      it: Iterator[TaggedEt],
      state: GroupState[NearState]): Iterator[Enriched] = {
    val tolUs = toleranceSec * 1000000L
    val st0 = state.getOption.getOrElse(NearState(Nil, Nil))
    val (inV, inF) = it
      .map(r => Tagged(r.k, r.tUs, r.side, r.factId, r.v))
      .toIndexedSeq.partition(_.side == 0)
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val versions = st0.versions ++ inV
    val (ready, pending) =
      (st0.facts ++ inF).partition(f => f.tUs + tolUs <= wmUs)
    val out = ready.sortBy(f => (f.tUs, f.factId)).map { f =>
      val cands = versions.filter(v => math.abs(v.tUs - f.tUs) <= tolUs)
      // min |distance|, ties to the EARLIER version — exactly the
      // batch operator's (distB <= distF → backward) rule
      val m = if (cands.isEmpty) None
        else Some(cands.minBy(v => (math.abs(v.tUs - f.tUs), v.tUs)))
      Enriched(key, f.factId, f.tUs, m.map(_.tUs), m.map(_.v))
    }
    val keptV = versions.filter(_.tUs > wmUs - 2L * tolUs)
    state.update(NearState(keptV, pending))
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        (pending.map(_.tUs).min + tolUs) / 1000L,
        state.getCurrentWatermarkMs() + 1L))
    out.iterator
  }

  /** Run over a [[Tagged]] stream. `toleranceSec` bounds the match
    * distance (required — see the scaladoc); `delay` is the
    * watermark lateness bound, a Spark duration string. */
  def apply(tagged: Dataset[Tagged], toleranceSec: Long,
      delay: String): Dataset[Enriched] = {
    require(toleranceSec > 0,
      s"toleranceSec must be positive, got $toleranceSec — an unbounded " +
        "nearest match can never be emitted (the next version might " +
        "always be nearer); use StreamingAsOfDual for backward-only")
    import tagged.sparkSession.implicits._
    tagged
      .withColumn("ets", timestamp_micros(col("tUs")))
      .as[TaggedEt]
      .withWatermark("ets", delay)
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processKey(toleranceSec))
  }
}
