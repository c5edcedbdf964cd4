package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingAsOfDual.{DimState, Enriched, Tagged}

/** Bounded-lateness dual-stream as-of join — [[StreamingAsOfDual]]
  * without its ordered-arrival contract: rows may arrive out of
  * event-time order by up to the watermark `delay`, and every fact is
  * still enriched with the version the batch
  * [[graft.operators.TemporalJoins.asofBackward]] would pick. The
  * reference's own design point is that late data is the NORM in this
  * domain (its incremental runs re-extract overlapping days precisely
  * to reconcile it, `App/rco_main.py:80-83`); this is the streaming
  * answer to the same problem.
  *
  * Formulation: a watermark-and-buffer stage fused into the keyed
  * state machine. Each key's state holds (newest released dimension
  * version, buffer of not-yet-releasable rows). On every invocation —
  * data arrival or event-time timeout — rows with
  * `eventTime < watermark` are RELEASED: sorted by (time, side) and
  * folded through the same single-version machine as the ordered
  * operator, facts emitting their enrichment. Rows at-or-after the
  * watermark stay buffered, and an event-time timeout is armed at the
  * earliest buffered time so they release as soon as the watermark
  * passes them even if the key never sees data again.
  *
  * Release boundary: Spark's stateful admission filter drops rows
  * with `eventTime <= watermark` (measured empirically on the exec's
  * late-row predicate), so everything at-or-below the current
  * watermark is final and releases together. Corollary: a row whose
  * event time equals the INITIAL watermark — epoch 0 exactly — is
  * dropped before the operator ever sees it; real event times are
  * past 1970, so this is a fixture hazard, not a production one.
  *
  * Guarantees and their price:
  *  - a row late by LESS than `delay` lands in the buffer and is
  *    folded in correct event-time order — the streamed result over
  *    closed (released) windows is EXACTLY the batch as-of
  *    (StreamingAsOfDualLateSpec asserts it across random chops with
  *    bounded disorder);
  *  - a row late by MORE than `delay` is dropped by Spark's
  *    watermark filter before reaching the state machine — the
  *    standard watermark contract, visible (the fact simply never
  *    emits; a dropped version never matches) and bounded by a knob
  *    the operator's user chooses;
  *  - state is O(keys) + O(rows inside the lateness window) — the
  *    buffer holds at most `delay`'s worth of a key's traffic, so
  *    memory is bounded by disorder, not by history. The ordered
  *    operator remains the cheaper choice for sources that truly
  *    cannot be late (its state is one version per key, period).
  */
object StreamingAsOfDualLate {

  /** [[Tagged]] plus the event-time column the watermark is declared
    * on (derived from `tUs`; Spark's late-row filter and event-time
    * timeouts both key off it). */
  case class TaggedEt(k: String, tUs: Long, side: Int, factId: Long,
      v: String, ets: java.sql.Timestamp)

  /** Per-key state: the newest RELEASED dimension version, plus the
    * buffer of rows still inside the lateness window. */
  case class BufState(dim: Option[DimState], pending: Seq[Tagged])

  /** One invocation (data or timeout): release everything below the
    * watermark in event-time order, re-arm the timeout for the rest. */
  def processKey(toleranceSec: Option[Long])(key: String,
      it: Iterator[TaggedEt],
      state: GroupState[BufState]): Iterator[Enriched] = {
    val tolUs = toleranceSec.map(_ * 1000000L)
    val st0 = state.getOption.getOrElse(BufState(None, Nil))
    val incoming =
      it.map(r => Tagged(r.k, r.tUs, r.side, r.factId, r.v)).toIndexedSeq
    val wmMs = state.getCurrentWatermarkMs()
    val wmUs = wmMs * 1000L
    // <=: Spark only admits rows STRICTLY above the watermark, so a
    // row tying it can never gain new earlier-or-equal siblings
    val (ready, pending) =
      (st0.pending ++ incoming).partition(_.tUs <= wmUs)
    var dim = st0.dim
    val out = ready.sortBy(r => (r.tUs, r.side)).flatMap { r =>
      if (r.side == 0) {
        if (dim.forall(_.tUs <= r.tUs)) dim = Some(DimState(r.tUs, r.v))
        None
      } else {
        val m = dim.filter(s =>
          s.tUs <= r.tUs && tolUs.forall(t => s.tUs >= r.tUs - t))
        Some(Enriched(key, r.factId, r.tUs, m.map(_.tUs), m.map(_.v)))
      }
    }
    state.update(BufState(dim, pending))
    if (pending.nonEmpty)
      // fire as soon as the watermark passes the earliest buffered
      // row (floor-to-ms is safe: the timeout is a lower bound, the
      // release predicate re-checks against the exact watermark);
      // must be strictly above the current watermark to be legal
      state.setTimeoutTimestamp(
        math.max(pending.map(_.tUs).min / 1000L, wmMs + 1L))
    out.iterator
  }

  /** Run over a stream of [[Tagged]] rows with lateness bounded by
    * `delay` (a Spark duration string, e.g. "60 seconds"). `tolerance`
    * (seconds) bounds match staleness like the batch operator. */
  def apply(tagged: Dataset[Tagged], delay: String,
      tolerance: Option[Long] = None): Dataset[Enriched] = {
    import tagged.sparkSession.implicits._
    tagged
      .withColumn("ets", timestamp_micros(col("tUs")))
      .as[TaggedEt]
      .withWatermark("ets", delay)
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processKey(tolerance))
  }
}
