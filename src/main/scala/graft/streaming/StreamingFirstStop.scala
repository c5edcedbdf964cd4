package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize.{EvIn, LineState}

/** Streaming first-stop-after-CO + uptime-till-next-CO — the twin of
  * [[graft.operators.FirstStopAfterCo]] (SURVEY §2.3 F10, §2.7 W8/W9,
  * §2.6 A9) fused into the T3 sessionizer: one `flatMapGroupsWithState`
  * pass over the FULL per-LINE event stream (CO candidates flagged with
  * `isCo`) emits each CO's after-window results the moment the next CO
  * opens and fixes the window's upper bound.
  *
  * Batch semantics preserved exactly:
  *  - a CO's window is [final CO end, next CO start); an event at
  *    EXACTLY the next CO's start belongs to the next CO (the batch
  *    merged-stream tie rule) — here that falls out of the strict
  *    `t < trigger start` filter at close;
  *  - every full-log event qualifies, including the session's own
  *    events when `t >= final end` (zero-duration tails): candidates
  *    buffer while the session is open (its end can still grow) and
  *    the buffer prunes to `t >= current end` on every extension, so
  *    state holds only the events past the open CO's current end —
  *    the same per-CO volume the batch operator shuffles;
  *  - Uptime_cumul accumulates over ALL window events in (t, dtid)
  *    order up to the first unplanned/non-idle/non-excluded stop (W8);
  *  - Total_Uptime_till_Next_CO = window UPTIME sum + the next CO's
  *    first-event UPTIME (A9) — available at close: the trigger event
  *    IS the next CO's first event.
  *
  * The line's last CO never closes (append-mode streaming has no
  * end-of-input), so the stream emits exactly the batch rows minus
  * each line's final CO — the batch run bounds that window with a
  * 30-day horizon instead. StreamingFirstStopSpec asserts the parity.
  * Ordering contract as [[StreamingSessionize]]: per-LINE event-time
  * order across batches.
  */
object StreamingFirstStop {

  /** Full-log streaming row: trigger fields + window/first-stop feed.
    * `isCo` = the site CO predicate, evaluated upstream (F7). */
  case class EvFs(LINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, DOWNTIME: Double,
      UPTIME: Double, trigCol: String, BRANDCODE: String, isCo: Boolean,
      planned: Int, idle: Int, excluded: Boolean)

  /** Buffered window candidate (slim: what the outputs need). */
  case class Cand(t: Double, dtid: Long, downtime_id: String,
      DOWNTIME: Double, UPTIME: Double, planned: Int, idle: Int,
      excluded: Boolean)

  /** Per-line state: CO trigger context + open CO id/end + candidates
    * at-or-past the open CO's current end. */
  case class FsState(ses: LineState, coId: String, endMax: Double,
      buf: Seq[Cand])

  /** One row per CLOSED CO. First-stop fields are None when no window
    * event passes the W9 filter (the batch emits no row then). */
  case class FsOut(LINE: String, CO_Identifier: String,
      Total_Uptime_till_Next_CO: Double, first_downtime_id: Option[String],
      first_START_EPOCH: Option[Double], first_DOWNTIME: Option[Double],
      first_UPTIME: Option[Double], Uptime_cumul: Option[Double])

  private def r2(d: Double) =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def cand(e: EvFs) = Cand(e.START_EPOCH, e.dtid, e.downtime_id,
    e.DOWNTIME, e.UPTIME, e.planned, e.idle, e.excluded)

  /** Close the open CO against the trigger event at `tNext`: window =
    * buffered candidates with finalEnd <= t < tNext, in (t, dtid)
    * order. */
  private def close(line: String, s: FsState, tNext: Double,
      nextFirstUptime: Double): FsOut = {
    val win = s.buf.filter(c => c.t >= s.endMax && c.t < tNext)
      .sortBy(c => (c.t, c.dtid))
    var cum = 0.0
    var first: Option[(Cand, Double)] = None
    win.foreach { c =>
      cum += c.UPTIME
      if (first.isEmpty && c.planned == 0 && c.idle == 0 && !c.excluded)
        first = Some((c, cum))
    }
    FsOut(line, s.coId,
      r2(win.iterator.map(_.UPTIME).sum + nextFirstUptime),
      first.map(_._1.downtime_id), first.map(_._1.t),
      first.map(f => r2(f._1.DOWNTIME)), first.map(f => r2(f._1.UPTIME)),
      first.map(f => r2(f._2)))
  }

  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[EvFs], state: GroupState[FsState])
      : Iterator[FsOut] = {
    val zone = ZoneId.of(zoneId)
    var st = state.getOption
    val out = Seq.newBuilder[FsOut]
    it.toIndexedSeq.sortBy(e => (e.START_EPOCH, e.dtid)).foreach { e =>
      val evIn = EvIn(e.LINE, e.downtime_id, e.dtid, e.START_EPOCH,
        e.END_EPOCH, e.trigCol, e.BRANDCODE)
      val isTrig = e.isCo &&
        StreamingSessionize.trigger(p, st.map(_.ses), evIn) == 1
      if (isTrig) {
        // candidates AT the trigger instant stay in play for the NEW
        // CO's window (as-of tie rule); everything earlier is settled
        val carry = st.toSeq.flatMap(_.buf).filter(_.t == e.START_EPOCH)
        st.foreach(s => out += close(line, s, e.START_EPOCH, e.UPTIME))
        val id = StreamingSessionize.sessionId(line, evIn, zone)
        st = Some(FsState(
          LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, id), id,
          e.END_EPOCH, (carry :+ cand(e)).filter(_.t >= e.END_EPOCH)))
      } else {
        st = st.map { s =>
          // only CO events advance the trigger lag and the session end
          val ses2 = if (e.isCo)
            LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, s.coId)
          else s.ses
          val end2 = if (e.isCo) math.max(s.endMax, e.END_EPOCH)
            else s.endMax
          s.copy(ses = ses2, endMax = end2,
            buf = (s.buf :+ cand(e)).filter(_.t >= end2))
        }
        // st == None: event precedes the line's first CO — no window
        // can own it (batch drops it the same way)
      }
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Full event stream (CO candidates flagged) → closed-CO rows. */
  def apply(events: Dataset[EvFs], p: Sessionize.Params)
      : Dataset[FsOut] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events.groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processLine(p, zoneId))
  }
}
