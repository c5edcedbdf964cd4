package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize.{EvIn, LineState}

/** Streaming before/after brandcode per CO — the twin of
  * [[graft.operators.BrandcodeResolve]] (SURVEY §2.5 J7, §2.7 W6) fused
  * into the T3 sessionizer: one `flatMapGroupsWithState` pass over the
  * FULL per-LINE stream emits each CO's (Current, Next, Status) row the
  * moment the next CO opens.
  *
  * Why each lookup is streamable:
  *  - Current_BRANDCODE reads only the PAST: the last event with
  *    START <= co_start (with the reference's zero-uptime-at-boundary
  *    preference for the event before it) inside (prev CO end,
  *    co_start] — all known when the CO's trigger event arrives, from a
  *    two-event history + the previous session's final end. The
  *    trigger event itself counts (the batch merged stream sorts events
  *    before CO rows at equal t).
  *  - Next_BRANDCODE's window (co_start, next co_start) keys on uptime
  *    start `us = START − UPTIME·60`, which is NOT the arrival order —
  *    but in the canonical deduped log `us` is the predecessor's end
  *    (or the event's own START after the negative-gap clamp), so every
  *    event AFTER event k has `us >= START_k`. Hence once the next CO's
  *    trigger (START = next co_start) is processed, no future event can
  *    land in the closed window — candidates buffer while the CO is
  *    open (bounded by one session's events, the same per-CO volume the
  *    batch operator groups) and the window finalizes at the trigger.
  *
  * The line's last CO never closes; the stream emits exactly the batch
  * rows minus each line's final CO (the batch bounds that window with a
  * +60 min default instead). StreamingBrandcodeSpec asserts parity.
  * Ordering contract as [[StreamingSessionize]].
  */
object StreamingBrandcode {

  /** Full-log streaming row (`isCo` = the site CO predicate, F7). */
  case class EvB(LINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, trigCol: String,
      BRANDCODE: String, UPTIME: Double, isCo: Boolean)

  /** Event history entry for the Current lookup. */
  case class PastEv(t: Double, brand: String, uptime: Double)

  /** Buffered Next-window candidate. */
  case class Cand(start: Double, dtid: Long, us: Double, brand: String)

  /** Per-line state: trigger context, open CO (id, start, final-so-far
    * end, resolved Current), last two events, Next candidates. */
  case class BcState(ses: LineState, coId: String, coStart: Double,
      endMax: Double, current: String, last1: Option[PastEv],
      last2: Option[PastEv], buf: Seq[Cand])

  case class BcOut(LINE: String, CO_Identifier: String,
      Current_BRANDCODE: String, Next_BRANDCODE: String,
      Brandcode_Status: String)

  /** The reference's Current rule as a scalar: last event at-or-before
    * the CO start, preferring the one before it when the boundary event
    * has zero uptime; '' when nothing lands inside (prevCoEnd, start].
    * (`ref/RCO_MES_ETL.R:203-214`; BrandcodeResolve's t1/any chain.) */
  private def currentOf(last1: Option[PastEv], last2: Option[PastEv],
      coStart: Double, prevCoEnd: Double): String =
    last1 match {
      case None => ""
      case Some(a) =>
        val pref = if (a.t == coStart && a.uptime == 0) last2 else Some(a)
        pref.filter(_.t > prevCoEnd).map(_.brand)
          .orElse(Some(a).filter(_.t > prevCoEnd).map(_.brand))
          .getOrElse("")
    }

  private def closePending(line: String, s: BcState, tNext: Double,
      lastCand: Cand): BcOut = {
    val win = (s.buf :+ lastCand)
      .filter(c => c.us > s.coStart && c.us < tNext)
    val firstDiff = win.filter(_.brand != s.current)
      .sortBy(c => (c.start, c.dtid)).headOption
    val next =
      if (win.isEmpty) ""
      else firstDiff.map(_.brand).getOrElse(s.current)
    BcOut(line, s.coId, s.current, next,
      if (s.current == next) "Not Changed" else "OK")
  }

  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[EvB], state: GroupState[BcState])
      : Iterator[BcOut] = {
    val zone = ZoneId.of(zoneId)
    var st = state.getOption
    val out = Seq.newBuilder[BcOut]
    it.toIndexedSeq.sortBy(e => (e.START_EPOCH, e.dtid)).foreach { e =>
      val evIn = EvIn(e.LINE, e.downtime_id, e.dtid, e.START_EPOCH,
        e.END_EPOCH, e.trigCol, e.BRANDCODE)
      val cand = Cand(e.START_EPOCH, e.dtid,
        e.START_EPOCH - e.UPTIME * 60, e.BRANDCODE)
      // pre-first-CO state carries history only: coId is empty and the
      // trigger lag must see "no previous CO event" (the batch lag is
      // over CO-filtered events alone), so it is masked to None here
      val opened = st.filter(_.coId.nonEmpty)
      val isTrig = e.isCo &&
        StreamingSessionize.trigger(p, opened.map(_.ses), evIn) == 1
      // the trigger event is itself a full-log event: it joins the
      // event history BEFORE the Current lookup (events sort before CO
      // rows at equal t) and the closing window BEFORE the emission
      val hist1 = Some(PastEv(e.START_EPOCH, e.BRANDCODE, e.UPTIME))
      if (isTrig) {
        val prevCoEnd = opened.map(_.endMax).getOrElse(e.START_EPOCH - 3600)
        val cur = currentOf(hist1, st.flatMap(_.last1), e.START_EPOCH,
          prevCoEnd)
        opened.foreach(s =>
          out += closePending(line, s, e.START_EPOCH, cand))
        val id = StreamingSessionize.sessionId(line, evIn, zone)
        st = Some(BcState(
          LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, id), id,
          e.START_EPOCH, e.END_EPOCH, cur, hist1, st.flatMap(_.last1),
          Seq.empty))
      } else st = Some(st match {
        case Some(s) if s.coId.nonEmpty =>
          // a CO event here extends the open session (trigger == 0)
          val ses2 = if (e.isCo)
            LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, s.coId)
          else s.ses
          val end2 = if (e.isCo) math.max(s.endMax, e.END_EPOCH)
            else s.endMax
          s.copy(ses = ses2, endMax = end2, last1 = hist1,
            last2 = s.last1,
            // only possible members of the open window buffer
            buf = if (cand.us > s.coStart) s.buf :+ cand else s.buf)
        case prev =>
          // before the line's first CO (e cannot be a CO event here:
          // the first CO-filtered event always triggers): history only
          BcState(LineState(0, "", "", ""), "", 0, 0, "", hist1,
            prev.flatMap(_.last1), Seq.empty)
      })
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** Full event stream (CO candidates flagged) → closed-CO rows. */
  def apply(events: Dataset[EvB], p: Sessionize.Params)
      : Dataset[BcOut] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events.groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processLine(p, zoneId))
  }
}
