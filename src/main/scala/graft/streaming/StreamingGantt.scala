package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{GanttGenerate, Sessionize}
import graft.streaming.StreamingSessionize.{EvIn, LineState}

/** Streaming twin of the Gantt pipeline (SURVEY §2.8 G1–G4 + §2.7 W11;
  * batch: [[graft.operators.GanttGenerate]]) — the last analytical
  * operator family without one.
  *
  * Split on the state boundary: the only part of Gantt that needs
  * streaming STATE is window ASSIGNMENT — building CO sessions from the
  * event stream, fixing each CO's plot window
  * [start − 5 min, end + 15 min] at session close, buffering machine
  * events while any window can still gain members, and emitting each
  * closed (CO, machine-event) pair exactly once. Point emission, the
  * closing pair, the end clamp and the W11 monotonic correction are a
  * PURE function of a (CO, machine) group's complete assigned set, and
  * a group's rows all emit in one state invocation (= one micro-batch),
  * so [[points]] simply reuses the batch kernel on each micro-batch's
  * output — the standard `foreachBatch` shared-kernel pattern, zero
  * drift between the surfaces by construction.
  *
  * Batch semantics preserved exactly:
  *  - window membership is the G1 filter `END_EPOCH > min_t AND
  *    START_EPOCH < max_t`; adjacent COs' windows can overlap, so an
  *    event may emit under several COs (as in batch `assign`);
  *  - a pending window is complete once an event STARTS at/after its
  *    `max_t`: per-LINE event-time order means no later event can pass
  *    the strict `START_EPOCH < max_t` guard;
  *  - per-event status is fixed at arrival (G2: 2 for non-constraint
  *    machines; 1 / 1.7 / 2.3 / 4 for constraint machines via
  *    [[status]]), and G3 — constraint machines leave the
  *    non-constraint pass — is the same flag;
  *  - state per LINE is the open session + pending windows + the event
  *    buffer pruned to `END_EPOCH > min(reachable window starts)` —
  *    bounded by window width (the batch operator's per-bucket bound),
  *    independent of history length.
  *
  * A line's last CO never closes (append streams have no end-of-input),
  * matching the other streaming twins; StreamingGanttSpec asserts
  * parity with batch `ganttData` on the closed set. Ordering contract
  * as [[StreamingSessionize]]: per-LINE event-time order across
  * batches. The J6 `coEvent` flag and the constraint-machine flag are
  * evaluated upstream (F7-style), like `isCo`.
  */
object StreamingGantt {

  /** Streaming input row: session feed (trigCol/BRANDCODE/isCo) +
    * machine-event feed + the status flags. */
  case class GEv(LINE: String, MACHINE: String, downtime_id: String,
      dtid: Long, START_EPOCH: Double, END_EPOCH: Double,
      DOWNTIME: Double, UPTIME: Double, trigCol: String,
      BRANDCODE: String, isCo: Boolean, isConstraint: Boolean,
      coEvent: Boolean, planned: Int, idle: Int)

  /** Assigned (CO window × machine event) pair — exactly the columns
    * the batch point kernel consumes. */
  case class GOut(CO_Identifier: String, LINE: String, MACHINE: String,
      min_t: Double, max_t: Double, START_EPOCH: Double,
      END_EPOCH: Double, DOWNTIME: Double, UPTIME: Double, dtid: Long,
      downtime_id: String, st: Double)

  /** Buffered machine event (slim: what [[GOut]] needs). */
  case class MEv(MACHINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, DOWNTIME: Double,
      UPTIME: Double, st: Double)

  /** A closed CO whose plot window is still collecting events. */
  case class PendCo(id: String, minT: Double, maxT: Double)

  /** Per-line state: session context + open CO's span + pending
    * windows + the pruned machine-event buffer. */
  case class GSt(ses: Option[LineState], coStart: Double, coEnd: Double,
      pending: Seq[PendCo], buf: Seq[MEv])

  /** G2 status codes (`ref/RCO_subETL_Gantt_Data_generator.R:285`),
    * the scalar twin of [[GanttGenerate.constraintStatus]]. */
  def status(isConstraint: Boolean, coEvent: Boolean, planned: Int,
      idle: Int): Double =
    if (!isConstraint) 2.0
    else if (coEvent) 1.0
    else if (planned == 1) 1.7
    else if (idle == 0) 2.3
    else 4.0

  private val PadBefore = GanttGenerate.MinutesBefore * 60.0
  private val PadAfter = GanttGenerate.MinutesAfter * 60.0

  /** One group-batch step: fold sorted events through the state. */
  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[GEv], state: GroupState[GSt])
      : Iterator[GOut] = {
    val zone = ZoneId.of(zoneId)
    var st = state.getOption.getOrElse(GSt(None, 0.0, 0.0, Nil, Nil))
    val out = Seq.newBuilder[GOut]

    def emit(w: PendCo): Unit =
      st.buf.foreach { m =>
        if (m.END_EPOCH > w.minT && m.START_EPOCH < w.maxT)
          out += GOut(w.id, line, m.MACHINE, w.minT, w.maxT,
            m.START_EPOCH, m.END_EPOCH, m.DOWNTIME, m.UPTIME, m.dtid,
            m.downtime_id, m.st)
      }

    it.toIndexedSeq.sortBy(e => (e.START_EPOCH, e.dtid)).foreach { e =>
      // session construction (W4 rule shared with the sessionizer twin)
      if (e.isCo) {
        val evIn = EvIn(e.LINE, e.downtime_id, e.dtid, e.START_EPOCH,
          e.END_EPOCH, e.trigCol, e.BRANDCODE)
        val trig = StreamingSessionize.trigger(p, st.ses, evIn)
        if (trig == 1) {
          // the previous session's window is now fixed → pending
          val closed = st.ses.map(s => PendCo(s.curId,
            st.coStart - PadBefore, st.coEnd + PadAfter))
          st = st.copy(
            ses = Some(LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE,
              StreamingSessionize.sessionId(line, evIn, zone))),
            coStart = e.START_EPOCH, coEnd = e.END_EPOCH,
            pending = st.pending ++ closed)
        } else {
          st = st.copy(
            ses = Some(LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE,
              st.ses.get.curId)),
            coEnd = math.max(st.coEnd, e.END_EPOCH))
        }
      }
      // buffer the machine event (status fixed at arrival)
      st = st.copy(buf = st.buf :+ MEv(e.MACHINE, e.downtime_id, e.dtid,
        e.START_EPOCH, e.END_EPOCH, e.DOWNTIME, e.UPTIME,
        status(e.isConstraint, e.coEvent, e.planned, e.idle)))
      // flush windows no later event can reach (strict `< max_t` guard
      // + per-LINE start order)
      val (ready, still) = st.pending.partition(_.maxT <= e.START_EPOCH)
      ready.foreach(emit)
      // prune: an event is dead once its end precedes every reachable
      // window start — still-pending windows, the open CO's window, and
      // any FUTURE CO's window (whose min_t is ≥ this event's start − pad)
      val floor = (still.map(_.minT) ++
        st.ses.map(_ => st.coStart - PadBefore) ++
        Seq(e.START_EPOCH - PadBefore)).min
      st = st.copy(pending = still,
        buf = st.buf.filter(_.END_EPOCH > floor))
    }

    state.update(st)
    out.result().iterator
  }

  /** Streaming window assignment: works on both streaming and batch
    * Datasets (Spark runs the state machinery only under a streaming
    * query). */
  def apply(events: Dataset[GEv], p: Sessionize.Params)
      : Dataset[GOut] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events.groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processLine(p, zoneId))
  }

  /** The pure tail of the pipeline: batch point kernel + W11 correction
    * over a micro-batch of assigned pairs (a (CO, machine) group's rows
    * always share one micro-batch). Use inside `foreachBatch`, or on
    * the collected output table. */
  def points(assigned: DataFrame): DataFrame =
    GanttGenerate.corrected(GanttGenerate.points(assigned, col("st")))
}
