package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize.{EvIn, LineState}

/** Streaming CO aggregation — the A1 aggregate fused into the T3
  * sessionizer: one `flatMapGroupsWithState` pass keyed by LINE holds
  * the OPEN session's partial aggregate in state and emits each CO row
  * the moment the next session's trigger closes it.
  *
  * This is the streaming twin of [[graft.operators.CoAggregate]] over
  * [[graft.operators.Sessionize]] output, with the batch semantics
  * preserved field-for-field (min/max epochs, rounded downtime sum,
  * first/last event ids, first-event uptime, distinct machines,
  * proration). The line's LAST session stays open forever (append-mode
  * streaming has no end-of-input), so the stream emits exactly the
  * batch rows minus each line's final CO — StreamingCoAggregateSpec
  * asserts that parity.
  *
  * State is O(lines): previous-event fields for the trigger rule plus
  * one partial aggregate (bounded by the machines of one line).
  */
object StreamingCoAggregate {

  /** Streaming input row: [[EvIn]]'s trigger fields + aggregate feed. */
  case class EvAgg(LINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, trigCol: String,
      BRANDCODE: String, DOWNTIME: Double, UPTIME: Double, MACHINE: String)

  case class CoRow(LINE: String, CO_Identifier: String,
      CO_Start_EPOCH: Double, CO_End_EPOCH: Double, CO_DOWNTIME: Double,
      downtime_id_of_First_CO_Event: String,
      downtime_id_of_Last_CO_Event: String, n_events: Long,
      first_ev_UPTIME: Double, Number_of_Machines: Long,
      CO_DOWNTIME_prorated: Double)

  /** Open session partial aggregate + the trigger-rule context.
    * `machines` is a Set and EXCLUDES nulls — the batch side counts
    * machines with `countDistinct`, which ignores null; a null-counting
    * Seq.contains here diverged (and was O(n²) per session). */
  case class AggState(lastEnd: Double, lastTrig: String, lastBrand: String,
      id: String, startEpoch: Double, endEpoch: Double, downtime: Double,
      firstId: String, lastId: String, n: Long, firstUp: Double,
      machines: Set[String])

  private def r4(d: Double) =
    BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def close(line: String, s: AggState): CoRow = {
    val m = s.machines.size
    CoRow(line, s.id, s.startEpoch, s.endEpoch,
      r4(s.downtime), s.firstId, s.lastId, s.n, s.firstUp,
      m.toLong,
      // all-null machines: mirror the batch double division (x/0 = Inf)
      // instead of crashing BigDecimal on the rounding
      if (m == 0) s.downtime / 0.0 else r4(s.downtime / m))
  }

  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[EvAgg], state: GroupState[AggState])
      : Iterator[CoRow] = {
    val zone = ZoneId.of(zoneId)
    var st = state.getOption
    val out = Seq.newBuilder[CoRow]
    it.toIndexedSeq.sortBy(e => (e.START_EPOCH, e.dtid)).foreach { e =>
      val ev = EvIn(e.LINE, e.downtime_id, e.dtid, e.START_EPOCH,
        e.END_EPOCH, e.trigCol, e.BRANDCODE)
      val prev = st.map(s => LineState(s.lastEnd, s.lastTrig, s.lastBrand,
        s.id))
      val trig = StreamingSessionize.trigger(p, prev, ev)
      st = Some(if (trig == 1) {
        st.foreach(s => out += close(line, s))
        val id = StreamingSessionize.sessionId(line, ev, zone)
        AggState(e.END_EPOCH, e.trigCol, e.BRANDCODE, id, e.START_EPOCH,
          e.END_EPOCH, e.DOWNTIME, e.downtime_id, e.downtime_id, 1L,
          e.UPTIME, Option(e.MACHINE).toSet)
      } else {
        val s = st.get
        s.copy(lastEnd = e.END_EPOCH, lastTrig = e.trigCol,
          lastBrand = e.BRANDCODE,
          startEpoch = math.min(s.startEpoch, e.START_EPOCH),
          endEpoch = math.max(s.endEpoch, e.END_EPOCH),
          downtime = s.downtime + e.DOWNTIME,
          // events arrive in (START_EPOCH, dtid) order, so the running
          // last id IS max_by(id, start); the first id never changes
          lastId = e.downtime_id, n = s.n + 1,
          machines = if (e.MACHINE == null) s.machines
            else s.machines + e.MACHINE)
      })
    }
    st.foreach(state.update)
    out.result().iterator
  }

  /** CO-filtered event stream → closed CO rows. */
  def apply(events: Dataset[EvAgg], p: Sessionize.Params)
      : Dataset[CoRow] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events.groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processLine(p, zoneId))
  }
}
