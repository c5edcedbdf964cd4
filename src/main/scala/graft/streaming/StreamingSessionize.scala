package graft.streaming

import java.time.{Instant, ZoneId}

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sessionize

/** Streaming surface for the data-dependent-gap sessionization (SURVEY
  * §2.10 T3): the same 4-disjunct rule as the batch [[Sessionize]]
  * operator, over an unbounded per-LINE event stream.
  *
  * `session_window` cannot express this — the merge gap depends on
  * cause-trio/brandcode equality between neighbors, not a constant —
  * so the idiomatic formulation is `flatMapGroupsWithState` keyed by
  * LINE with one tiny state record per line: the previous event's
  * (end, cause-trio, brandcode) and the current session id. State size
  * is O(lines), independent of history length.
  *
  * Ordering contract: events must arrive in event-time order per LINE
  * across batches (within a batch the group iterator is sorted here).
  * A production job in front of out-of-order sources adds a watermark
  * and a buffering stage; the reference pipeline itself is incremental
  * batch over an ordered extract (SURVEY §2.10), so this surface keeps
  * the same contract.
  *
  * StreamingSessionizeSpec proves batch/stream parity: the same events
  * replayed over multiple micro-batches produce exactly the batch
  * operator's (CO_Trigger, CO_Identifier) assignment.
  */
object StreamingSessionize {

  /** Streaming input row (trigCol pre-concatenated as in W4). */
  case class EvIn(LINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, trigCol: String,
      BRANDCODE: String)

  case class EvOut(LINE: String, downtime_id: String, CO_Trigger: Int,
      CO_Identifier: String)

  /** Per-line state: previous event + current session id. */
  case class LineState(lastEnd: Double, lastTrig: String,
      lastBrand: String, curId: String)

  /** The 4-disjunct rule + overrides as a pure function — the scalar
    * twin of the batch operator's Column expressions. */
  def trigger(p: Sessionize.Params, prev: Option[LineState], e: EvIn)
      : Int = prev match {
    case None => 1
    case Some(s) =>
      val gap = (e.START_EPOCH - s.lastEnd) / 60.0
      val pr = p.triggerParam
      val sameTrig = e.trigCol == s.lastTrig
      val sameBrand = e.BRANDCODE == s.lastBrand
      val factor4 = if (p.pythonFactor4) pr * 3 / 2 else pr / 3 * 2
      val sameCo = (gap < pr && sameTrig) ||
        (gap < pr * 4 / 3 && sameTrig && sameBrand) ||
        (gap < pr && sameBrand) ||
        (gap < factor4)
      val base = if (sameCo) 0 else 1
      val afterSplit = if (p.splitOnCause && !sameTrig) 1 else base
      if (p.changeoverFailureNoSplit && afterSplit == 1 &&
        e.trigCol.contains("Changeover Failure") && gap < 120) 0
      else afterSplit
  }

  private def dateOf(epoch: Double, zone: ZoneId): String =
    Instant.ofEpochSecond(epoch.toLong).atZone(zone)
      .toLocalDate.toString

  def sessionId(line: String, e: EvIn, zone: ZoneId): String =
    s"$line - ${dateOf(e.START_EPOCH, zone)} - ${e.downtime_id.take(10)}"

  /** One group-batch step: fold sorted events through the state.
    * @param zoneId session timezone id — the batch operator renders the
    *               id date via `cast(timestamp as string)`, which uses
    *               `spark.sql.session.timeZone`; parity requires the
    *               same zone here (captured at plan build, serialized
    *               as a string to the executors). */
  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[EvIn], state: GroupState[LineState])
      : Iterator[EvOut] = {
    val zone = ZoneId.of(zoneId)
    var st = state.getOption
    val out = it.toIndexedSeq.sortBy(e => (e.START_EPOCH, e.dtid)).map {
      e =>
        val trig = trigger(p, st, e)
        val id = if (trig == 1) sessionId(line, e, zone) else st.get.curId
        st = Some(LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, id))
        EvOut(line, e.downtime_id, trig, id)
    }
    st.foreach(state.update)
    out.iterator
  }

  /** Streaming sessionization: works on both streaming and batch
    * Datasets (the same code path — Spark runs mapGroupsWithState
    * statefully only under a streaming query). */
  def apply(events: Dataset[EvIn], p: Sessionize.Params)
      : Dataset[EvOut] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events.groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(processLine(p, zoneId))
  }
}
