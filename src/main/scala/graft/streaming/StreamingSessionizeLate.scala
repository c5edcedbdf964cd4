package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize.{EvIn, EvOut, LineState}

/** Bounded-lateness RCO sessionization — [[StreamingSessionize]]
  * without its ordered-arrival contract, the same
  * watermark-and-buffer-fused state machine as
  * [[StreamingAsOfDualLate]]: per LINE, rows buffer until the
  * watermark passes them, then fold through the 4-disjunct trigger in
  * exact (START_EPOCH, dtid) order. A downtime event late by less
  * than the watermark `delay` therefore lands in the right
  * changeover; one later than that is dropped by Spark's admission
  * filter (`eventTime <= watermark`) — the standard visible-not-wrong
  * watermark trade, and the reason the reference's own incremental
  * runs re-extract overlapping days (T2 reconciliation).
  *
  * State per LINE: the sessionizer's one-record fold state plus the
  * buffer of rows inside the lateness window — O(lines + late
  * window), independent of history. An event-time timeout armed at
  * the earliest buffered row keeps quiet lines draining.
  */
object StreamingSessionizeLate {

  /** [[EvIn]] plus the event-time column the watermark is declared
    * on (derived from START_EPOCH). */
  case class EvInEt(LINE: String, downtime_id: String, dtid: Long,
      START_EPOCH: Double, END_EPOCH: Double, trigCol: String,
      BRANDCODE: String, ets: java.sql.Timestamp)

  case class BufState(fold: Option[LineState], pending: Seq[EvIn])

  private def toUs(epoch: Double): Long = math.round(epoch * 1e6)

  def processLine(p: Sessionize.Params, zoneId: String)(line: String,
      it: Iterator[EvInEt], state: GroupState[BufState])
      : Iterator[EvOut] = {
    val zone = ZoneId.of(zoneId)
    val st0 = state.getOption.getOrElse(BufState(None, Nil))
    val incoming = it.map(r => EvIn(r.LINE, r.downtime_id, r.dtid,
      r.START_EPOCH, r.END_EPOCH, r.trigCol, r.BRANDCODE)).toIndexedSeq
    val wmMs = state.getCurrentWatermarkMs()
    val wmUs = wmMs * 1000L
    val (ready, pending) =
      (st0.pending ++ incoming).partition(e => toUs(e.START_EPOCH) <= wmUs)
    var fold = st0.fold
    val out = ready.sortBy(e => (e.START_EPOCH, e.dtid)).map { e =>
      val trig = StreamingSessionize.trigger(p, fold, e)
      val id = if (trig == 1) StreamingSessionize.sessionId(line, e, zone)
        else fold.get.curId
      fold = Some(LineState(e.END_EPOCH, e.trigCol, e.BRANDCODE, id))
      EvOut(line, e.downtime_id, trig, id)
    }
    state.update(BufState(fold, pending))
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        pending.map(e => toUs(e.START_EPOCH)).min / 1000L, wmMs + 1L))
    out.iterator
  }

  /** Run over an [[EvIn]] stream with lateness bounded by `delay`
    * (a Spark duration string). */
  def apply(events: Dataset[EvIn], p: Sessionize.Params,
      delay: String): Dataset[EvOut] = {
    import events.sparkSession.implicits._
    val zoneId = events.sparkSession.conf
      .get("spark.sql.session.timeZone", ZoneId.systemDefault().getId)
    events
      .withColumn("ets", timestamp_seconds(col("START_EPOCH")))
      .as[EvInEt]
      .withWatermark("ets", delay)
      .groupByKey(_.LINE)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processLine(p, zoneId))
  }
}
