package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic temporal operators: as-of joins (backward and forward),
  * point-in-interval and interval-overlap range joins — the join
  * shapes Spark has no native operator for — plus gap sessionization
  * as a generic API.
  *
  * The reference resolves its interval/as-of lookups (SURVEY §2.5 J7)
  * with per-key loops (`ref/RCO_Maple_orchestrator.R:214-263` walks COs
  * one at a time; `App/etl/transform/mes_etl.py:204-213` scans rows per
  * changeover) — O(lookups × events) per key and driver-bound. The RCO
  * operators here already re-express those sites as merged-stream window
  * plans inline (BrandcodeResolve, FirstStopAfterCo, GanttGenerate);
  * this module is the same idea exposed as REUSABLE operators any
  * caller can apply to its own tables, the way DuckDB exposes `ASOF
  * JOIN` and Flink exposes temporal/interval joins as first-class
  * relational operators.
  *
  * Scale shapes (the reason these are not inequality joins):
  *  - [[asofBackward]]: union + one window over (keys, time) — ONE
  *    shuffle on the equi-keys, linear scan per partition. A naive
  *    `l.t >= r.t` theta-join is a broadcast-nested-loop in Spark:
  *    O(|L|×|R|) per key and un-broadcastable once the right side
  *    scales with the corpus.
  *  - [[intervalJoinPoints]]: intervals exploded into fixed-width time
  *    buckets, points bucketed once, then a plain EQUI-join on
  *    (keys, bucket) + exact containment filter. Expansion factor is
  *    `interval_len / bucketWidth + 1` rows per interval — O(1) when
  *    the width is chosen near the typical interval length — and the
  *    join stays shuffle-hash/sort-merge at any scale.
  */
object TemporalJoins {

  private val T    = "__t"
  private val SIDE = "__side"
  private val M    = "__match"

  /** Epoch seconds of a time column. Parquet timestamps arrive as
    * TIMESTAMP_NTZ in Spark 4, which cannot cast to BIGINT directly —
    * hop through TIMESTAMP (sessions pin UTC, so the hop is exact). */
  private def epochSec(c: Column): Column = c.cast("timestamp").cast("long")

  /** Epoch MICROseconds — for gap/staleness arithmetic, where
    * second-truncation would mis-classify sub-second phases (a 1800.5 s
    * gap must exceed an 1800 s threshold; floor(diff)=1800 would not). */
  private def epochUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Backward as-of join: for every left row, attach the LATEST right
    * row of the same key with `rightTime <= leftTime` (DuckDB
    * `ASOF JOIN … ON l.t >= r.t` / pandas `merge_asof` semantics,
    * left-outer flavor: unmatched left rows survive with nulls).
    *
    * Implementation: tag right rows side=0 and left rows side=1, union
    * by name, then one `last(struct(right cols), ignoreNulls)` window
    * partitioned by `on` and ordered by (time, side) — at equal
    * timestamps the right row sorts first, so a left row sees a
    * same-instant right row (>= semantics). The right payload rides in
    * ONE struct so a legitimately-NULL right attribute is carried
    * as-is rather than forward-filled past (last(_, ignoreNulls) on a
    * bare column would skip it).
    *
    * `tolerance`: when set (seconds), matches older than
    * `leftTime - tolerance` are nulled out — the window still fills
    * them, the filter is a projection.
    *
    * Requires: right unique per (on, rightTime) — duplicate instants
    * have no deterministic "latest"; pre-aggregate the right side
    * (e.g. `max_by`) exactly as a DuckDB ASOF caller must. Left and
    * right non-key column names must not collide.
    *
    * Join-semantics parity on NULLs: right rows with a NULL key or
    * NULL `rightTime` are dropped up front — an equi/inequality join
    * predicate can never be satisfied by them, but the window
    * partition WOULD group NULL keys together and an
    * ascending-nulls-first NULL time would win every `last()`, so
    * without the filter they'd produce matches no ASOF join makes.
    * NULL-key left rows pass through unmatched.
    *
    * The matched right timestamp is emitted as `asofTsCol` (default
    * `asof_ts`); right value columns keep their names. */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None,
      asofTsCol: String = "asof_ts"): DataFrame =
    asofImpl(left, right, on, leftTime, rightTime, tolerance, asofTsCol,
      forward = false)

  /** Forward as-of join: the EARLIEST right row with
    * `rightTime >= leftTime` (pandas `merge_asof(direction='forward')`,
    * DuckDB `ASOF … ON l.t <= r.t`). Same machinery as
    * [[asofBackward]] with the scan order reversed; `tolerance` bounds
    * how far AHEAD the match may be. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None,
      asofTsCol: String = "asof_ts"): DataFrame =
    asofImpl(left, right, on, leftTime, rightTime, tolerance, asofTsCol,
      forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long],
      asofTsCol: String,
      forward: Boolean): DataFrame = {
    val valueCols = right.columns.toSeq.filterNot(on.contains)
      .filterNot(_ == rightTime)
    val lTagged = left
      .withColumn(T, col(leftTime))
      .withColumn(SIDE, lit(1))
    val rTagged = right
      .filter(col(rightTime).isNotNull &&
        on.map(col(_).isNotNull).reduce(_ && _))
      .withColumn(T, col(rightTime))
      .withColumn(SIDE, lit(0))
      .withColumnRenamed(rightTime, asofTsCol)
    val merged = lTagged.unionByName(rTagged, allowMissingColumns = true)

    // backward scans time ascending (last seen = latest ≤ t); forward
    // scans descending (last seen = earliest ≥ t). Right sorts before
    // left at equal instants either way, so both directions include
    // the same-instant match (>= / <= semantics).
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(if (forward) col(T).desc else col(T).asc, col(SIDE))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = last(
      when(col(SIDE) === 0, struct((asofTsCol +: valueCols).map(col): _*)),
      ignoreNulls = true).over(w)

    val inTol: Column = tolerance match {
      case Some(s) if forward =>
        epochUs(col(M)(asofTsCol)) <= epochUs(col(T)) + lit(s * 1000000L)
      case Some(s) =>
        epochUs(col(M)(asofTsCol)) >= epochUs(col(T)) - lit(s * 1000000L)
      case None => lit(true)
    }
    merged
      .withColumn(M, packed)
      .filter(col(SIDE) === 1)
      .withColumn(M, when(inTol, col(M)))
      .select(left.columns.map(col) ++
        (asofTsCol +: valueCols).map(c => col(M)(c).as(c)): _*)
  }

  /** Point-in-interval range join: every (point, interval) pair of the
    * same key with `startCol <= pointTime < endCol` (half-open, the
    * convention every RCO window in this repo uses), inner flavor.
    *
    * Implementation: each interval row explodes into the time buckets
    * of width `bucketWidthSec` it overlaps; each point lands in exactly
    * ONE bucket; the join is a plain equi-join on (on…, bucket) plus
    * the exact containment filter. No duplicate elimination is needed —
    * a point's single bucket meets each interval at most once.
    *
    * `bucketWidthSec` tunes the expansion factor
    * (`len/width + 1` bucket rows per interval): pick it near the
    * typical interval length. Degenerate (end < start) intervals
    * produce no buckets and thus no matches. */
  def intervalJoinPoints(
      points: DataFrame,
      intervals: DataFrame,
      on: Seq[String],
      pointTime: String,
      startCol: String,
      endCol: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0,
      s"bucketWidthSec must be positive, got $bucketWidthSec " +
        "(a non-positive width would flag every interval degenerate " +
        "and silently return nothing)")
    val B = "__bucket"
    val w = lit(bucketWidthSec)
    val bStart = floor(epochSec(col(startCol)) / w)
    val bEnd   = floor(epochSec(col(endCol)) / w)
    // Guard: sequence(a, b) with b < a infers step -1 and would emit a
    // (potentially enormous) DESCENDING bucket list for a degenerate
    // interval — explode an empty array instead, dropping the row.
    val iv = intervals.withColumn(B,
      explode(when(bEnd >= bStart, sequence(bStart, bEnd))
        .otherwise(array().cast("array<long>"))))
    val pt = points.withColumn(B, floor(epochSec(col(pointTime)) / w))
    pt.join(iv, on.map(k => pt(k) === iv(k)).reduce(_ && _) && (pt(B) === iv(B)))
      .filter(col(pointTime) >= col(startCol) && col(pointTime) < col(endCol))
      .select(points.columns.map(pt(_)) ++
        intervals.columns.filterNot(on.contains).map(iv(_)): _*)
  }

  /** Interval-overlap join: every (left, right) interval pair of the
    * same key whose half-open ranges overlap
    * (`lStart < rEnd && rStart < lEnd`), inner flavor — the
    * interval × interval sibling of [[intervalJoinPoints]].
    *
    * Same bucketization, plus the FIRST-SHARED-BUCKET trick in place
    * of a dedup: two overlapping intervals co-occupy every bucket of
    * their overlap range, so the equi-join would emit the pair once
    * per shared bucket; instead the join keeps only the bucket both
    * ranges start sharing (`greatest(floor(lStart/w), floor(rStart/w))`)
    * — exactly one emission per pair, no `distinct` shuffle. The
    * exact overlap filter then discards bucket-level false positives. */
  def intervalJoinIntervals(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0,
      s"bucketWidthSec must be positive, got $bucketWidthSec")
    val B = "__bucket"
    val w = lit(bucketWidthSec)
    def buckets(s: String, e: String): Column = {
      val bs = floor(epochSec(col(s)) / w)
      val be = floor(epochSec(col(e)) / w)
      explode(when(be >= bs, sequence(bs, be))
        .otherwise(array().cast("array<long>")))
    }
    val l = left.withColumn(B, buckets(lStart, lEnd))
    val r = right.withColumn(B, buckets(rStart, rEnd))
    l.join(r, on.map(k => l(k) === r(k)).reduce(_ && _) && (l(B) === r(B)))
      .filter(l(B) === greatest(
        floor(epochSec(col(lStart)) / w), floor(epochSec(col(rStart)) / w)))
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .select(left.columns.map(l(_)) ++
        right.columns.filterNot(on.contains).map(r(_)): _*)
  }

  /** Generic gap sessionization: rows of the same key whose times are
    * within `gapSec` of their predecessor share a `sessionCol` id
    * (1-based per key). Gaps are compared at MICROsecond precision
    * (`gap > gapSec` exactly, not `floor(gap) > gapSec` — a 1800.5 s
    * gap must open a session at gapSec=1800). The generic API form of the engine's RCO
    * [[Sessionize]] (which adds the reference's trigger disjuncts and
    * overrides on top of this same window shape): one shuffle on the
    * keys, a lag + running sum per partition.
    *
    * Deterministic under timestamp ties WITHOUT a tiebreak column: tied
    * rows can never open a session against each other (gap 0), and
    * whichever of them the sort visits first absorbs any boundary
    * against the preceding row — every tied row ends up with the same
    * running-boundary count either way. */
  def sessionizeByGap(
      df: DataFrame,
      on: Seq[String],
      time: String,
      gapSec: Long,
      sessionCol: String = "session_id"): DataFrame = {
    val t = epochUs(col(time))
    val w = Window.partitionBy(on.map(col): _*).orderBy(t)
    val prev = lag(t, 1).over(w)
    val boundary =
      when(prev.isNull || t - prev > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn(sessionCol, sum(boundary)
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
