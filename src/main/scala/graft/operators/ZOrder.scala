package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of several
  * bucketized columns into ONE sort key, so that range-partitioning by
  * that key gives every output file a compact hyper-rectangle of the
  * multi-dimensional key space — and parquet min/max footer stats then
  * prune files for predicates on ANY of the clustered columns, not
  * just the first sort column. This is the standard lakehouse layout
  * optimization (Delta OPTIMIZE ZORDER BY, Iceberg sort orders); at
  * 100 TB it is the difference between a point-ish query scanning a
  * few files and scanning the whole table whenever it filters on the
  * second dimension.
  *
  * The reference has no layout optimizer (its outputs are per-site
  * flat files, `App/etl/load/site_writer.py`); this is engine-side
  * hardening for the scale target, same category as the bucketed sinks
  * (sinks/Bucketing.scala).
  *
  * Determinism contract (gate-checked as `cls_zorder`): bucketization
  * is `least(2^bits-1, floor((x - min) / (max - min) * 2^bits))` in
  * DOUBLE arithmetic — both engines compute identical IEEE doubles
  * from identical min/max, so bucket ids and z-values are bit-exact
  * cross-engine. All arithmetic is codegen'd built-ins (shifts, masks,
  * floor) — no UDFs, no expression walls in the scan.
  */
object ZOrder {

  /** Interleaved z-value of `buckets` — column j contributes bit i of
    * its value to output bit `i * k + j`, the classic Morton layout.
    * Every input must already be a NON-NEGATIVE long below `2^bits`
    * (see [[minMaxBucket]]); `bits * k` must fit a signed long.
    * Unrolled to `bits × k` shift-mask-shift terms summed — pure
    * integer column arithmetic, whole-stage-codegen friendly. */
  def zValue(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * buckets.size <= 63,
      s"bits ($bits) x columns (${buckets.size}) must fit a signed long")
    val k = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, j) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * k + j)
    terms.reduce(_ + _)
  }

  /** Linear min/max bucketization of one column into `[0, 2^bits)`:
    * `least(2^bits - 1, floor((x - min) / (max - min) * 2^bits))`.
    * `min`/`max` ride in as columns (a broadcast aggregate row) so the
    * bucketing is one projection pass. A degenerate column
    * (min = max) buckets everything to 0 rather than dividing by
    * zero. Linear cuts are the cheap standard; under heavy value skew
    * substitute quantile cutpoints for min/max upstream — the
    * interleave does not care how the buckets were made. */
  def minMaxBucket(x: Column, min: Column, max: Column,
      bits: Int): Column = {
    val span = max.cast("double") - min.cast("double")
    val scaled = floor(
      (x.cast("double") - min.cast("double")) / span * (1L << bits))
      .cast("long")
    // explicit NULL guard: Spark's greatest/least IGNORE null
    // arguments, so without it a NULL x would silently land in bucket
    // 0 instead of propagating (and clusterByZ's null-row handling
    // keys off that propagation)
    when(x.isNull, lit(null).cast("long"))
      .when(span === 0.0, 0L)
      .otherwise(least(lit((1L << bits) - 1), greatest(lit(0L), scaled)))
  }

  /** Cluster `df` for multi-dimensional file pruning: bucket each of
    * `cols` by its global min/max (ONE tiny aggregate row, broadcast),
    * z-interleave the buckets, then `repartitionByRange` on the
    * z-value and sort within partitions — every output partition (=
    * file, when written) covers a contiguous z-range, i.e. a compact
    * rectangle of the clustered columns, which parquet min/max stats
    * expose to scan pruning.
    *
    * Cost shape at scale: one aggregate pass for the bounds + one
    * range shuffle — the same cost as any global sort-by-one-column
    * write, but the layout serves predicates on ALL clustered columns.
    * Rows where any clustered column is NULL have no place on the
    * curve; they keep z-value -1 and range-partition to the front,
    * which concentrates them in few files (their own prunable
    * "bucket") instead of spraying them everywhere. */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0): DataFrame = {
    require(cols.nonEmpty, "clusterByZ needs at least one column")
    reserveAliases(df, cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")))
    val bounds = df.agg(
      min(col(cols.head)).as(s"__min_${cols.head}"),
      (max(col(cols.head)).as(s"__max_${cols.head}") +:
        cols.tail.flatMap(c => Seq(
          min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c")))): _*)
    val buckets = cols.map(c =>
      minMaxBucket(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
    zLayout(df, bounds, buckets, bits, numPartitions)
  }

  /** Rank-based bucketization of one column against a SORTED cutpoint
    * array of exactly `2^bits - 1` interior quantiles: bucket = number
    * of cuts at-or-below x (= largest index whose cut ≤ x — equivalent
    * on a sorted array, duplicates included). NULL x or a NULL cut
    * array propagates. Where [[minMaxBucket]] collapses under value
    * skew (one dense region hogs one bucket, most buckets empty — and
    * with them the z-curve's pruning power), quantile cuts put ~equal
    * row mass in every bucket by construction.
    *
    * BINARY search, folded over the `bits` descending step sizes —
    * O(bits) element_at/compare evaluations per row instead of a
    * lambda fold over all `2^bits - 1` cuts (measured ~8× the whole
    * layout cost at bits=8, and repartitionByRange evaluates the key
    * expression twice — range sampling + partitioning — doubling
    * whatever the bucket costs). The accumulator must stay a BOUND
    * LAMBDA VARIABLE: unrolling the same search as nested Column
    * `when`s duplicates the accumulator subtree at every step —
    * 2^bits expression blowup, measured 30× slower than even the
    * naive linear fold. */
  def quantileBucket(x: Column, cuts: Column, bits: Int): Column = {
    val steps = array((0 until bits).reverse.map(j => lit(1L << j)): _*)
    val searched = aggregate(steps, lit(0L), (b, step) => {
      val cand = b + step
      when(element_at(cuts, cand.cast("int")) <= x.cast("double"), cand)
        .otherwise(b)
    })
    when(x.isNull || cuts.isNull, lit(null).cast("long"))
      .otherwise(searched)
  }

  /** [[clusterByZ]] with quantile cutpoints instead of linear min/max
    * buckets — the skew-robust layout. One `approx_percentile`
    * aggregate (mergeable sketch, one shuffle of sketch states)
    * produces each column's `2^bits - 1` cuts; bucketing is then a
    * per-row scan of the broadcast cut array. Use when any clustered
    * column is heavy-tailed; for roughly uniform columns the linear
    * form is the same layout minus the sketch pass. The default
    * `accuracy` (2000) is sized to the layout's needs: bucket edges
    * only need ~1/2^bits resolution, and sketch QUERY cost scales with
    * accuracy × cuts — a constant, but one worth keeping small. */
  def clusterByZQuantile(df: DataFrame, cols: Seq[String], bits: Int = 8,
      numPartitions: Int = 0, accuracy: Int = 2000): DataFrame = {
    require(cols.nonEmpty, "clusterByZQuantile needs at least one column")
    reserveAliases(df, cols.map(c => s"__cuts_$c"))
    val nBuckets = 1 << bits
    val pcts = array((1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets)): _*)
    val bounds = df.agg(
      approx_percentile(col(cols.head).cast("double"), pcts,
        lit(accuracy)).as(s"__cuts_${cols.head}"),
      cols.tail.map(c => approx_percentile(col(c).cast("double"), pcts,
        lit(accuracy)).as(s"__cuts_$c")): _*)
    val buckets = cols.map(c =>
      quantileBucket(col(c), col(s"__cuts_$c"), bits))
    zLayout(df, bounds, buckets, bits, numPartitions)
  }

  /** Fail fast when an input column collides with a generated bounds
    * alias — the broadcast cross-join would otherwise yield two
    * identically-named columns and die with an ambiguous-reference
    * AnalysisException deep inside the plan (same fail-loud contract
    * as the temporal joins' reserved names). */
  private def reserveAliases(df: DataFrame, aliases: Seq[String]): Unit = {
    val clash = df.columns.toSeq.intersect(aliases)
    require(clash.isEmpty,
      s"z-order: column names ${clash.mkString(", ")} are reserved " +
        "for the internal bounds row — rename them before clustering")
  }

  /** Shared layout tail: broadcast the bounds row, z-interleave,
    * range-partition and sort on the curve key, drop it. NULL rows
    * (z = -1) range to the front — few files, prunable. */
  private def zLayout(df: DataFrame, bounds: DataFrame,
      buckets: Seq[Column], bits: Int, numPartitions: Int): DataFrame = {
    val Z = "__zv"
    require(!df.columns.contains(Z), s"column name $Z is reserved")
    val withZ = df.crossJoin(broadcast(bounds))
      .withColumn(Z, coalesce(zValue(buckets, bits), lit(-1L)))
      .select(df.columns.map(col) :+ col(Z): _*)
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col(Z))
      else withZ.repartitionByRange(col(Z))
    parted.sortWithinPartitions(col(Z)).drop(Z)
  }
}
