package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a key space too large to `groupBy` — the
  * curation shape behind frequent-n-gram / spam-template / hot-domain
  * mining at corpus scale. Reference-free (the reference's tally
  * passes all run over bounded key spaces); this is the
  * unbounded-key form a 100 TB corpus needs.
  *
  * Two passes over the input, neither of which shuffles the full key
  * space:
  *
  *  1. sketch pass — `graft_mg_agg` ([[graft.functions.MisraGriesAgg]])
  *     folds every row into a `capacity`-counter Misra-Gries sketch;
  *     only KB-sized partials shuffle (vs a full exchange of every
  *     distinct key in a `groupBy`). The MG containment guarantee —
  *     any key with true frequency > n/(capacity+1) is present in the
  *     sketch — makes the surviving counter set a provably COMPLETE
  *     candidate set for any threshold above that bound.
  *  2. exact pass — re-scan filtered to the candidate hashes (an
  *     `InSet` probe for small candidate sets, a broadcast left-semi
  *     join above [[InSetMax]]), then an exact `groupBy` over only the
  *     candidate rows. The group-by key space is now ≤ capacity keys
  *     (plus hash-collision strays), so the exchange is bounded by
  *     construction.
  *
  * The result is EXACT — identical to `GROUP BY key HAVING count(*) >=
  * minFreq` — because the guarantee is checked, not assumed: if the
  * requested threshold is not above the sketch's error bound
  * (`minFreq * (capacity+1) > n` fails), the call throws with the
  * capacity that would suffice rather than return a silently
  * incomplete answer.
  *
  * Keys are folded as `xxhash64(key)` so any key type works (tokens,
  * domains, n-grams). A hash collision only ever MERGES two keys'
  * sketch counters — an overcount — so containment survives; the
  * exact second pass groups by the real key and removes any stray
  * collision partners below the threshold.
  *
  * NULL keys are skipped by the sketch (see [[graft.functions
  * .MisraGriesAgg]]) and excluded from the exact pass for symmetry —
  * NULL is not a reportable heavy hitter.
  *
  * Scale: the input is scanned twice (no caching imposed here — at
  * 100 TB you re-scan, locally a caller can pin). Pass-1 state is
  * O(capacity) per task; pass-2 exchanges ≤ capacity keys.
  */
object HeavyHitters {

  /** Candidate sets larger than this probe via a broadcast left-semi
    * join instead of an `InSet` literal: a multi-100k-element set
    * embedded in the expression tree re-serializes with every task. */
  val InSetMax = 65536

  /** Exact `(key, cnt)` for every key with frequency >= `minFreq`.
    *
    * @param capacity sketch counters; the guarantee needs
    *   `minFreq > n/(capacity+1)` where n = non-NULL input rows —
    *   checked after the sketch pass, throws with the sufficient
    *   capacity if violated. */
  def exact(df: DataFrame, key: Column, minFreq: Long, capacity: Int)
      : DataFrame = {
    require(minFreq >= 1, s"heavyHitters: minFreq must be >= 1, got $minFreq")
    val (counts, n) = sketch(df, key, capacity)
    require(minFreq * (capacity + 1L) > n,
      s"heavyHitters: threshold $minFreq is not above the sketch error " +
        s"bound n/(capacity+1) = $n/${capacity + 1} — a key below the " +
        "bound can be evicted, so completeness would be silently lost; " +
        s"use capacity >= ${(n / minFreq).toInt + 1}")
    secondPass(df, key, candidates(counts, n, capacity, minFreq), minFreq)
  }

  /** Exact `(key, cnt)` for every key with frequency >=
    * `ceil(minFrac * n)` — the scale-relative ("frequency above φn")
    * form, whose guarantee `minFrac > 1/(capacity+1)` is checkable
    * BEFORE seeing the data, so one (minFrac, capacity) pair is valid
    * at every corpus size. */
  def exactFraction(df: DataFrame, key: Column, minFrac: Double,
      capacity: Int): DataFrame = {
    require(minFrac > 0 && minFrac < 1,
      s"heavyHitters: minFrac must be in (0, 1), got $minFrac")
    require(minFrac * (capacity + 1L) > 1.0,
      s"heavyHitters: minFrac $minFrac is not above 1/(capacity+1) = " +
        s"1/${capacity + 1}; use capacity >= ${(1.0 / minFrac).toInt + 1}")
    val (counts, n) = sketch(df, key, capacity)
    if (n == 0L) return secondPass(df, key, Seq.empty, 1L)
    val minFreq = math.ceil(minFrac * n).toLong
    secondPass(df, key, candidates(counts, n, capacity, minFreq), minFreq)
  }

  /** Sketch pass: one aggregate, one row to the driver (≤ capacity
    * counters + n — a bounded scalar probe, not a collect of data). */
  private def sketch(df: DataFrame, key: Column, capacity: Int)
      : (Map[Long, Long], Long) = {
    val row = df
      .select(call_function("graft_mg_agg", xxhash64(key), lit(capacity))
        .as("sk"))
      .select(col("sk.counts"), col("sk.n"))
      .head()
    (row.getMap[Long, Long](0).toMap, row.getLong(1))
  }

  /** Sketch counters that could still reach `minFreq`: MG bounds the
    * true count by `est <= true <= est + n/(capacity+1)`, so counters
    * with `est + n/(capacity+1) < minFreq` are provably below the
    * threshold and skipped before the exact pass. */
  private def candidates(counts: Map[Long, Long], n: Long, capacity: Int,
      minFreq: Long): Seq[Long] = {
    val err = n / (capacity + 1L)
    counts.collect { case (h, est) if est + err >= minFreq => h }.toSeq
  }

  private def secondPass(df: DataFrame, key: Column, hashes: Seq[Long],
      minFreq: Long): DataFrame = {
    val exact = df.filter(key.isNotNull)
    val probed =
      if (hashes.isEmpty) exact.filter(lit(false))
      else if (hashes.size <= InSetMax)
        exact.filter(xxhash64(key).isInCollection(hashes))
      else {
        val spark = df.sparkSession
        import spark.implicits._
        exact.join(broadcast(hashes.toDF("__hh_hash")),
          xxhash64(key) === col("__hh_hash"), "left_semi")
      }
    probed.groupBy(key).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
  }

  /** Per-group exact heavy hitters: for every group, every key whose
    * in-group frequency is >= `ceil(minFrac * n_group)` — the
    * per-domain / per-language form of [[exactFraction]] (hot tokens
    * per source, spam templates per domain).
    *
    * Unlike the global form, NOTHING is driver-materialized: the
    * per-group sketches (one `graft_mg_agg` row per group) stay a
    * DataFrame, candidate counters explode out of the sketch map and
    * equi-join back against the input on `(group, xxhash64(key))`, and
    * the exact re-count groups only candidate rows — ≤ capacity keys
    * per group by construction. The fraction form's guarantee
    * (`minFrac > 1/(capacity+1)`) is data-independent, so one
    * (minFrac, capacity) pair is valid for every group at every size
    * and the check happens before any job runs.
    *
    * The candidate join duplicates no rows (sketch map keys are unique
    * per group, and a key hashes to exactly one counter), so the
    * post-join count IS the true in-group frequency. Hash collisions
    * only merge counters in the sketch (overcount ⇒ containment
    * survives); the exact pass groups by the real key and filters by
    * the true per-group threshold, removing any collision stray.
    *
    * NULL keys are skipped by the sketch and excluded here for
    * symmetry; NULL groups are excluded up front (no group to report
    * against). Output: `group, key, cnt`. */
  def exactFractionByGroup(df: DataFrame, groupCol: String, key: Column,
      minFrac: Double, capacity: Int): DataFrame = {
    require(minFrac > 0 && minFrac < 1,
      s"heavyHitters: minFrac must be in (0, 1), got $minFrac")
    require(minFrac * (capacity + 1L) > 1.0,
      s"heavyHitters: minFrac $minFrac is not above 1/(capacity+1) = " +
        s"1/${capacity + 1}; use capacity >= ${(1.0 / minFrac).toInt + 1}")
    val in = df.filter(col(groupCol).isNotNull)
    val sk = in
      .groupBy(col(groupCol))
      .agg(call_function("graft_mg_agg", xxhash64(key), lit(capacity))
        .as("sk"))
      .select(col(groupCol), col("sk.counts").as("__counts"),
        col("sk.n").as("__n"),
        ceil(lit(minFrac) * col("sk.n")).cast("long").as("__min"))
    // counters that could still reach the group threshold:
    // est + floor(n/(capacity+1)) >= ceil(minFrac * n)
    val cand = sk
      .select(col(groupCol).as("__g"), col("__min"),
        explode(col("__counts")).as(Seq("__h", "__est")),
        (col("__n") / lit(capacity + 1L)).cast("long").as("__err"))
      .filter(col("__est") + col("__err") >= col("__min"))
      .select(col("__g"), col("__h"), col("__min"))
    val rows = in.filter(key.isNotNull)
      .select(col(groupCol).as("__g0"), key.as("key"),
        xxhash64(key).as("__h0"))
    rows.join(cand,
        col("__g0") === col("__g") && col("__h0") === col("__h"))
      .groupBy(col("__g0"), col("key"))
      .agg(count(lit(1)).as("cnt"), max(col("__min")).as("__m"))
      .filter(col("cnt") >= col("__m"))
      .select(col("__g0").as(groupCol), col("key"), col("cnt"))
  }
}
