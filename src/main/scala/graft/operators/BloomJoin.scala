package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-pruned equi-join: shrink the probe (fact) side of a join
  * BEFORE its shuffle with a bloom filter built from the build (dim)
  * side's keys — the runtime-filter idiom behind star-schema joins at
  * corpus scale (Spark's own `InjectRuntimeFilter` plants the same
  * shape when it can prove it; this is the explicit operator form for
  * when the build side is an arbitrary pre-filtered frame the
  * optimizer can't see through, or the two sides come from different
  * systems).
  *
  * Why it matters at 100 TB: a fact⋈dim join where the dim is too big
  * to broadcast sort-merge-shuffles the ENTIRE fact table on the join
  * key — even when only 1% of fact rows have a partner. The bloom
  * (one aggregate row over the dim, megabytes) is planted as a scan-
  * side filter on the fact, so non-matching fact rows die at the
  * columnar scan and never reach the exchange. A bloom hit is only
  * "maybe" (false-positive rate), so the exact join still runs and
  * removes the strays — the composition's semantics are EXACTLY the
  * plain join's, because a bloom miss is a guaranteed non-member
  * (no false negatives over the hashed key).
  *
  * Mechanics shared with [[LlmPrep.blocklistFilter]] (the anti-join
  * direction of the same idiom): the filter is BUILT distributed
  * (`graft_bloom_agg`, map-side combined), its one-row binary result
  * collected as a bounded driver scalar and re-planted as a literal —
  * the same way Spark's runtime row-level filtering materializes its
  * subquery — because a scan-side filter must be a constant available
  * at plan time.
  *
  * NULL fact keys pass the bloom un-probed (`xxhash64` of NULL is the
  * seed, which may or may not hit) — irrelevant either way, the inner
  * equi-join drops them. An EMPTY build side aggregates to a NULL
  * bloom → the join is empty, returned directly with the joined
  * schema.
  *
  * Cite: composition pattern after the reference's filter-then-join
  * chains (ref/App/etl/transform/rco_filter.py:24 joins a pre-filtered
  * config frame into the fact log); the bloom pruning itself is the
  * scale re-expression Spark enables.
  */
object BloomJoin {

  /** `big ⋈ dim ON big(bigKey) = dim(dimKey)` (inner), with the big
    * side bloom-pruned before its exchange.
    *
    * @param expectedItems sizing hint for the bloom (distinct dim keys)
    * @param numBits       bloom bitset size; ~8 bits/item ≈ 2% FP rate
    */
  def inner(big: DataFrame, dim: DataFrame, bigKey: String, dimKey: String,
      expectedItems: Long = 100000L, numBits: Long = 800000L): DataFrame = {
    val bf = dim
      .agg(call_function("graft_bloom_agg", xxhash64(col(dimKey)),
        lit(expectedItems), lit(numBits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val pruned =
      if (bf == null) big.filter(lit(false)) // empty dim ⇒ empty inner join
      else big.filter(
        call_function("graft_might_contain", lit(bf), xxhash64(col(bigKey))))
    pruned.join(dim, col(bigKey) === col(dimKey))
  }
}
