package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffled equi-join sends every row of a key to ONE reducer; a hot
  * key (one line producing half the events, one domain producing half
  * the documents) turns that reducer into the straggler that bounds the
  * whole stage. AQE's skew-join split repairs this for sort-merge joins
  * it can observe at runtime, but not in Structured Streaming plans,
  * not under bucketed (exchange-free) layouts, and not when the skew
  * only materializes after upstream filters. Salting is the structural
  * fix: spread each key over `salts` sub-keys so the hot key's rows
  * land on `salts` reducers.
  *
  * `saltedEquiJoin(left, right, keys, salts)`:
  *  - left rows get `__salt = xxhash64(whole row) mod salts` —
  *    DETERMINISTIC (a `rand()` salt changes under task retry and
  *    breaks exactly-once sinks), and keyed off the full row so
  *    duplicate-heavy keys still spread. The hash covers every column
  *    of the frame AS PASSED, so PROJECT the left side down to the
  *    columns the query needs BEFORE salting — hashing an unpruned
  *    row pins every column into the scan and defeats parquet column
  *    pruning;
  *  - right rows replicate once per salt value (`explode(sequence)`),
  *    a `salts`× blowup of the SMALL side only — pick the side;
  *  - the join runs on `keys :+ __salt`, so each (l, r) pair meets
  *    exactly once and the result is ROW-IDENTICAL to the unsalted
  *    join (inner and left_outer both; null keys behave as in the
  *    plain join since the salt never makes a null key match).
  *
  * This composes with everything downstream — the output carries no
  * salt column. Cost model: use when the hot key's row count ≫
  * rows/reducer and the right side is too big to broadcast but small
  * enough to replicate `salts`×.
  */
object SkewJoin {

  val SaltCol = "__salt"

  /** Deterministic per-row salt in [0, salts). */
  private[graft] def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  /** Equi-join `left` ⋈ `right` on `keys`, with the skewed side's
    * shuffle spread over `salts` sub-partitions per key.
    *
    * Flavors and which side gets salted (= which side is assumed
    * hot, the other replicated `salts`×):
    *  - `inner` / `left` / `left_outer`: LEFT salted, right
    *    replicated — each left row's matches are complete within its
    *    salt, so left-outer nulls are exact;
    *  - `right` / `right_outer`: the symmetric shape — RIGHT salted,
    *    left replicated; each right row's matches are complete within
    *    its salt;
    *  - `full` / `full_outer` / `outer`: no single salting covers
    *    both sides' unmatched rows (whichever side is replicated
    *    would emit its unmatched rows once PER SALT), so full runs
    *    TWO salted passes — the left-outer pass plus the right-only
    *    rows of a right-outer pass (detected via a presence tag, not
    *    via nullness, so legitimately-NULL left attributes can't be
    *    mistaken for "unmatched") — 2× the join work, still
    *    straggler-free. */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    joinType match {
      case "inner" | "left" | "left_outer" =>
        val l = left.withColumn(SaltCol, rowSalt(left, salts))
        val r = right.withColumn(SaltCol,
          explode(sequence(lit(0L), lit(salts.toLong - 1L))))
        l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
      case "right" | "right_outer" =>
        val l = left.withColumn(SaltCol,
          explode(sequence(lit(0L), lit(salts.toLong - 1L))))
        val r = right.withColumn(SaltCol, rowSalt(right, salts))
        l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
      case "full" | "full_outer" | "outer" =>
        val tag = "__left_present"
        require(!(left.columns ++ right.columns).contains(tag),
          s"column name $tag is reserved for internal use")
        val tagged = left.withColumn(tag, lit(true))
        val leftPass =
          saltedEquiJoin(tagged, right, keys, salts, "left").drop(tag)
        val rightOnly =
          saltedEquiJoin(tagged, right, keys, salts, "right")
            .filter(col(tag).isNull).drop(tag)
        leftPass.unionByName(rightOnly)
      case other =>
        throw new IllegalArgumentException(
          s"saltedEquiJoin supports inner/left/right/full joins, got $other")
    }
  }
}
