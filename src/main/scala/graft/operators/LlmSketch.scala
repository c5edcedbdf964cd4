package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min Sketch (Cormode & Muthukrishnan 2005) as a DataFrame
  * program — the point-query sibling of the Misra-Gries heavy-hitter
  * sketch ([[HeavyHitters]]): MG answers "which keys are frequent",
  * CMS answers "about how frequent is THIS key" for any key, in
  * `depth × width` counters regardless of corpus size, with the
  * one-sided guarantee `true <= est <= true + εN` (ε = e/width,
  * failure prob e^-depth).
  *
  * Shape: the corpus folds ONCE into the vocabulary-sized token-count
  * frame; each (token, n) feeds `depth` cells (an explode over the
  * row space of the sketch, NOT the corpus), and the cell table —
  * at most `depth × width` rows after the sum — is the sketch.
  * Estimation is an equi-join of probe keys to cells on (row, bucket)
  * + a min over rows. Everything shuffles counter-sized frames; the
  * sketch itself is broadcastable by construction.
  *
  * Cross-engine determinism: buckets come from the md5-hex-prefix
  * integer idiom ([[LlmPrep.splitAssign]]) — the one hash family both
  * Spark and DuckDB produce bit-identically — so the DuckDB twin
  * replays the exact sketch, not a statistical cousin.
  *
  * Cite: generic LLM-pipeline capability (token/domain frequency
  * estimation over corpora too large to count exactly per key; no
  * counterpart in the reference ETL).
  */
object LlmSketch {

  val CmsDepth = 4
  val CmsWidth = 1024
  /** Probe threshold for the gate query: estimate every token whose
    * exact count reaches this (keeps the gate output stable and the
    * exact-count side cheap at any SF). */
  val CmsMinTrue = 200L

  /** Bucket of `tok` in sketch row `d`: first 8 md5 hex chars of
    * "d:tok" as an integer, mod `width`. */
  private[graft] def bucketOf(d: Column, tok: Column, width: Int): Column =
    conv(substring(md5(concat(d.cast("string"), lit(":"), tok)), 1, 8),
      16, 10).cast("long") % width

  /** Vocabulary-sized exact token counts — the single corpus scan. */
  private[graft] def tokenCounts(documents: DataFrame, textCol: String)
      : DataFrame = documents
    .select(explode(call_function("graft_tokens", col(textCol)))
      .as("tok"))
    .groupBy(col("tok")).agg(count(lit(1)).as("n"))

  /** The sketch: `(d, bucket, cnt)`, at most depth×width rows. */
  def cmsCells(counts: DataFrame, depth: Int = CmsDepth,
      width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && width >= 2,
      s"cms: depth >= 1 and width >= 2, got $depth x $width")
    counts
      .select(col("tok"), col("n"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(col("d"), bucketOf(col("d"), col("tok"), width).as("bucket"))
      .agg(sum(col("n")).as("cnt"))
  }

  /** Point estimates for every token with exact count >= `minTrue`:
    * `(tok, true_n, est)` with `est >= true_n` guaranteed (collisions
    * only ever ADD counts). Ordered by token for the gate. */
  def cmsEstimates(documents: DataFrame, textCol: String = "text",
      depth: Int = CmsDepth, width: Int = CmsWidth,
      minTrue: Long = CmsMinTrue): DataFrame = {
    val tc = CacheScope.pin(tokenCounts(documents, textCol))
    val cells = cmsCells(tc, depth, width)
    tc.filter(col("n") >= minTrue)
      .select(col("tok"), col("n").as("true_n"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", bucketOf(col("d"), col("tok"), width))
      .join(cells, Seq("d", "bucket"))
      .groupBy(col("tok"), col("true_n"))
      .agg(min(col("cnt")).as("est"))
      .orderBy(col("tok"))
  }
}

/** DuckDB twin of [[LlmSketch]] — same md5-prefix buckets, same
  * depth/width, same min-over-rows estimate. */
object LlmSketchSql {

  import LlmSketch._

  val cmsSql: String =
    s"""WITH tk AS (SELECT
      list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        AS toks
    FROM documents),
  tc AS MATERIALIZED (SELECT t AS tok, count(*) AS n
    FROM (SELECT unnest(toks) AS t FROM tk) GROUP BY 1),
  dd AS (SELECT CAST(r.d AS BIGINT) AS d FROM range(0, $CmsDepth) r(d)),
  cell AS MATERIALIZED (SELECT d,
      CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || tok), 1, 8)
        AS BIGINT) % $CmsWidth AS bucket,
      CAST(sum(n) AS BIGINT) AS cnt
    FROM tc, dd GROUP BY 1, 2),
  pr AS (SELECT tok, n,
      d,
      CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || tok), 1, 8)
        AS BIGINT) % $CmsWidth AS bucket
    FROM tc, dd WHERE n >= $CmsMinTrue)
  SELECT pr.tok, CAST(pr.n AS BIGINT) AS true_n,
    CAST(min(cell.cnt) AS BIGINT) AS est
  FROM pr JOIN cell ON pr.d = cell.d AND pr.bucket = cell.bucket
  GROUP BY 1, 2
  ORDER BY tok"""
}
