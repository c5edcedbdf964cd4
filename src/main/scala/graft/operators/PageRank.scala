package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank (Brin & Page 1998) — the canonical
  * iterative-join analytics shape: each round is
  * `ranks ⋈ edges → groupBy(dst) → sum` (a map-side-combinable
  * aggregate over the edge list), `r' = (1-d)/N + d·Σ r/outdeg`, with
  * the rank vector quantized to `scale` decimals EVERY round so the
  * result is independent of float summation order — the property that
  * makes a cross-engine oracle possible at all (and, at cluster
  * scale, makes reruns bit-reproducible regardless of partitioning).
  *
  * Dangling nodes (no out-edges) leak their mass — deliberately NOT
  * redistributed: redistribution needs a per-round global scalar
  * (one more driver round-trip per iteration) and changes nothing
  * about the join/aggregate shape this operator exists to provide;
  * both the spec reference and the SQL twin use the same convention.
  *
  * Scale: the rank frame is node-sized, edges are scanned once per
  * round (the classic Pregel-style cost), lineage is cut per round
  * with localCheckpoint. Iteration count is a hyperparameter bounded
  * by construction, same driver-loop contract as [[BpeTrain]].
  *
  * Cite: generic engine capability; no counterpart in the reference.
  */
object PageRank {

  /** Run `iters` rounds over `edges` (columns `src`, `dst`;
    * multi-edges count multiply, NULL endpoints dropped). Returns
    * `(node, rank)` for every node appearing as src or dst. */
  def run(edges: DataFrame, iters: Int = 10, damping: Double = 0.85,
      scale: Int = 9): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1,
      s"pageRank: damping in (0,1), got $damping")
    val e = edges
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("od"))
      .localCheckpoint(true)
    // N is a bounded one-row probe (the sanctioned scalar shape)
    val n = nodes.count().toDouble
    val base = lit((1.0 - damping) / n)

    var ranks = nodes.select(col("node"),
      round(lit(1.0) / lit(n), scale).as("r")).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      val contrib = ranks
        .join(outdeg, ranks("node") === outdeg("src"))
        .join(e, Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("r") / col("od")).as("c"))
      val next = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          round(base + lit(damping) * coalesce(col("c"), lit(0.0)),
            scale).as("r"))
        .localCheckpoint(true)
      ranks.unpersist()
      ranks = next
    }
    ranks.select(col("node"), col("r").as("rank"))
  }
}
