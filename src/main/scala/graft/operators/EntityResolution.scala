package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution: group rows whose key strings are within edit
  * distance `k` of each other — TRANSITIVELY (a↔b and b↔c puts a and c
  * in one entity even when ed(a,c) > k, the classic hub-and-variants
  * shape of typo'd duplicates) — and pick one canonical row per
  * entity.
  *
  * Composition of three already-proven distributed pieces, no new
  * join shapes:
  *  1. [[FuzzyJoin.selfJoin]] — exact ed<=k pairs via the rarest-gram
  *     prefix filter (never all-pairs);
  *  2. connected components over the pair graph — [[LlmText.ccStars]]
  *     star contraction by default (O(log n) rounds on ANY topology,
  *     each round two shuffles over the shrinking edge list);
  *     [[LlmText.clustersFromPairs]] min-label propagation on request
  *     (O(diameter) rounds — fine for shallow hub-and-variants typo
  *     clusters, unbounded on chain-shaped components such as
  *     pairwise-adjacent revision strings, which is why stars is the
  *     default: the 10× radius-2 probe spent most of its time in
  *     propagation across a chain-heavy fixture);
  *  3. survivorship — the min-id member is the entity's canonical
  *     row, attached with one equi-join against the (cluster-count
  *     sized, AQE-broadcastable) representative frame.
  *
  * Cite: generic engine capability (master-data reconciliation the
  * reference does by exact key only, ref/App/etl/transform/
  * mes_etl.py:194 brandcode resolution).
  */
object EntityResolution {

  /** Resolve `df` rows into entities by `strCol` similarity.
    * Returns `(idCol, entity_id, canonical)` — `entity_id` is the
    * minimum id in the row's connected component, `canonical` that
    * row's string. NULL ids/strings are dropped (as in the underlying
    * fuzzy join — no distance to NULL). `clustering` picks the
    * connected-components engine: `"stars"` (default — round count
    * logarithmic on any topology) or `"propagation"` (min-label;
    * rounds = component diameter). Both emit the component minimum,
    * so the output is identical by construction — the gate runs the
    * default against the same reachability oracle that proved
    * propagation. */
  def resolve(df: DataFrame, idCol: String, strCol: String, k: Int,
      q: Int = 3, clustering: String = "stars"): DataFrame = {
    require(clustering == "stars" || clustering == "propagation",
      s"resolve: clustering must be stars|propagation, got $clustering")
    val base = df
      .filter(col(idCol).isNotNull && col(strCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(strCol).as("__str"))
    // Collapse IDENTICAL strings to one vertex first (representative =
    // min id): edit distance is a function of the VALUE, so m copies
    // of a string contribute m² candidate verifies and m² output pairs
    // to the similarity join while adding nothing to the clustering —
    // on dup-heavy corpora the join works on distinct values and the
    // copies rejoin by exact key at the end (round-13; the r12 shape
    // fed every row through the join).
    val values = CacheScope.pin(base.groupBy(col("__str"))
      .agg(min(col("doc_id")).as("vid")))
    // k<=2 (the dominant ER cases) take the deletion-neighborhood
    // paths: exact same pair set, but blocking that cannot saturate on
    // short dense key spaces the way a fixed q-gram vocabulary does
    val pairs =
      if (k == 1) FuzzyJoin.selfJoin1(values, "vid", "__str")
      else if (k == 2) FuzzyJoin.selfJoin2(values, "vid", "__str")
      else FuzzyJoin.selfJoin(values, "vid", "__str", k, q)
    // cluster the VALUE graph; the component minimum over
    // representative ids is the global min id of the component because
    // each representative is already the min of its copy group
    val clusters =
      if (clustering == "stars") {
        // ccStars covers only nodes appearing in pairs; singleton
        // values are their own entity (same completion as
        // dedupClustersStar)
        val stars = LlmText.ccStars(pairs.select(col("id_a"), col("id_b")))
          .select(col("doc_id").as("vid"), col("cluster_id").as("__m"))
        values.select(col("vid")).join(stars, Seq("vid"), "left")
          .select(col("vid"),
            coalesce(col("__m"), col("vid")).as("entity_id"))
      } else LlmText.clustersFromPairs(
        pairs.select(col("id_a"), col("id_b")),
        values.select(col("vid").as("doc_id")))
        .select(col("doc_id").as("vid"),
          col("cluster_id").as("entity_id"))
    val canon = base.select(col("doc_id").as("entity_id"),
      col("__str").as("canonical"))
    base.join(values, Seq("__str"))
      .join(clusters, Seq("vid"))
      .select(col("doc_id").as(idCol), col("entity_id"))
      .join(canon, Seq("entity_id"))
      .select(col(idCol), col("entity_id"), col("canonical"))
  }
}
