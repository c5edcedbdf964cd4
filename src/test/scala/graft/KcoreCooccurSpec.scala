package graft

import org.apache.spark.sql.functions._

import graft.operators.ClassicQueries

/** Hand-computed fixtures for the round-14 graph/basket operators:
  * [[ClassicQueries.kcoreOf]] (peel correctness, chain-peels-to-empty,
  * early fixpoint inside the round cap) and
  * [[ClassicQueries.itemCooccur]]'s pair arithmetic via a brute-force
  * differential on the sf0.001 fixture. */
class KcoreCooccurSpec extends GraftSuite {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int = ClassicQueries.KCoreRounds): Map[Long, Long] =
    ClassicQueries.kcoreOf(edges.toDF("u", "v"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle + pendant: 2-core is the triangle, pendants peel") {
    // triangle 1-2-3, pendant 4 off 1, pendant chain 5-6 off 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (2L, 5L),
      (5L, 6L))
    assert(core(edges, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // 3-core is empty (max degree inside any subgraph is 2)
    assert(core(edges, 3) == Map.empty)
  }

  test("chain peels to empty at k=2 — one link per round from each " +
      "end, still inside the cap") {
    val chain = (1L until 20L).map(i => (i, i + 1))
    assert(core(chain, 2) == Map.empty)
    // k=1 keeps everything (every node has a neighbor)
    assert(core(chain, 1).keySet == (1L to 20L).toSet)
  }

  test("two 4-cliques sharing a node: 3-core keeps both cliques; " +
      "the shared node's core degree spans both") {
    def clique(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a < b } yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(4L, 5L, 6L, 7L))
    val got = core(edges, 3)
    assert(got.keySet == (1L to 7L).toSet)
    assert(got(4L) == 6L && got(1L) == 3L && got(7L) == 3L)
  }

  test("bfs: minimal hop distances from the %100 seeds, depth-capped, " +
      "unreachable components absent") {
    // chain off seed 0 (nodes 5,6 beyond the 4-hop cap), a seeded
    // island (200-201), and an unseeded island (50-51)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (200L, 201L), (50L, 51L),
      // a shortcut making node 3 reachable in 1 hop via 0-3
      (0L, 3L))
    val got = ClassicQueries.bfsOf(edges.toDF("u", "v"),
        ClassicQueries.BfsDepth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 3L -> 1L, 2L -> 2L,
      4L -> 2L, 5L -> 3L, 6L -> 4L, 200L -> 0L, 201L -> 1L))
  }

  test("itemsets3 ≡ brute force (the Apriori prune is lossless)") {
    val dir = "/root/testdata/sf0.001"
    val got = ClassicQueries.itemsets3(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val ui = graft.sources.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("props").isNotNull)
      .select(col("user_id"),
        expr("from_json(props, 'k BIGINT')").getField("k").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .as[(Long, Long)].collect()
    val byUser = ui.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toVector).toMap
    val cnt = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    byUser.values.foreach { items =>
      for {
        i <- items.indices; j <- (i + 1) until items.size
        l <- (j + 1) until items.size
      } {
        val k = (items(i), items(j), items(l))
        cnt(k) = cnt.getOrElse(k, 0L) + 1L
      }
    }
    val want = cnt.filter(_._2 >= ClassicQueries.CooccurMin).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture sanity: some frequent triples")
  }

  test("itemCooccur ≡ brute force on the fixture, jaccard included") {
    val dir = "/root/testdata/sf0.001"
    val got = ClassicQueries.itemCooccur(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3))))
      .toMap
    val ui = graft.sources.Tables.events(spark, dir)
      .filter(col("user_id").isNotNull && col("props").isNotNull)
      .select(col("user_id"),
        expr("from_json(props, 'k BIGINT')").getField("k").as("item"))
      .filter(col("item").isNotNull)
      .distinct()
      .as[(Long, Long)].collect()
    val byUser = ui.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nUsers = ui.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byUser.values.foreach { items =>
      for { a <- items; b <- items if a < b }
        co((a, b)) = co.getOrElse((a, b), 0L) + 1L
    }
    val want = co.filter(_._2 >= ClassicQueries.CooccurMin).map {
      case ((a, b), c) =>
        val j = c.toDouble / (nUsers(a) + nUsers(b) - c)
        (a, b) -> ((c, math.rint(j * 10000) / 10000))
    }.toMap
    assert(got.size == want.size && got.keySet == want.keySet)
    want.foreach { case (k, (c, j)) =>
      val (gc, gj) = got(k)
      assert(gc == c && math.abs(gj - j) < 1e-9, s"$k: $got vs $want")
    }
  }

  // --- MaxBasket hyperactive-user cap -------------------------------

  /** 12 normal users each holding items {1..6} minus one, plus (when
    * asked) one bot user holding items 1..50 — enough normal overlap
    * that every pair of {1..6} clears CooccurMin with or without the
    * bot. */
  private def uiFixture(withBot: Boolean) = {
    val normal = for {
      u <- 1L to 12L
      i <- 1L to 6L if i != (u % 6) + 1
    } yield (u, i)
    val bot = if (withBot) (1L to 50L).map(i => (99L, i)) else Seq.empty
    (normal ++ bot).toDF("user_id", "item")
  }

  test("basket cap: capped ≡ uncapped when every basket is under " +
      "the cap") {
    val ui = uiFixture(withBot = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(ClassicQueries.itemCooccurOf(ui, maxBasket = 10)) ==
      rows(ClassicQueries.itemCooccurOf(ui, maxBasket = 1000000)))
    assert(rows(ClassicQueries.itemsets3Of(ui, maxBasket = 10)) ==
      rows(ClassicQueries.itemsets3Of(ui, maxBasket = 1000000)))
    assert(ClassicQueries.itemCooccurOf(ui, maxBasket = 10)
      .count() > 0, "fixture sanity: some pairs clear the floor")
  }

  test("basket cap: a hyperactive user is dropped ENTIRELY — capped " +
      "run ≡ uncapped run on the corpus minus that user, jaccard " +
      "denominators included") {
    val withBot = uiFixture(withBot = true)
    val noBot = uiFixture(withBot = false)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    // cap 10: normal baskets (5 items) pass, the 50-item bot is dropped
    assert(rows(ClassicQueries.itemCooccurOf(withBot, maxBasket = 10)) ==
      rows(ClassicQueries.itemCooccurOf(noBot, maxBasket = 1000000)))
    assert(rows(ClassicQueries.itemsets3Of(withBot, maxBasket = 10)) ==
      rows(ClassicQueries.itemsets3Of(noBot, maxBasket = 1000000)))
    // sanity: uncapped, the bot inflates pair counts (its pairs differ)
    assert(rows(ClassicQueries.itemCooccurOf(withBot,
        maxBasket = 1000000)) !=
      rows(ClassicQueries.itemCooccurOf(noBot, maxBasket = 1000000)))
  }
}
