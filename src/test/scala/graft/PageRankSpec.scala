package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** [[PageRank]] contract: analytic fixpoints on hand graphs, the
  * dangling-leak convention, and parity with a single-threaded power
  * iteration on a random graph. */
class PageRankSpec extends GraftSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int = 10)
      : Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .as[(Long, Double)].collect().toMap

  test("symmetric cycle converges to uniform") {
    // 4-cycle: uniform 0.25 is the exact fixpoint from the uniform
    // start, every iteration reproduces it
    val r = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
  }

  test("sink absorbs: hub-and-spoke ranks the hub highest") {
    // the 1<->9 cycle oscillates with iteration parity; 40 rounds
    // decay the oscillation (0.85^40) well below the fixpoint gap
    val r = run(Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)), iters = 40)
    assert(r(9L) > r(1L) && r(1L) > r(2L))
    assert(math.abs(r(2L) - r(3L)) < 1e-12, "symmetric spokes tie")
  }

  test("dangling node keeps base rank and leaks mass (documented)") {
    // 1 -> 2, 2 has no out-edges: 2's mass evaporates
    val r = run(Seq((1L, 2L)))
    assert(math.abs(r(1L) - 0.075) < 1e-9) // (1-d)/N with N=2
    assert(r(2L) > r(1L))
    assert(r.values.sum < 1.0)
  }

  test("edges are never re-shuffled: no per-round Exchange on src") {
    // force shuffle joins (tiny frames would broadcast and hide the
    // partitioning question the assertion exists to answer)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (1 to 400).map(i =>
        ((i % 40).toLong, ((i * 7) % 40).toLong)).toDF("src", "dst")
      val p = PageRank.pin(edges)
      try {
        val ranks = p.nodes
          .select(col("node"), round(lit(1.0) / lit(p.n), 9).as("r"))
          .localCheckpoint(true)
        val top = PageRank.iterate(p, ranks, 0.85, 9, 0.0)
          .queryExecution.executedPlan
        // collect() stops at InMemoryTableScan leaves, so the one-time
        // cache-BUILD shuffles inside the pinned relations don't count
        // — only what this round would actually execute
        val root = top match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => a.executedPlan
          case o => o
        }
        val shuffles = root.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeLike => e
        }
        // the rank frame onto its join key + the groupBy(dst)
        // transpose — and NEITHER is a re-shuffle of the edge list
        assert(shuffles.size == 2,
          s"expected 2 shuffles (ranks, transpose), got " +
            s"${shuffles.map(_.outputPartitioning)}:\n$root")
        shuffles.foreach(e =>
          assert(!e.outputPartitioning.toString.contains("src#"),
            s"edge list re-shuffled on src:\n$root"))

        // broadcast shape (small node count): ONE shuffle — the
        // transpose — and the edge cache probed in place
        val bTop = PageRank.iterate(p, ranks, 0.85, 9, 0.0,
            broadcastRanks = true)
          .queryExecution.executedPlan
        val bRoot = bTop match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => a.executedPlan
          case o => o
        }
        val bShuffles = bRoot.collect {
          case e: org.apache.spark.sql.execution.exchange
              .ShuffleExchangeLike => e
        }
        assert(bShuffles.size == 1,
          s"expected the lone transpose shuffle, got " +
            s"${bShuffles.map(_.outputPartitioning)}:\n$bRoot")
        assert(!bShuffles.head.outputPartitioning.toString
          .contains("src#"), s"edge list re-shuffled on src:\n$bRoot")
      } finally p.release()
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("broadcast and co-partitioned round shapes are bit-identical") {
    val edges = (1 to 300).map(i =>
      ((i % 31).toLong, ((i * 11) % 31).toLong))
    val small = run(edges, iters = 6) // n=31 <= ceiling: broadcast path
    val big = PageRank.run(edges.toDF("src", "dst"), iters = 6,
        broadcastNodesMax = 0L) // force the co-partitioned path
      .as[(Long, Double)].collect().toMap
    assert(small == big)
  }

  test("reliable checkpoint path is bit-identical to localCheckpoint") {
    spark.sparkContext.setCheckpointDir("/tmp/graft_pr_ckpt")
    val edges = (1 to 200).map(i =>
      ((i % 23).toLong, ((i * 5) % 23).toLong))
    val a = run(edges, iters = 5)
    val b = PageRank.run(edges.toDF("src", "dst"), iters = 5,
        reliable = true)
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("dangling-mass redistribution conserves total rank ~ 1") {
    // node 2 and 4 dangle; without redistribution the sum decays
    val edges = Seq((1L, 2L), (3L, 4L), (5L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val r = PageRank.run(edges, iters = 15,
        redistributeDangling = true)
      .as[(Long, Double)].collect().toMap
    // 5 nodes × 1e-9 quantization per round × 15 rounds bounds drift
    assert(math.abs(r.values.sum - 1.0) < 1e-6,
      s"sum=${r.values.sum}")
    val leaky = run(Seq((1L, 2L), (3L, 4L), (5L, 1L), (1L, 4L)),
      iters = 15)
    assert(leaky.values.sum < 0.9, "control: leak convention decays")
  }

  test("parity with a single-threaded power iteration, random graph") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 400).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = run(edges, iters = 8)
    // reference with the SAME per-iteration quantization
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    def q(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    var r = nodes.map(_ -> q(1.0 / n)).toMap
    (1 to 8).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[Long, Double]
        .withDefaultValue(0.0)
      edges.foreach { case (s, d) => in(d) += r(s) / out(s) }
      r = nodes.map(v => v -> q((1.0 - 0.85) / n + 0.85 * in(v))).toMap
    }
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 2e-9,
        s"node $v: got ${got(v)} ref ${r(v)}")
    }
  }
}
