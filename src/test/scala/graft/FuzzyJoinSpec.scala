package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** [[FuzzyJoin]] contract: exact parity with the brute-force
  * levenshtein cross join — including the adversarial inputs the
  * prefix-filter theorem does NOT cover on its own (short strings,
  * repetitive strings), which must route through the poor branch. */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  /** Brute-force truth: all id_a < id_b pairs within distance k. */
  private def brute(df: DataFrame, k: Int): Set[(Long, Long, Long)] = {
    val rows = df.select(col("id"), col("s")).as[(Long, String)]
      .collect().toSeq
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      d = levDist(sa, sb) if d <= k
    } yield (ia, ib, d.toLong)).toSet
  }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def run(df: DataFrame, k: Int, q: Int = 3)
      : Set[(Long, Long, Long)] =
    FuzzyJoin.selfJoin(df, "id", "s", k, q)
      .as[(Long, Long, Long)].collect().toSet

  private def strings(ss: Seq[String]): DataFrame =
    ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")

  test("random small-alphabet strings ≡ brute force (k=1 and k=2)") {
    val rnd = new scala.util.Random(42)
    val df = strings((0 until 120).map { _ =>
      (0 until 6 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    })
    for (k <- Seq(1, 2))
      assert(run(df, k) == brute(df, k), s"mismatch at k=$k")
  }

  test("sequential-id names (ubiquitous shared prefix gram) ≡ brute") {
    val df = strings((0 until 150).map(i => f"Customer#$i%09d"))
    assert(run(df, 1) == brute(df, 1))
    assert(run(df, 2) == brute(df, 2))
  }

  test("short and repetitive strings take the poor branch and stay exact") {
    // "aaa" vs "aab" share ZERO distinct 3-grams at ed=1 — the pair the
    // prefix filter alone would silently lose.
    val df = strings(Seq("aaa", "aab", "aaaaaaa", "aaaaaab", "ab", "ac",
      "", "a", "xyzzyx", "xyzzyy"))
    for (k <- Seq(1, 2); q <- Seq(2, 3))
      assert(run(df, k, q) == brute(df, k), s"mismatch at k=$k q=$q")
  }

  test("no duplicate pairs across branches") {
    val df = strings(Seq("aaaa", "aaab", "abcdefgh", "abcdefgx", "aaba"))
    val out = FuzzyJoin.selfJoin(df, "id", "s", 2, 2)
    assert(out.count() == out.distinct().count())
  }

  test("NULL ids and strings are dropped") {
    val df = Seq((Some(1L), Some("abcdef")), (Some(2L), Some("abcdeg")),
      (Some(3L), Option.empty[String]), (Option.empty[Long], Some("abcdef")))
      .toDF("id", "s")
    assert(run(df, 1) == Set((1L, 2L, 1L)))
  }

  private def run1(df: DataFrame): Set[(Long, Long, Long)] =
    FuzzyJoin.selfJoin1(df, "id", "s").as[(Long, Long, Long)]
      .collect().toSet

  test("deletion-neighborhood k=1 ≡ brute on every adversarial class") {
    val rnd = new scala.util.Random(7)
    val random = strings((0 until 120).map { _ =>
      (0 until 4 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    })
    val dense = strings((0 until 150).map(i => f"E${(i % 40) * 11}%06d") ++
      Seq("", "a", "aa", "aaa", "aab", "ab", "ba"))
    val seqIds = strings((0 until 150).map(i => f"Customer#$i%09d"))
    for ((df, tag) <- Seq((random, "random"), (dense, "dense-codes"),
        (seqIds, "seq-ids")))
      assert(run1(df) == brute(df, 1), s"mismatch on $tag")
  }

  test("deletion-neighborhood k=1 ≡ gram-prefix k=1, incl. dup values") {
    val df = strings(Seq("dup", "dup", "dup", "dupe", "dupx",
      "other", "othex"))
    assert(run1(df) == run(df, 1))
    assert(run1(df) == brute(df, 1))
  }

  test("cross-table join1 ≡ brute cross levenshtein") {
    val rnd = new scala.util.Random(21)
    def word() = (0 until 4 + rnd.nextInt(5))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val left = strings((0 until 80).map(_ => word()))
    val rightRows = (0 until 80).map(i => (1000L + i, word()))
    val right = rightRows.toDF("id", "s")
    val got = FuzzyJoin.join1(left, "id", "s", right, "id", "s")
      .as[(Long, Long, Long)].collect().toSet
    val lrows = left.as[(Long, String)].collect()
    val exp = (for {
      (ia, sa) <- lrows; (ib, sb) <- rightRows
      d = levDist(sa, sb) if d <= 1
    } yield (ia, ib, d.toLong)).toSet
    assert(got == exp)
  }

  private def run2(df: DataFrame): Set[(Long, Long, Long)] =
    FuzzyJoin.selfJoin2(df, "id", "s").as[(Long, Long, Long)]
      .collect().toSet

  test("deletion-neighborhood k=2 ≡ brute on every adversarial class") {
    val rnd = new scala.util.Random(11)
    val random = strings((0 until 100).map { _ =>
      (0 until 4 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    })
    // dense fixed-alphabet code space: the q-gram path's documented
    // saturation case, which k=2 now routes around
    val dense = strings((0 until 140).map(i => f"E${(i % 40) * 11}%06d") ++
      Seq("", "a", "aa", "ab", "ba", "aaa", "abc", "cba"))
    val seqIds = strings((0 until 120).map(i => f"Customer#$i%09d"))
    for ((df, tag) <- Seq((random, "random"), (dense, "dense-codes"),
        (seqIds, "seq-ids")))
      assert(run2(df) == brute(df, 2), s"mismatch on $tag")
  }

  test("deletion-neighborhood k=2 ≡ gram-prefix k=2, incl. dup values") {
    val df = strings(Seq("dup", "dup", "dupee", "dupxy", "other",
      "othexy", "abcdefgh", "abcdexgh", "abxdexgh"))
    assert(run2(df) == run(df, 2))
    assert(run2(df) == brute(df, 2))
  }

  test("poor branch is shuffle-based: no BroadcastNestedLoopJoin") {
    // all-short strings force every row through the poor branch
    val df = strings(Seq("aa", "ab", "ba", "a", "b", "aaa", "aab",
      "bbb", "bab", ""))
    val out = FuzzyJoin.selfJoin(df, "id", "s", 2, 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(out.as[(Long, Long, Long)].collect().toSet == brute(df, 2))
  }

  test("dense-output regime at k=2 trips the guard; sparse doesn't") {
    // saturating key space: 2-char strings over {a,b,c} — every pair
    // is within 2 edits, so the TRUE output is quadratic and the
    // candidate bound blows past any ratio
    val dense = strings((for {
      a <- 'a' to 'c'; b <- 'a' to 'c' } yield s"$a$b").toSeq)
    val e = intercept[IllegalStateException] {
      FuzzyJoin.selfJoin2(dense, "id", "s",
        denseGuard = "error", denseRatio = 2.0, denseFloor = 1L)
    }
    assert(e.getMessage.contains("dense-output regime"))
    // warn (the default) computes the same answer as guard-off
    val warned = FuzzyJoin.selfJoin2(dense, "id", "s",
        denseRatio = 2.0, denseFloor = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(warned == brute(dense, 2))
    // sparse key space sails through an error-mode guard untouched
    val sparse = strings(Seq("alpha-one", "alpha-two", "beta-xyz",
      "gamma-longer", "delta-other"))
    val ok = FuzzyJoin.selfJoin2(sparse, "id", "s",
        denseGuard = "error", denseRatio = 2.0, denseFloor = 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(ok == brute(sparse, 2))
  }

  test("q-gram dense regime trips the selfJoin guard; sparse and " +
      "under-floor inputs sail through error mode; warn ≡ off") {
    // the documented q-gram failure mode: long strings over a binary
    // alphabet — 8 possible 3-grams total, so strings are RICH (> k*q
    // distinct grams, they route through the prefix filter) yet every
    // gram's df scales with rows and the candidate join squares
    val rnd = new scala.util.Random(7)
    val dense = strings((0 until 200).map(_ =>
      (0 until 14).map(_ => if (rnd.nextBoolean()) '1' else '0')
        .mkString))
    val e = intercept[IllegalStateException] {
      FuzzyJoin.selfJoin(dense, "id", "s", k = 2, q = 3,
        denseGuard = "error", denseRatio = 4.0, denseFloor = 100L)
    }
    assert(e.getMessage.contains("dense-output regime"))
    assert(e.getMessage.contains("raise q"))
    // warn (the default) still computes the exact answer
    val warned = FuzzyJoin.selfJoin(dense, "id", "s", k = 2, q = 3,
        denseRatio = 4.0, denseFloor = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(warned == brute(dense, 2))
    val off = FuzzyJoin.selfJoin(dense, "id", "s", k = 2, q = 3,
        denseGuard = "off")
      .as[(Long, Long, Long)].collect().toSet
    assert(warned == off, "warn ≡ off results")
    // rich-entropy strings pass an error-mode guard untripped
    val sparse = strings((0 until 150).map(i =>
      s"user-${i}-${(i * 2654435761L).toHexString}"))
    val ok = FuzzyJoin.selfJoin(sparse, "id", "s", k = 2, q = 3,
        denseGuard = "error", denseRatio = 4.0, denseFloor = 100L)
      .as[(Long, Long, Long)].collect().toSet
    assert(ok == brute(sparse, 2))
    // the absolute floor keeps small inputs from tripping even at a
    // punitive ratio
    val tiny = strings(Seq("001", "002", "003"))
    FuzzyJoin.selfJoin(tiny, "id", "s", k = 1, q = 3,
      denseGuard = "error", denseRatio = 0.001).count()
  }

  test("deletion-neighborhood drops NULLs like the gram path") {
    val df = Seq((Some(1L), Some("abcdef")), (Some(2L), Some("abcdeg")),
      (Some(3L), Option.empty[String]), (Option.empty[Long], Some("abcdef")))
      .toDF("id", "s")
    assert(run1(df) == Set((1L, 2L, 1L)))
  }
}
