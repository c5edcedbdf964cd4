package graft

import org.apache.spark.sql.functions._

import graft.functions.MGBuffer
import graft.operators.HeavyHitters

/** Misra-Gries sketch contract (capacity bound, frequency bound,
  * containment, merge) plus the two-pass [[HeavyHitters]] operator's
  * exact-parity claim against a plain groupBy. */
class HeavyHittersSpec extends GraftSuite {
  import spark.implicits._

  /** Deterministic skewed stream: key k ∈ [0, keys) drawn with weight
    * ∝ 1/(k+1) (zipf-ish head). */
  private def stream(rows: Int, keys: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    val w = (0 until keys).map(k => 1.0 / (k + 1))
    val cum = w.scanLeft(0.0)(_ + _).tail
    val tot = cum.last
    (0 until rows).map { _ =>
      val x = rnd.nextDouble() * tot
      cum.indexWhere(x <= _).toLong
    }
  }

  private def freqs(s: Seq[Long]): Map[Long, Long] =
    s.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("MGBuffer capacity bound holds under distinct-key pressure " +
      "(the r11 unbounded-growth defect)") {
    val buf = new MGBuffer(2)
    (1L to 100L).foreach(buf.add)
    assert(buf.counts.size <= 2)
    assert(buf.n == 100L)
  }

  test("MGBuffer frequency bound and containment guarantee") {
    val cap = 50
    val s = stream(10000, 500, seed = 7)
    val buf = new MGBuffer(cap)
    s.foreach(buf.add)
    val exact = freqs(s)
    val err = s.size.toLong / (cap + 1)
    assert(buf.counts.size <= cap)
    // est <= true <= est + n/(cap+1) for every surviving counter
    buf.counts.foreachEntry { (k, est) =>
      val t = exact(k)
      assert(est <= t && t <= est + err, s"key $k: est=$est true=$t")
    }
    // any key with true freq > n/(cap+1) must be present
    exact.foreach { case (k, t) =>
      if (t > err) assert(buf.counts.contains(k), s"heavy key $k evicted")
    }
  }

  test("MGBuffer merge preserves capacity, n, and the combined bound") {
    val cap = 40
    val s = stream(8000, 300, seed = 13)
    val chunks = s.grouped(2000).toSeq
    val bufs = chunks.map { c =>
      val b = new MGBuffer(cap); c.foreach(b.add); b
    }
    // unbalanced merge tree: ((b0+b1)+b2)+b3
    val m = bufs.reduceLeft { (a, b) => a.mergeIn(b); a }
    val exact = freqs(s)
    val err = s.size.toLong / (cap + 1)
    assert(m.counts.size <= cap)
    assert(m.n == s.size.toLong)
    m.counts.foreachEntry { (k, est) =>
      val t = exact(k)
      assert(est <= t && t <= est + err, s"merged key $k: est=$est true=$t")
    }
    exact.foreach { case (k, t) =>
      if (t > err) assert(m.counts.contains(k), s"heavy key $k lost in merge")
    }
  }

  test("graft_mg_agg: distributed sketch honors the guarantee; NULL " +
      "keys skipped and excluded from n") {
    val s = stream(6000, 200, seed = 3)
    val df = (s.map(Option(_)) ++ Seq.fill(50)(Option.empty[Long]))
      .toDF("k").repartition(7) // force partial serialize/merge
    val cap = 64
    val row = df
      .select(call_function("graft_mg_agg", col("k"), lit(cap)).as("sk"))
      .select(col("sk.counts"), col("sk.n")).head()
    val counts = row.getMap[Long, Long](0).toMap
    val n = row.getLong(1)
    assert(n == s.size.toLong) // NULLs not folded
    assert(counts.size <= cap)
    val exact = freqs(s)
    val err = n / (cap + 1)
    counts.foreach { case (k, est) =>
      assert(est <= exact(k) && exact(k) <= est + err)
    }
    exact.foreach { case (k, t) =>
      if (t > err) assert(counts.contains(k))
    }
  }

  test("exact == plain groupBy HAVING, on a skewed corpus") {
    val s = stream(20000, 400, seed = 29)
    val df = s.toDF("k")
    val minFreq = 400L
    val cap = 64 // guarantee: 400 * 65 = 26000 > 20000
    val got = HeavyHitters.exact(df, col("k"), minFreq, cap)
      .as[(Long, Long)].collect().toSet
    val want = freqs(s).filter(_._2 >= minFreq).toSet
    assert(got == want)
    assert(want.nonEmpty) // the test must actually exercise hitters
  }

  test("exact refuses a threshold below the sketch error bound " +
      "instead of silently losing completeness") {
    val df = stream(5000, 100, seed = 5).toDF("k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, col("k"), minFreq = 10L, capacity = 16)
    }
    assert(e.getMessage.contains("capacity >="))
  }

  test("exactFraction: scale-relative threshold, string keys, empty " +
      "input") {
    val s = stream(10000, 300, seed = 11).map(k => s"tok$k")
    val df = s.toDF("k")
    val frac = 0.02
    val got = HeavyHitters.exactFraction(df, col("k"), frac, capacity = 128)
      .as[(String, Long)].collect().toSet
    val minFreq = math.ceil(frac * s.size).toLong
    val want = s.groupBy(identity)
      .collect { case (k, v) if v.size >= minFreq => k -> v.size.toLong }
      .toSet
    assert(got == want && want.nonEmpty)
    // empty input: no rows, no candidates, empty result (not a throw)
    val empty = HeavyHitters.exactFraction(
      Seq.empty[String].toDF("k"), col("k"), frac, capacity = 128)
    assert(empty.count() == 0)
  }


  test("grouped fraction form ≡ per-group exact groupBy/HAVING, " +
      "fully distributed") {
    val gA = stream(5000, 300, seed = 21).map(("A", _))
    val gB = stream(800, 40, seed = 22).map(("B", _))
    val gC = stream(12000, 800, seed = 23).map(("C", _))
    val frac = 0.01
    val cap = 256 // 0.01 > 1/257
    val df = scala.util.Random.shuffle(gA ++ gB ++ gC).toDF("g", "k")
      .repartition(7)
    val got = HeavyHitters
      .exactFractionByGroup(df, "g", col("k"), frac, cap)
      .as[(String, Long, Long)].collect().toSet
    val want = Seq(("A", gA), ("B", gB), ("C", gC)).flatMap {
      case (g, rows) =>
        val n = rows.size
        val minFreq = math.ceil(frac * n).toLong
        freqs(rows.map(_._2)).collect {
          case (k, c) if c >= minFreq => (g, k, c)
        }
    }.toSet
    assert(got == want)
    assert(want.nonEmpty && want.exists(_._1 == "B"))
  }

  test("grouped form rejects an unsatisfiable (minFrac, capacity) pair " +
      "before any job runs") {
    val df = Seq(("A", 1L)).toDF("g", "k")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.exactFractionByGroup(df, "g", col("k"), 0.001, 100)
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("grouped form excludes NULL groups and NULL keys") {
    val df = Seq((Option("A"), Option(1L)), (Option("A"), Option(1L)),
      (Option("A"), Option.empty[Long]), (Option.empty[String], Option(1L)))
      .toDF("g", "k")
    val got = HeavyHitters
      .exactFractionByGroup(df, "g", col("k"), 0.5, 16)
      .as[(String, Long, Long)].collect().toSet
    // group A: n = 2 non-NULL keys, threshold ceil(0.5*2) = 1 → key 1
    // twice; the NULL key and NULL group never appear
    assert(got == Set(("A", 1L, 2L)))
  }
}
