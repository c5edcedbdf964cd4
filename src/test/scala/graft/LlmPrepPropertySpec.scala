package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.LlmPrep

/** Differential tests: each LlmPrep operator vs an independent
  * single-threaded Scala computation of the same quantity, on random
  * (fixed-seed) corpora drawn from a TINY vocabulary so gram
  * collisions, df-cap hits, stratum overflows and bin boundaries occur
  * often. */
class LlmPrepPropertySpec extends GraftSuite {

  private val vocab = Vector("a", "b", "c", "dd", "ee")

  private val genDoc: Gen[String] =
    Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))

  /** (doc_id, text) corpus; ids dense from 0 so the eval split and the
    * shard assignment both hit every residue. */
  private val genCorpus: Gen[Seq[(Long, String)]] =
    Gen.choose(6, 24).flatMap(n =>
      Gen.listOfN(n, genDoc).map(_.zipWithIndex.map {
        case (t, i) => (i.toLong, t)
      }))

  private def toks(t: String): Seq[String] =
    t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def grams(t: String, n: Int): Set[String] = {
    val ts = toks(t)
    if (ts.size < n) Set.empty
    else ts.sliding(n).map(_.mkString(" ")).toSet
  }

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "10").toInt

  private def corpus(i: Int): Seq[(Long, String)] =
    genCorpus(Gen.Parameters.default, Seed(2000L + i)).get

  test("contamination matches brute-force capped overlap counting") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val (evalMod, n, dfCap, minShared) = (4, 2, 2, 1)
      // brute force: distinct grams per doc, train df, capped postings,
      // pairwise shared counts
      val g = docs.map { case (id, t) => id -> grams(t, n) }.toMap
      val train = docs.filter(_._1 % evalMod != 0).map(_._1)
      val eval = docs.filter(_._1 % evalMod == 0).map(_._1)
      val df = train.flatMap(id => g(id)).groupBy(identity)
        .map { case (k, v) => k -> v.size }
      val expected = (for {
        e <- eval; t <- train
        shared = (g(e) intersect g(t)).count(gr => df(gr) <= dfCap)
        if shared >= minShared
      } yield (e, t) -> shared.toLong).toMap
      val got = LlmPrep.contamination(docs.toDF("doc_id", "text"),
        evalMod, n, dfCap, minShared).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"seed=${2000 + i} docs=$docs")
    }
  }

  test("pack matches a sequential per-shard fill simulation") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      val (budget, nShards) = (7, 3)
      val expected = docs.groupBy(_._1 % nShards).flatMap {
        case (_, ds) =>
          var off = 0L
          ds.sortBy(_._1).map { case (id, t) =>
            val o = off
            off += toks(t).size
            id -> ((o, o / budget))
          }
      }
      val got = LlmPrep.pack(docs.toDF("doc_id", "text"), budget, nShards)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("token_offset"), r.getAs[Long]("bin")))).toMap
      assert(got == expected, s"seed=${2000 + i} docs=$docs")
    }
  }

  test("stratified sample matches the md5-order top-cap per stratum") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(i)
      // stratum = text length parity, as a stand-in lang column
      val langed = docs.map { case (id, t) =>
        (id, if (toks(t).size % 2 == 0) "even" else "odd", t)
      }
      val cap = 3
      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      val expected = langed.groupBy(_._2).flatMap { case (_, ds) =>
        ds.sortBy { case (id, _, _) => (md5hex(id.toString), id) }
          .take(cap).map(_._1)
      }.toSet
      val got = LlmPrep.sampleStratified(
        langed.toDF("doc_id", "lang", "text"), cap)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == expected, s"seed=${2000 + i} docs=$langed")
    }
  }

  test("weighted sample matches the MessageDigest threshold rule") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (i <- 0 until nRuns) {
      val rnd = new scala.util.Random(3000 + i)
      val sources = Vector("s0", "s1", "s2", "s3")
      val docs = (0L until 50L).map(id =>
        (id, sources(rnd.nextInt(4)), s"t$id"))
      val rates = Seq("s0" -> rnd.nextDouble(), "s1" -> rnd.nextDouble())
      val dflt = rnd.nextDouble()
      val rateOf = rates.toMap
      val expected = docs.filter { case (id, src, _) =>
        md5hex(s"mix:$id").substring(0, 8) <
          graft.operators.LlmPrep.rateThreshold(
            rateOf.getOrElse(src, dflt))
      }.map(_._1).toSet
      val got = LlmPrep.sampleWeighted(
        docs.toDF("doc_id", "source", "text"), rates, dflt)
        .collect().map(_.getLong(0)).toSet
      assert(got == expected, s"seed=${3000 + i}")
    }
  }

  test("entropy matches direct Shannon computation") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      // zero-token docs included deliberately: they must surface with
      // 0.0 entropy, not vanish from the output
      val docs = corpus(i)
      def shannon(units: Seq[String]): Double = {
        val n = units.size.toDouble
        val h = -units.groupBy(identity).values
          .map(g => g.size / n * (math.log(g.size / n) / math.log(2))).sum
        math.rint(h * 1e6) / 1e6
      }
      def safe(units: Seq[String]): Double =
        if (units.isEmpty) 0.0 else shannon(units)
      val expected = docs.map { case (id, t) =>
        id -> ((safe(t.split("").filter(_.nonEmpty).toSeq),
          safe(toks(t))))
      }.toMap
      val got = LlmPrep.entropy(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Double]("char_entropy"),
            r.getAs[Double]("token_entropy")))).toMap
      // entropies are rounded to 6dp on both sides; compare at 1e-5 to
      // tolerate one-ulp differences in float sum order at the boundary
      assert(got.keySet == expected.keySet, s"seed=${2000 + i}")
      got.foreach { case (id, (ce, te)) =>
        assert(math.abs(ce - expected(id)._1) < 1e-5 &&
          math.abs(te - expected(id)._2) < 1e-5,
          s"seed=${2000 + i} doc=$id got=($ce,$te) want=${expected(id)}")
      }
    }
  }

  test("vocab rank/coverage match brute-force counting (headRanked)") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(100 + i)
      val k = 4
      val counts = docs.flatMap(d => toks(d._2)).groupBy(identity)
        .map { case (t, v) => t -> v.size.toLong }
      val total = counts.values.sum
      val ranked = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
      val expected = ranked.zipWithIndex.map { case ((t, n), idx) =>
        val cum = ranked.take(idx + 1).map(_._2).sum
        (t, n, (idx + 1).toLong,
          BigDecimal(cum.toDouble / total)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val out = LlmPrep.vocab(docs.toDF("doc_id", "text"), k = k)
        .select("token", "n", "rank", "coverage").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      assert(out.sortBy(_._3).toSeq === expected, s"seed=${2100 + i}")
    }
  }

  test("bpePairs matches brute-force adjacent-pair counting") {
    import spark.implicits._
    for (i <- 0 until nRuns) {
      val docs = corpus(200 + i)
      val k = 4
      val pairs = docs.flatMap { case (_, t) =>
        val ts = toks(t)
        if (ts.size < 2) Nil else ts.sliding(2).map(_.mkString(" ")).toList
      }
      val counts = pairs.groupBy(identity)
        .map { case (p, v) => p -> v.size.toLong }
      val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }
        .take(k).zipWithIndex
        .map { case ((p, n), idx) => (p, n, (idx + 1).toLong) }
      val out = LlmPrep.bpePairs(docs.toDF("doc_id", "text"), k = k)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.sortBy(_._3).toSeq === expected, s"seed=${2200 + i}")
    }
  }
}
