package graft

import org.apache.spark.sql.functions._

/** Differential proof that the native graft_minhash kernel equals the
  * composable per-hash transform chain on random shingle sets. */
class MinHashSigSpec extends GraftSuite {
  import spark.implicits._

  test("kernel signature equals the per-hash md5 min chain") {
    val rnd = new scala.util.Random(99)
    val words = Vector("a", "bb", "ccc", "Ée", "中文", "x y", "")
    val rows = (0 until 100).map { i =>
      (i.toLong, (0 until 1 + rnd.nextInt(12)).map(_ =>
        words(rnd.nextInt(words.size))))
    }
    val df = rows.toDF("doc_id", "shingles")
    val numHashes = 8
    val chain = (0 until numHashes).map(i =>
      array_min(transform(col("shingles"),
        s => md5(concat(lit(s"$i:"), s)))).as(s"w$i"))
    val both = df.select(
      col("doc_id") +:
        (0 until numHashes).map(i => element_at(
          call_function("graft_minhash", col("shingles"), lit(numHashes)),
          i + 1).as(s"g$i")) ++: chain: _*)
    val bad = both.filter((0 until numHashes).map(i =>
      not(col(s"g$i") === col(s"w$i"))).reduce(_ || _)).collect()
    assert(bad.isEmpty, bad.take(2).mkString("; "))
  }

  test("null elements are skipped, matching the chain's array_min") {
    val df = Seq(
      (1L, Seq(Option("a"), None, Option("bb"))),
      (2L, Seq(Option.empty[String], None))) // all-null → null signature
      .toDF("doc_id", "shingles")
    val chain = (0 until 4).map(i =>
      array_min(transform(col("shingles"),
        s => md5(concat(lit(s"$i:"), s)))).as(s"w$i"))
    val rows = df.select(
      col("doc_id") +:
        call_function("graft_minhash", col("shingles"), lit(4)).as("sig")
        +: chain: _*).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    (0 until 4).foreach(i =>
      assert(r1.getSeq[String](1)(i) == r1.getString(2 + i)))
    val r2 = rows.find(_.getLong(0) == 2L).get
    assert(r2.isNullAt(1), "all-null shingles → null signature")
    assert(r2.isNullAt(2), "chain agrees: array_min over all-nulls")
  }

  test("empty shingle array yields null, like array_min over empty") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a b c")))
      .toDF("doc_id", "shingles")
    val out = df.select(col("doc_id"),
      call_function("graft_minhash", col("shingles"), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }
}
