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

  test("empty shingle array yields null, like array_min over empty") {
    val df = Seq((1L, Seq.empty[String]), (2L, Seq("a b c")))
      .toDF("doc_id", "shingles")
    val out = df.select(col("doc_id"),
      call_function("graft_minhash", col("shingles"), lit(4)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> false))
  }
}
