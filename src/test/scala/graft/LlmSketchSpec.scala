package graft

import org.apache.spark.sql.functions._

import graft.operators.LlmSketch

/** [[LlmSketch]] (Count-Min) contract: the one-sided guarantee, the
  * collision-free limit, and exact parity with a single-threaded
  * reference sketch using the same hash family. */
class LlmSketchSpec extends GraftSuite {
  import spark.implicits._

  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val words = (0 until 40).map(i => s"w$i")
    (0 until n).map { i =>
      (i.toLong, (0 until 30)
        .map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** Reference md5-bucket, matching [[LlmSketch.bucketOf]]. */
  private def refBucket(d: Int, tok: String, width: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.take(8), 16) % width
  }

  test("est >= true for EVERY token, at a width forcing collisions") {
    val docs = corpus(60, 5)
    val got = LlmSketch.cmsEstimates(docs, depth = 3, width = 8,
        minTrue = 1L)
      .as[(String, Long, Long)].collect()
    assert(got.length == 40)
    got.foreach { case (tok, t, e) =>
      assert(e >= t, s"$tok: est $e < true $t")
    }
    // width 8 over 40 tokens MUST collide somewhere
    assert(got.exists { case (_, t, e) => e > t }, "no collision at w=8")
  }

  test("collision-free limit: a wide sketch is exact") {
    val docs = corpus(60, 6)
    val got = LlmSketch.cmsEstimates(docs, depth = 4, width = 1 << 20,
        minTrue = 1L)
      .as[(String, Long, Long)].collect()
    got.foreach { case (tok, t, e) =>
      assert(e == t, s"$tok: est $e != true $t at huge width")
    }
  }

  test("exact parity with a single-threaded reference sketch") {
    val docs = corpus(50, 7)
    val (depth, width) = (4, 16)
    val toks = docs.select(explode(split(lower(col("text")), "\\s+"))
      .as("t")).as[String].collect().filter(_.nonEmpty)
    val trueN = toks.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
      .withDefaultValue(0L)
    trueN.foreach { case (t, n) =>
      (0 until depth).foreach { d =>
        cells((d, refBucket(d, t, width))) += n
      }
    }
    val ref = trueN.map { case (t, n) =>
      t -> ((n, (0 until depth).map(d =>
        cells((d, refBucket(d, t, width)))).min))
    }
    val got = LlmSketch.cmsEstimates(docs, depth = depth, width = width,
        minTrue = 1L)
      .as[(String, Long, Long)].collect()
      .map { case (t, n, e) => t -> ((n, e)) }.toMap
    assert(got == ref)
  }
}
