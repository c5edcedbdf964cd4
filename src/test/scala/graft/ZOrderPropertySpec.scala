package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Property tests for the z-order kernels against independent
  * single-threaded transcriptions: Morton interleave round-trips
  * through a pure-Scala de-interleave, and the binary-search quantile
  * bucket equals the naive count of cuts at-or-below. */
class ZOrderPropertySpec extends GraftSuite {
  import spark.implicits._

  private val nRuns = sys.env.getOrElse("GRAFT_PROP_N", "8").toInt

  private def deinterleave(z: Long, k: Int, bits: Int): Seq[Long] =
    (0 until k).map { j =>
      (0 until bits).map(i => ((z >> (i * k + j)) & 1L) << i).sum
    }

  test("zValue round-trips through a pure-Scala de-interleave") {
    val gen = for {
      k <- Gen.choose(1, 4)
      bits <- Gen.choose(1, 63 / k)
      rows <- Gen.listOfN(30,
        Gen.listOfN(k, Gen.choose(0L, (1L << bits) - 1)))
    } yield (k, bits, rows)
    for (i <- 0 until nRuns) {
      val (k, bits, rows) = gen(Gen.Parameters.default, Seed(7L + i)).get
      val df = rows.zipWithIndex
        .map { case (bs, idx) => (idx.toLong, bs) }
        .toDF("idx", "bs")
      val zs = df.select(col("idx"), ZOrder.zValue(
          (0 until k).map(j => element_at(col("bs"), j + 1)), bits).as("z"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.zipWithIndex.foreach { case (bs, idx) =>
        assert(deinterleave(zs(idx.toLong), k, bits) == bs,
          s"seed=${7 + i} k=$k bits=$bits buckets=$bs z=${zs(idx.toLong)}")
      }
    }
  }

  test("quantileBucket equals the naive count of cuts at-or-below, " +
    "duplicates and boundary values included") {
    val gen = for {
      bits <- Gen.choose(1, 6)
      cuts <- Gen.listOfN((1 << bits) - 1, Gen.choose(-50.0, 50.0))
        .map(_.sorted)
      // probe xs: random values plus the cut values themselves (the
      // boundary cases where an off-by-one would hide)
      xs <- Gen.listOfN(20, Gen.choose(-60.0, 60.0))
    } yield (bits, cuts, xs ++ cuts.take(5))
    for (i <- 0 until nRuns) {
      val (bits, cuts, xs) = gen(Gen.Parameters.default, Seed(19L + i)).get
      val df = xs.zipWithIndex.map { case (x, idx) => (idx.toLong, x) }
        .toDF("idx", "x")
        .withColumn("cuts", array(cuts.map(lit): _*))
      val got = df.select(col("idx"),
          ZOrder.quantileBucket(col("x"), col("cuts"), bits).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      xs.zipWithIndex.foreach { case (x, idx) =>
        val expected = cuts.count(_ <= x).toLong
        assert(got(idx.toLong) == expected,
          s"seed=${19 + i} bits=$bits x=$x cuts=$cuts")
      }
    }
  }
}
