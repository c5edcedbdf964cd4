package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout: hand-checked Morton interleave, bucketization
  * edges, and the property the layout exists for — per-partition
  * bounding boxes stay compact in EVERY clustered dimension, where a
  * single-column sort leaves the second dimension unprunable. */
class ZOrderSpec extends GraftSuite {
  import spark.implicits._

  test("zValue interleaves bits in Morton order") {
    // x=0b1010, y=0b0110 at 4 bits: x takes even output bits, y odd
    // -> z = 0b01101100 = 108
    val out = Seq((10L, 6L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 4).as("z"))
      .head().getLong(0)
    assert(out == 108L)
    // 1 column degenerates to the identity on [0, 2^bits)
    val id = Seq(37L).toDF("x")
      .select(ZOrder.zValue(Seq(col("x")), 8).as("z")).head().getLong(0)
    assert(id == 37L)
    // 3 columns: x=1,y=1,z=1 -> bits 0,1,2 set = 7
    val three = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .head().getLong(0)
    assert(three == 7L)
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b")), 32) // 64 bits > signed long
    }
  }

  test("minMaxBucket edges: min->0, max->top bucket, degenerate->0, " +
    "null->null") {
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (0.0, 0.0, 100.0), (100.0, 0.0, 100.0), (50.0, 0.0, 100.0),
      (7.0, 7.0, 7.0), (null, 0.0, 100.0))
      .toDF("x", "mn", "mx")
    val out = df.select(
      ZOrder.minMaxBucket(col("x"), col("mn"), col("mx"), 8).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(out.toSeq == Seq(0L, 255L, 128L, 0L, null))
  }

  test("clusterByZ keeps every partition's bounding box compact in " +
    "both dimensions; a one-column sort does not") {
    // 64x64 grid, one row per cell; 16 partitions either way
    val grid = spark.range(64L * 64L)
      .select((col("id") % 64).as("x"),
        floor(col("id") / 64).cast("long").as("y"))
    def probeHits(parted: org.apache.spark.sql.DataFrame): Double = {
      // per-partition [ymin, ymax]; fraction of partitions a point
      // predicate y = c must touch, averaged over all c
      val boxes = parted
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min(col("y")).as("ymin"), max(col("y")).as("ymax"))
        .collect().map(r => (r.getAs[Long]("ymin"), r.getAs[Long]("ymax")))
      val hits = (0L until 64L).map(c =>
        boxes.count { case (lo, hi) => lo <= c && c <= hi })
      hits.sum.toDouble / (hits.size * boxes.length)
    }
    val z = probeHits(ZOrder.clusterByZ(grid, Seq("x", "y"), bits = 6,
      numPartitions = 16))
    val xSorted = probeHits(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // x-sorted partitions each span all of y (every probe hits every
    // partition); z-ordered partitions cover ~1/4 of y each
    assert(xSorted > 0.95, s"x-sorted layout should be unprunable on y, " +
      s"got $xSorted")
    assert(z < 0.5, s"z-ordered layout should prune most partitions on " +
      s"a y predicate, got $z")
    // the layout is row-invisible: same rows, nothing dropped
    assert(ZOrder.clusterByZ(grid, Seq("x", "y"), bits = 6,
      numPartitions = 16).count() == 64L * 64L)
  }

  test("quantileBucket counts cuts at-or-below, clamps, propagates " +
    "NULL") {
    val df = Seq[(java.lang.Double)](5.0, 10.0, 25.0, 1000.0, null)
      .toDF("x").withColumn("cuts", array(lit(10.0), lit(20.0), lit(30.0)))
    val out = df.select(
      ZOrder.quantileBucket(col("x"), col("cuts"), 2).as("b"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(out.toSeq == Seq(0L, 1L, 2L, 3L, null))
  }

  test("clusterByZQuantile keeps pruning resolution inside a dense " +
    "region where linear buckets collapse") {
    // 97% of rows have x in [0, 10); the rest sit 1000x away — linear
    // min/max buckets put the whole dense mass in x-bucket 0
    val df = spark.range(4096L)
      .select(
        when(col("id") % 43 === 0, lit(10000L) + col("id") % 96)
          .otherwise(col("id") % 10).as("x"),
        (col("id") % 64).as("y"))
    // scan cost of a point predicate x = c under footer pruning: the
    // fraction of ROWS living in partitions whose [xmin, xmax] spans c
    // (row-weighted, so tiny outlier partitions don't distort the
    // metric), averaged over the dense values
    def denseProbeHits(parted: org.apache.spark.sql.DataFrame): Double = {
      val boxes = parted
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min(col("x")).as("xmin"), max(col("x")).as("xmax"),
          count(lit(1)).as("n"))
        .collect().map(r => (r.getAs[Long]("xmin"), r.getAs[Long]("xmax"),
          r.getAs[Long]("n")))
      val total = boxes.map(_._3).sum.toDouble
      val fracs = (0L until 10L).map(c =>
        boxes.collect { case (lo, hi, n) if lo <= c && c <= hi => n }
          .sum / total)
      fracs.sum / fracs.size
    }
    // 64 partitions over the 8-bit z space: each partition is a 2x2
    // bucket block, fine enough for the probe to see the x resolution
    val linear = denseProbeHits(
      ZOrder.clusterByZ(df, Seq("x", "y"), bits = 4, numPartitions = 64))
    val quant = denseProbeHits(ZOrder.clusterByZQuantile(
      df, Seq("x", "y"), bits = 4, numPartitions = 64))
    // linear: every dense-region partition spans all of [0, 10) in x,
    // so an x point predicate cannot prune; quantile cuts split the
    // dense mass across x-buckets and restore the rectangle structure
    assert(linear > 0.8, s"linear layout unexpectedly prunable: $linear")
    assert(quant < 0.5 * linear,
      s"quantile layout should prune the dense region: $quant vs $linear")
    assert(ZOrder.clusterByZQuantile(df, Seq("x", "y"), bits = 4,
      numPartitions = 64).count() == 4096L)
  }

  test("cluster ops fail fast when an input column collides with a " +
    "generated bounds alias") {
    val df = Seq((1L, 2L)).toDF("x", "__min_x")
    intercept[IllegalArgumentException] {
      ZOrder.clusterByZ(df, Seq("x"))
    }
    val df2 = Seq((1L, 2L)).toDF("x", "__cuts_x")
    intercept[IllegalArgumentException] {
      ZOrder.clusterByZQuantile(df2, Seq("x"))
    }
  }

  test("clusterByZ carries NULL rows to the front partition instead " +
    "of dropping or spraying them") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (2L, null), (3L, 3L), (null, 4L), (5L, 5L))
      .toDF("x", "y")
    val parted = ZOrder.clusterByZ(df, Seq("x", "y"), bits = 4,
      numPartitions = 2)
    assert(parted.count() == 5)
    val nullPids = parted.withColumn("pid", spark_partition_id())
      .filter(col("x").isNull || col("y").isNull)
      .select(col("pid")).distinct().collect().map(_.getInt(0)).toSeq
    assert(nullPids.size == 1, s"null rows spread over $nullPids")
  }
}
