package graft

import org.apache.spark.sql.functions._

import graft.sinks.Bucketing

/** Bucketed layout must eliminate the shuffle from key-aligned joins
  * and aggregations — the pre-partitioned 100 TB join strategy. */
class BucketingSpec extends GraftSuite {
  import spark.implicits._

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucket join and bucket-key aggregate plan with no Exchange") {
    val left = (1 to 1000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "a")
    val right = (1 to 500).map(i => (i.toLong % 97, s"r$i")).toDF("k", "b")
    Bucketing.writeBucketed(left, "bkt_left", 8, Seq("k"))
    Bucketing.writeBucketed(right, "bkt_right", 8, Seq("k"))
    try withNoBroadcast {
      val joined = spark.table("bkt_left")
        .join(spark.table("bkt_right"), Seq("k"))
      assert(joined.count() ==
        left.join(right, Seq("k")).count())
      val jplan = joined.queryExecution.executedPlan.toString
      assert(!jplan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$jplan")

      val agg = spark.table("bkt_left").groupBy("k").agg(sum("a"))
      agg.collect()
      val aplan = agg.queryExecution.executedPlan.toString
      assert(!aplan.contains("Exchange"),
        s"bucket-key aggregate should not shuffle:\n$aplan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
