package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Hand fixtures for the generic ordered funnel: strictly-after
  * chaining, out-of-order stage events, NULL chaining past a missed
  * stage, and N-stage generality. */
class FunnelSpec extends GraftSuite {
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*): DataFrame =
    rows.toSeq.toDF("uid", "etype", "sec")
      .select($"uid", $"etype", timestamp_seconds($"sec").as("ts"))

  private def times(df: DataFrame, stages: Seq[String]):
      Map[Long, Seq[Option[Long]]] =
    Funnel.stageTimes(df, "uid", "etype", "ts", stages)
      .select($"uid" +: stages.map(s =>
        col(s"t_$s").cast("long").as(s)): _*)
      .collect()
      .map(r => r.getAs[Long]("uid") ->
        stages.indices.map(i => Option(r.get(i + 1))
          .map(_.asInstanceOf[Long])).toSeq)
      .toMap

  private val S3 = Seq("view", "click", "purchase")

  test("full conversion picks the first qualifying time per stage") {
    val df = ev((1, "view", 10), (1, "view", 5), (1, "click", 20),
      (1, "click", 12), (1, "purchase", 30))
    assert(times(df, S3)(1L) == Seq(Some(5L), Some(12L), Some(30L)))
  }

  test("stage events BEFORE the previous stage's time don't count") {
    // click at 3 precedes the first view (5) — the funnel requires
    // strictly-after ordering, so the qualifying click is at 12
    val df = ev((1, "click", 3), (1, "view", 5), (1, "click", 12))
    assert(times(df, S3)(1L) == Seq(Some(5L), Some(12L), None))
  }

  test("a click exactly AT the view time does not qualify (strict >)") {
    val df = ev((1, "view", 5), (1, "click", 5), (1, "click", 9))
    assert(times(df, S3)(1L) == Seq(Some(5L), Some(9L), None))
  }

  test("missing middle stage nulls the rest of the chain") {
    // purchase exists but no click ever — t_click NULL, and the
    // purchase can't qualify against a NULL bound
    val df = ev((2, "view", 1), (2, "purchase", 8))
    assert(times(df, S3)(2L) == Seq(Some(1L), None, None))
  }

  test("counts: per-stage reach over a mixed population") {
    val df = ev(
      (1, "view", 1), (1, "click", 2), (1, "purchase", 3), // full
      (2, "view", 1), (2, "click", 2), // no purchase
      (3, "view", 1), // view only
      (4, "click", 1), (4, "purchase", 2)) // never viewed
    val r = Funnel.counts(df, "uid", "etype", "ts", S3).collect()(0)
    assert(r.getAs[Long]("n_entities") == 4L)
    assert(r.getAs[Long]("n_view") == 3L)
    assert(r.getAs[Long]("n_click") == 2L)
    assert(r.getAs[Long]("n_purchase") == 1L)
  }

  test("four-stage funnel chains the same way") {
    val st = Seq("a", "b", "c", "d")
    val df = ev((1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "d", 4),
      (2, "a", 1), (2, "b", 2), (2, "d", 3))
    val t = times(df, st)
    assert(t(1L) == Seq(Some(1L), Some(2L), Some(3L), Some(4L)))
    assert(t(2L) == Seq(Some(1L), Some(2L), None, None))
  }

  test("single shuffle: one Exchange in the stageTimes plan") {
    val df = ev((1, "view", 1), (1, "click", 2))
    val plan = Funnel.stageTimes(df, "uid", "etype", "ts", S3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }
}
