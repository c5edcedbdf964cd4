package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** [[SkewJoin.saltedEquiJoin]] — row-identity with the plain join and
  * the actual spread of a hot key across salts. */
class SkewJoinSpec extends GraftSuite {
  import spark.implicits._

  private def sameRows(a: DataFrame, b: DataFrame): Boolean = {
    val bAligned = b.select(a.columns.map(col): _*)
    a.exceptAll(bAligned).isEmpty && bAligned.exceptAll(a).isEmpty
  }

  test("salted inner and left joins are row-identical to plain joins") {
    val rnd = new scala.util.Random(5)
    // nulls, duplicate keys, duplicate full rows, unmatched keys on
    // both sides — every equi-join edge in one fixture
    val left = (Seq.tabulate(400)(i =>
        (if (rnd.nextInt(10) == 0) null
         else s"k${rnd.nextInt(6)}", rnd.nextInt(3), i % 100)) ++
      Seq(("konlyl", 1, 1), (null.asInstanceOf[String], 2, 2)))
      .toDF("k", "a", "b")
    val right = (Seq.tabulate(40)(i =>
        (if (rnd.nextInt(10) == 0) null
         else s"k${rnd.nextInt(8)}", s"r$i")) ++ Seq(("konlyr", "x")))
      .toDF("k", "v")
    for (jt <- Seq("inner", "left", "right", "full"); salts <- Seq(1, 7)) {
      val salted = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salts, jt)
      val plain = left.join(right, Seq("k"), jt)
      assert(sameRows(salted, plain), s"joinType=$jt salts=$salts")
    }
  }

  test("full outer: unmatched rows on the replicated side appear ONCE") {
    // the single-pass trap: replicating one side and joining "full"
    // emits that side's unmatched rows once per salt — the two-pass
    // formulation must not
    val left = Seq(("lonly", 1), ("both", 2),
      (null.asInstanceOf[String], 3)).toDF("k", "a")
    // right carries a legitimately-NULL value column on its unmatched
    // row: presence tagging must not confuse it with "no left match"
    val right = Seq(("ronly", null.asInstanceOf[String]), ("both", "x"),
      (null.asInstanceOf[String], "nullk")).toDF("k", "v")
    val out = SkewJoin.saltedEquiJoin(left, right, Seq("k"), 5, "full")
    assert(sameRows(out, left.join(right, Seq("k"), "full")))
    assert(out.filter(col("k") === "ronly").count() === 1)
  }

  test("a hot key actually spreads over the salt space") {
    // 1000 rows of ONE key (distinct payloads): plain join sends all
    // of them to one reducer; the salt must fan them out
    val hot = Seq.tabulate(1000)(i => ("hot", i.toLong)).toDF("k", "payload")
    val salts = 8
    val spread = hot
      .withColumn("s", SkewJoin.rowSalt(hot, salts))
      .groupBy(col("s")).count().collect()
    assert(spread.length === salts, "every salt value used")
    val max = spread.map(_.getLong(1)).max
    assert(max < 1000 / salts * 2,
      s"hot key still concentrated: max per-salt count $max")
  }

  test("the join exchange carries the salt; the output does not") {
    val left = Seq(("a", 1)).toDF("k", "a")
    val right = Seq(("a", "x")).toDF("k", "v")
    val out = SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4)
    assert(!out.columns.contains(SkewJoin.SaltCol))
    assert(out.queryExecution.executedPlan.toString.contains(SkewJoin.SaltCol))
  }
}
