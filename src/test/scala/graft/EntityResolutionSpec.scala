package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** [[EntityResolution]] contract: transitive closure over edit-
  * distance edges (a chain a–b–c with ed(a,c) > k resolves to ONE
  * entity), min-id survivorship, singleton and NULL handling. */
class EntityResolutionSpec extends GraftSuite {
  import spark.implicits._

  test("typo chain resolves transitively through the hub") {
    // hub "martin" with two 1-edit variants that are 2 edits from
    // each other: transitivity is the only way they share an entity
    val df = Seq(
      (1L, "martin"), (2L, "martins"), (3L, "mattin"),
      (10L, "helena"), (11L, "helen a")
    ).toDF("id", "name")
    val out = EntityResolution.resolve(df, "id", "name", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out(1L) == (1L, "martin"))
    assert(out(2L) == (1L, "martin"), "variant joins via hub")
    assert(out(3L) == (1L, "martin"), "2-edit-apart variants merge transitively")
    assert(out(10L) == (10L, "helena"))
    assert(out(11L) == (10L, "helena"))
  }

  test("singletons are their own entity; NULLs drop") {
    val df = Seq(
      (Option(1L), Option("alpha")), (Option(2L), Option("zzzzzz")),
      (Option(3L), None), (None, Option("beta"))
    ).toDF("id", "name")
    val out = EntityResolution.resolve(df, "id", "name", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(out == Map(1L -> (1L, "alpha"), 2L -> (2L, "zzzzzz")))
  }

  test("stars (default) ≡ propagation, including on a chain-shaped " +
      "component past what shallow-cluster assumptions cover") {
    // a revision chain (each string one edit from the next — the
    // diameter-linear topology propagation pays O(n) rounds for; kept
    // short here because the PROPAGATION side of the differential
    // really does pay a round per link, each round growing the plan —
    // LlmTextSpec covers the long-chain case for stars alone) plus
    // duplicate copies and unrelated singletons
    val chain = (0 until 12).map(i => "base" + "x" * i)
    val df = (chain.zipWithIndex.map { case (s, i) => (100L + i, s) } ++
      Seq((500L, chain(5)), (501L, chain(9)),
        (900L, "unrelated-one"), (901L, "another-thing")))
      .toDF("id", "name")
    def snap(clustering: String) =
      EntityResolution.resolve(df, "id", "name", k = 1,
          clustering = clustering)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
    val stars = snap("stars")
    assert(stars == snap("propagation"))
    // the whole chain (and the copies) is ONE entity rooted at min id
    val chainIds = (100L until 112L) ++ Seq(500L, 501L)
    assert(stars.filter(t => chainIds.contains(t._1))
      .forall(t => t._2 == 100L && t._3 == chain.head))
    intercept[IllegalArgumentException] {
      EntityResolution.resolve(df, "id", "name", k = 1,
        clustering = "bogus")
    }
  }

  test("every row appears exactly once and entity_id is a member id") {
    val df = (1L to 60L)
      .map(i => (i, s"key-${i % 12}" + (if (i % 5 == 0) "x" else "")))
      .toDF("id", "name")
    val out = EntityResolution.resolve(df, "id", "name", k = 1)
    assert(out.count() == 60L)
    assert(out.select("id").distinct().count() == 60L)
    val ids = out.select(col("entity_id").as("id")).distinct()
    assert(ids.join(df, Seq("id"), "left_anti").isEmpty,
      "every entity_id must be an input id")
    // canonical string belongs to the entity_id row
    val mismatch = out.join(df.withColumnRenamed("id", "entity_id")
        .withColumnRenamed("name", "expect"), Seq("entity_id"))
      .filter(col("canonical") =!= col("expect"))
    assert(mismatch.isEmpty)
  }
}
