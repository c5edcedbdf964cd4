package graft

import java.sql.DriverManager

import graft.sources.Jdbc

/** S6 against a real JDBC endpoint: an embedded in-memory Derby DB
  * (Derby ships with the Spark distribution, so this runs in the
  * zero-egress test-bed). Verifies content parity, filter pushdown into
  * the generated SQL, and the range-partitioned parallel extract. */
class JdbcSpec extends GraftSuite {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  // one-time seed of the embedded DB (GraftSuite has no lifecycle hooks)
  locally {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE downtime (
           event_id BIGINT NOT NULL,
           line VARCHAR(16),
           downtime_min DOUBLE,
           cause VARCHAR(32))""")
    val ins = conn.prepareStatement(
      "INSERT INTO downtime VALUES (?, ?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i.toLong)
      ins.setString(2, s"L${i % 4}")
      ins.setDouble(3, i * 0.5)
      ins.setString(4, if (i % 10 == 0) "Changeover" else "Fault")
      ins.executeUpdate()
    }
    ins.close(); st.close(); conn.close()
  }


  test("whole-table read round-trips rows and schema") {
    val df = Jdbc.read(spark, url, "downtime")
    assert(df.columns.toSeq.map(_.toLowerCase) ==
      Seq("event_id", "line", "downtime_min", "cause"))
    assert(df.count() == 100)
  }

  test("filters are pushed into the JDBC query") {
    val df = Jdbc.read(spark, url, "downtime")
      .filter("CAUSE = 'Changeover' AND DOWNTIME_MIN > 10.0")
    assert(df.count() == 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(CAUSE,Changeover)"),
      s"expected JDBC pushdown in plan:\n$plan")
  }

  test("query-shaped extract (the reference's querySL/queryML path)") {
    val df = Jdbc.readQuery(spark, url,
      "SELECT line, count(*) AS n FROM downtime GROUP BY line")
    assert(df.count() == 4)
    assert(df.collect().map(_.getAs[Number](1).longValue).sum == 100)
  }

  test("range-partitioned read splits into parallel slices") {
    val df = Jdbc.readPartitioned(spark, url, "downtime",
      partitionColumn = "event_id", lower = 1L, upper = 100L,
      numPartitions = 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 100)
    // slices must partition the table: no dupes, no drops
    assert(df.select("event_id").distinct().count() == 100)
  }
}
