package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Connectors

/** Live-endpoint JDBC round-trip over embedded Apache Derby (in-process,
  * ships with the Spark distribution) — exercises the S1/S4/S6 jdbc
  * halves against a real database instead of structurally:
  * chunked append (S4), bare and partitioned scans (S1), and
  * truncate-and-reload overwrite (S6). */
class JdbcRoundtripSpec extends AnyFunSuite {
  import TestSpark._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def nation = Tables.nation(spark, sf)
    .select("n_nationkey", "n_name", "n_regionkey")

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))

  test("S4 chunked append creates and fills the table; S1 bare scan reads it back") {
    Connectors.jdbcAppend(nation, url, "nation_rt", batchSize = 10, props = props)
    val back = Connectors.jdbcRead(spark, url, "nation_rt", props = props)
    assert(sortedRows(back).sameElements(sortedRows(nation)))
  }

  test("S1 partitioned scan returns the same rows across numPartitions range queries") {
    val maxKey = nation.agg(max("n_nationkey")).head().getInt(0).toLong
    val part = Connectors.jdbcRead(spark, url, "nation_rt",
      partitionColumn = Some("n_nationkey"), bounds = Some((0L, maxKey)),
      numPartitions = 4, props = props)
    assert(part.rdd.getNumPartitions == 4, "partitioned read must fan out")
    assert(sortedRows(part).sameElements(sortedRows(nation)))
  }

  test("filters on a JDBC scan are pushed down to the database") {
    val plan = Connectors.jdbcRead(spark, url, "nation_rt", props = props)
      .filter(col("n_nationkey") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(n_nationkey,10)"),
      s"predicate did not reach the JDBC source:\n$plan")
  }

  test("S6 truncate-and-reload overwrite replaces content, then append doubles it") {
    val half = nation.filter(col("n_nationkey") < 10)
    Connectors.jdbcOverwrite(half, url, "nation_rt", props = props)
    val afterOverwrite = Connectors.jdbcRead(spark, url, "nation_rt", props = props)
    assert(sortedRows(afterOverwrite).sameElements(sortedRows(half)))
    Connectors.jdbcAppend(half, url, "nation_rt", props = props)
    assert(Connectors.jdbcRead(spark, url, "nation_rt", props = props).count() ==
      2 * half.count())
  }
}
