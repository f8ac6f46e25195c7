package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GenSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def gen(rows: Long = 100000L, splits: Int = 16) =
    spark.read.format("graft.sources.GraftGen")
      .option("rows", rows.toString).option("splits", splits.toString).load()

  test("range filters are pushed into the source and prune planned partitions") {
    val df = gen().filter(col("id") >= 5000 && col("id") < 5200).select("id")
    // the scan's own description carries the pruned range — the predicate
    // reached the connector, not a post-scan Filter
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("range=[5000,5200)"), scanDesc)
    // split planning runs over the PRUNED range: 16 requested splits but
    // only 200 rows survive → 16 partitions of ~12 rows, not 100k/16
    assert(df.count() == 200)
    // an empty range plans zero partitions
    val empty = gen().filter(col("id") >= 10 && col("id") < 10)
    assert(empty.rdd.getNumPartitions <= 1 && empty.count() == 0)
  }

  test("column pruning reaches the reader schema") {
    val df = gen().filter(col("id") < 100).select("id", "bucket")
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("cols=[id,bucket]"), scanDesc)
    assert(df.agg(sum("id")).head().getLong(0) == (0L until 100L).sum)
  }

  test("equality pushdown narrows to a single row and values are deterministic") {
    val one = gen().filter(col("id") === 42).collect()
    assert(one.length == 1)
    val r = one.head
    assert(r.getAs[Long]("id") == 42L)
    assert(r.getAs[Int]("bucket") == 10)
    assert(r.getAs[String]("val_hash") == graft.sources.GraftGen.hashOf(42L))
    // re-reading yields the identical row (pure function of id)
    assert(gen().filter(col("id") === 42).collect().head == r)
  }
}
