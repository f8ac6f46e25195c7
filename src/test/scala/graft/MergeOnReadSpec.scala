package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeOnRead
import graft.util.AtomicTable

/** Merge-on-read MERGE (ops/MergeOnRead.scala): the oracle gate proves
  * the merged ANSWER; this spec proves the mechanics — no data-file
  * rewrites, replace semantics vs a recompute, DV reach into
  * merge-inserted files, and compaction. */
class MergeOnReadSpec extends AnyFunSuite {
  import TestSpark._

  private def stage(name: String): String = {
    val base = s"/tmp/graft_mor_spec/$name"
    AtomicTable.deleteRecursively(Paths.get(base))
    AtomicTable.publish(base) { dir =>
      Tables.orders(spark, sf).repartition(4).write.mode("overwrite").parquet(dir)
    }
    base
  }

  private def dataFiles(base: String): Map[String, (Long, Long)] = {
    val ver = Paths.get(AtomicTable.resolve(base).get)
    Files.list(ver).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_")
        && !p.getFileName.toString.startsWith("."))
      .map(p => p.getFileName.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
  }

  /** The merge batch both tests use: keys ≡ 0 mod 5 get price+100 and a
    * marker status; keys offset by 10^9 insert fresh. */
  private def batch(): DataFrame = {
    val o = Tables.orders(spark, sf)
    o.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      .withColumn("o_orderstatus", lit("M"))
      .unionByName(
        o.where(col("o_orderkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L)))
  }

  test("MERGE rewrites no data file and equals the direct recompute") {
    val base = stage("upsert")
    val before = dataFiles(base)
    val o = Tables.orders(spark, sf)
    MergeOnRead.mergeUpsert(spark, base, batch(), "o_orderkey")
    assert(dataFiles(base) == before, "MERGE must not rewrite data files")

    val want = o.where(col("o_orderkey") % 5 =!= 0)
      .unionByName(batch())
    val got = MergeOnRead.readMerged(spark, base)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "merged read must equal unmatched ∪ batch")
  }

  test("a second merge reaches rows the first merge inserted (_mor positions)") {
    val base = stage("morpos")
    MergeOnRead.mergeUpsert(spark, base, batch(), "o_orderkey")
    val inserted = MergeOnRead.readMerged(spark, base)
      .where(col("o_orderkey") >= 1000000000L)
    val nInserted = inserted.count()
    assert(nInserted > 0, "fixture needs merge-inserted rows")
    // second batch: update ONLY the rows the first merge inserted
    val b2 = Tables.orders(spark, sf).where(col("o_orderkey") % 11 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
      .withColumn("o_orderpriority", lit("0-SECOND"))
    MergeOnRead.mergeUpsert(spark, base, b2, "o_orderkey")
    val after = MergeOnRead.readMerged(spark, base)
      .where(col("o_orderkey") >= 1000000000L)
    assert(after.count() == nInserted,
      "replacing inserted rows must not change their count")
    assert(after.where(col("o_orderpriority") =!= "0-SECOND").count() == 0L,
      "every merge-inserted row must carry the second merge's update")
  }

  test("compaction publishes a sidecar-free version with identical contents") {
    val base = stage("compact")
    MergeOnRead.mergeUpsert(spark, base, batch(), "o_orderkey")
    val want = MergeOnRead.readMerged(spark, base)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("p"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val verBefore = AtomicTable.resolve(base).get
    MergeOnRead.compactMerged(spark, base, nFiles = 4)
    val verAfter = AtomicTable.resolve(base).get
    assert(verAfter != verBefore)
    assert(!Files.isDirectory(Paths.get(s"$verAfter/_dv")) &&
      !Files.isDirectory(Paths.get(s"$verAfter/_mor")),
      "the compacted version starts with no sidecars")
    val got = AtomicTable.read(spark, base)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").as("p"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet &&
      got.forall { case (k, (n, p)) =>
        want(k)._1 == n && math.abs(want(k)._2 - p) < 1e-6 },
      "compaction changed the table's contents")
  }

  test("full MERGE matrix: update/delete/insert/not-matched-by-source") {
    val base = stage("full")
    val before = dataFiles(base)
    val o = Tables.orders(spark, sf)
    val src = o.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(7.0))
      .unionByName(
        o.where(col("o_orderkey") % 19 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
          .withColumn("o_orderstatus", lit("X")))
    MergeOnRead.mergeFull(spark, base, src, "o_orderkey",
      matchedUpdateCond = col("o_orderstatus") === "F",
      updateSet = Map(
        "o_totalprice" -> col("__src_o_totalprice"),
        "o_orderpriority" -> lit("1-UPDATED")),
      matchedDeleteCond = col("o_orderstatus") === "P",
      insertNotMatched = true,
      notMatchedBySourceDeleteCond = col("o_orderkey") % 3 === 0)
    assert(dataFiles(base) == before, "MERGE must not rewrite data files")

    val want = o.where(col("o_orderkey") % 5 === 0 && col("o_orderstatus") === "F")
      .withColumn("o_totalprice", col("o_totalprice") + lit(7.0))
      .withColumn("o_orderpriority", lit("1-UPDATED"))
      .unionByName(o.where(
        col("o_orderkey") % 5 === 0 && col("o_orderstatus") === "O"))
      .unionByName(o.where(
        col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 3 =!= 0))
      .unionByName(o.where(col("o_orderkey") % 19 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(200000000L))
        .withColumn("o_orderstatus", lit("X")))
    val got = MergeOnRead.readMerged(spark, base)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "full-matrix merge must equal the direct clause restatement")
  }

  test("full MERGE without inserts: matched-DELETEd keys must NOT resurrect") {
    val base = stage("noresurrect")
    val o = Tables.orders(spark, sf)
    // source = every 'P' order; clause matrix deletes all of them
    val src = o.where(col("o_orderstatus") === "P")
    val nP = src.count()
    assert(nP > 0, "fixture needs P orders")
    MergeOnRead.mergeFull(spark, base, src, "o_orderkey",
      matchedUpdateCond = lit(false),
      updateSet = Map.empty,
      matchedDeleteCond = lit(true),
      insertNotMatched = true,
      notMatchedBySourceDeleteCond = lit(false))
    val after = MergeOnRead.readMerged(spark, base)
    assert(after.where(col("o_orderstatus") === "P").count() == 0L,
      "matched DELETE must remove the rows")
    assert(after.count() == o.count() - nP,
      "a matched-DELETEd source row must not re-enter via NOT MATCHED INSERT")
  }
}
