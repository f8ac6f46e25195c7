package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.AtomicTable

/** Column mapping (util/AtomicTable renameColumn/dropColumn/readMapped/
  * toPhysical) — Delta's `columnMapping.mode = name`: RENAME/DROP COLUMN
  * as O(1) metadata. The spec's core claim is the one that matters at
  * 100 TB: NO data file is touched. */
class ColumnMappingSpec extends AnyFunSuite {
  import TestSpark._

  private def stage(name: String): String = {
    val base = s"/tmp/graft_colmap_spec/$name"
    AtomicTable.deleteRecursively(Paths.get(base))
    AtomicTable.publish(base) { dir =>
      Tables.orders(spark, sf).limit(1000)
        .repartition(2).write.mode("overwrite").parquet(dir)
    }
    base
  }

  private def dataFiles(base: String): Map[String, (Long, Long)] = {
    val ver = Paths.get(AtomicTable.resolve(base).get)
    Files.list(ver).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map(p => p.getFileName.toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
  }

  test("rename + drop are metadata-only: zero files touched, zero versions published") {
    val base = stage("meta_only")
    val before = dataFiles(base)
    val verBefore = AtomicTable.resolve(base).get
    AtomicTable.renameColumn(spark, base, "o_totalprice", "price_usd")
    AtomicTable.dropColumn(spark, base, "o_orderpriority")
    assert(dataFiles(base) == before, "no data file may change")
    assert(AtomicTable.resolve(base).get == verBefore, "no version may publish")
    val mapped = AtomicTable.readMapped(spark, base)
    assert(mapped.columns.contains("price_usd") &&
      !mapped.columns.contains("o_totalprice") &&
      !mapped.columns.contains("o_orderpriority"))
    // values ride through the rename untouched
    val want = AtomicTable.read(spark, base).agg(sum("o_totalprice")).head().getDouble(0)
    assert(mapped.agg(sum("price_usd")).head().getDouble(0) == want)
  }

  test("illegal renames/drops refuse loudly") {
    val base = stage("refuse")
    intercept[IllegalArgumentException] {
      AtomicTable.renameColumn(spark, base, "nope", "x")
    }
    intercept[IllegalArgumentException] { // collision
      AtomicTable.renameColumn(spark, base, "o_totalprice", "o_custkey")
    }
    intercept[IllegalArgumentException] { // reserved tombstone name
      AtomicTable.renameColumn(spark, base, "o_totalprice", "-")
    }
    intercept[IllegalArgumentException] {
      AtomicTable.dropColumn(spark, base, "nope")
    }
  }

  test("appends through the logical schema keep old and new files footer-compatible") {
    val base = stage("append")
    AtomicTable.renameColumn(spark, base, "o_totalprice", "price_usd")
    AtomicTable.dropColumn(spark, base, "o_orderpriority")
    val batch = AtomicTable.readMapped(spark, base).limit(10)
      .withColumn("o_orderkey", col("o_orderkey") + lit(900000000L))
    AtomicTable.publishAppend(base, keep = 2)(dir =>
      AtomicTable.toPhysical(batch, base)
        .coalesce(1).write.mode("append").parquet(dir))
    val mapped = AtomicTable.readMapped(spark, base)
    assert(mapped.count() == 1010)
    // every file (old AND appended) still carries the full PHYSICAL
    // schema — the un-merged version read must not lose columns
    val raw = AtomicTable.read(spark, base)
    assert(raw.columns.toSet.contains("o_totalprice") &&
      raw.columns.toSet.contains("o_orderpriority"))
    // the appended rows' tombstoned slot is NULL at the physical level
    assert(raw.filter(col("o_orderkey") >= 900000000L)
      .filter(col("o_orderpriority").isNotNull).count() == 0)
  }

  test("a shallow clone carries the logical schema with it") {
    val base = stage("clone_src")
    AtomicTable.renameColumn(spark, base, "o_totalprice", "price_usd")
    val dst = "/tmp/graft_colmap_spec/clone_dst"
    AtomicTable.deleteRecursively(Paths.get(dst))
    AtomicTable.cloneTable(base, dst)
    assert(AtomicTable.readMapped(spark, dst).columns.contains("price_usd"),
      "a clone that reverts to physical names is a silent rename")
  }
}
