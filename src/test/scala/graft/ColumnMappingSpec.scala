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

  test("schema-evolving append auto-extends the mapping: rename, evolve, read BOTH") {
    // r13 verdict #2: the mapping must not be a closed column universe.
    val base = stage("evolve")
    AtomicTable.renameColumn(spark, base, "o_totalprice", "price_usd")
    // mergeSchema-style evolving append: the batch carries a column the
    // table has never seen
    val batch = AtomicTable.readMapped(spark, base).limit(10)
      .withColumn("o_orderkey", col("o_orderkey") + lit(900000000L))
      .withColumn("o_channel", lit("web"))
    AtomicTable.publishAppend(base, keep = 2)(dir =>
      AtomicTable.toPhysical(batch, base)
        .coalesce(1).write.mode("append").parquet(dir))
    val mapped = AtomicTable.readMapped(spark, base)
    // sees BOTH the renamed column and the evolved one
    assert(mapped.columns.contains("price_usd"), "rename must survive evolution")
    assert(mapped.columns.contains("o_channel"),
      "the evolved column must be visible to the mapped read — silently " +
        "invisible is the wrong-answer class this closes")
    assert(mapped.filter(col("o_channel") === "web").count() == 10)
    assert(mapped.filter(col("o_channel").isNull).count() == 1000)
    // the map itself was persisted with an identity entry (maintained
    // access), so a FRESH reader needs no re-derivation
    val m = AtomicTable.columnMapping(base).get
    assert(m.contains(("o_channel", "o_channel")))
    // and the extension is idempotent across repeated reads
    assert(AtomicTable.readMapped(spark, base).columns.count(_ == "o_channel") == 1)
    // a second rename of the EVOLVED column still works (it is a first-
    // class mapped column now)
    AtomicTable.renameColumn(spark, base, "o_channel", "channel")
    assert(AtomicTable.readMapped(spark, base).columns.contains("channel"))
  }

  test("evolving append refuses a column name colliding with a physical slot") {
    val base = stage("evolve_collide")
    AtomicTable.renameColumn(spark, base, "o_totalprice", "price_usd")
    // 'o_totalprice' is now a PHYSICAL slot of logical 'price_usd' — a new
    // column reusing that name would fuse two columns at the file level
    val bad = AtomicTable.readMapped(spark, base).limit(5)
      .withColumn("o_totalprice", lit(1.0))
    intercept[IllegalArgumentException] {
      AtomicTable.toPhysical(bad, base)
    }
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
