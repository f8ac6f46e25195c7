package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DataSkipping

/** File-level data skipping (ops/DataSkipping.scala): the oracle gate
  * proves the ANSWERS are full-scan-identical; this spec proves the
  * skipping actually SKIPS — the whole point of the structure at 100 TB —
  * and that it never drops a file it shouldn't.
  */
class DataSkippingSpec extends AnyFunSuite {
  import TestSpark._

  test("zone-map range pruning keeps a strict subset and loses no rows") {
    val base = DataSkipping.dateClusteredOrders(spark, sf)
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-03-31 23:59:59").cast("timestamp")
    val (kept, total) = DataSkipping.pruneFiles(spark, base,
      DataSkipping.rangeKeep("o_orderdate", lo, hi))
    // a quarter-year window over a ~6.6-year date-clustered domain must
    // prune hard: ~1/26 of the span → at most a quarter of the files
    assert(total >= 16, s"staging should have produced many files, got $total")
    assert(kept.nonEmpty && kept.size <= total / 4,
      s"expected heavy pruning, kept ${kept.size} of $total")
    // soundness: pruned read + exact filter ≡ full scan + exact filter
    val full = graft.Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lo && col("o_orderdate") <= hi).count()
    val pruned = DataSkipping.readFiles(spark, base, kept)
      .where(col("o_orderdate") >= lo && col("o_orderdate") <= hi).count()
    assert(pruned == full, s"pruned read lost rows: $pruned vs $full")
  }

  test("z-order prunes on BOTH dimensions where a single-key sort cannot") {
    // synthetic independent-uniform corpus: the testdata's l_suppkey is
    // correlated with l_partkey by construction, which would blur the
    // layout comparison — planted data isolates the claim
    val n = 4096L
    val df = spark.range(0, n).selectExpr(
      "CAST(pmod(hash(id), 256) AS BIGINT) AS a",
      "CAST(pmod(hash(id * 7 + 13), 256) AS BIGINT) AS b",
      "id AS payload")
    val zBase = "/tmp/graft_skip_spec/z"
    val linBase = "/tmp/graft_skip_spec/lin"
    DataSkipping.optimizedWrite(spark, df, zBase,
      clusterCols = Seq("a", "b"), statsCols = Seq("a", "b"),
      bloomCol = None, nFiles = 16)
    DataSkipping.optimizedWrite(spark, df, linBase,
      clusterCols = Seq("a"), statsCols = Seq("a", "b"),
      bloomCol = None, nFiles = 16)
    // a predicate on b ALONE: the z-layout confines b to boxes, the
    // a-sorted layout scatters b uniformly through every file
    val keepB = DataSkipping.rangeKeep("b", lit(100L), lit(131L)) // ~1/8 of domain
    val (keptZ, totalZ) = DataSkipping.pruneFiles(spark, zBase, keepB)
    val (keptLin, totalLin) = DataSkipping.pruneFiles(spark, linBase, keepB)
    info(s"b-range prune: z-order kept ${keptZ.size}/$totalZ, a-sort kept ${keptLin.size}/$totalLin")
    assert(keptLin.size == totalLin,
      "a-sorted layout should be unable to prune on b at all")
    assert(keptZ.size < totalZ,
      s"z-order layout should prune on b, kept ${keptZ.size} of $totalZ")
    // and the z-layout still prunes on a as well (both dimensions live)
    val (keptZa, _) = DataSkipping.pruneFiles(spark, zBase,
      DataSkipping.rangeKeep("a", lit(0L), lit(31L)))
    assert(keptZa.size < totalZ, "z-order layout should also prune on a")
    // soundness on the z path
    val got = DataSkipping.readFiles(spark, zBase, keptZ)
      .where(col("b").between(100L, 131L)).count()
    val want = df.where(col("b").between(100L, 131L)).count()
    assert(got == want)
  }

  test("bloom index prunes scattered-key point lookups zone maps cannot") {
    val base = DataSkipping.dateClusteredOrders(spark, sf)
    val keys = graft.Tables.orders(spark, sf).select("o_orderkey")
      .orderBy("o_orderkey").limit(5).collect().map(_.getLong(0)).toSeq
    val (kept, total) = DataSkipping.bloomPruneFiles(spark, base, keys)
    // 5 uniformly scattered keys over `total` date-clustered files: the
    // bloom keeps ≤ 5 true files + ~1% fpp stragglers
    assert(kept.size <= math.min(total, keys.size + 3),
      s"bloom kept ${kept.size} of $total for ${keys.size} keys")
    // no false negatives: every probed row survives the pruned read
    val got = DataSkipping.readFiles(spark, base, kept)
      .where(col("o_orderkey").isin(keys: _*)).count()
    assert(got == keys.size.toLong, s"lost rows to bloom pruning: $got")
    // an absent key (domain max + 1e9) keeps ~nothing (fpp-bounded)
    val absent = Seq(graft.Tables.orders(spark, sf)
      .agg(max("o_orderkey")).head().getLong(0) + 1000000000L)
    val (keptAbsent, _) = DataSkipping.bloomPruneFiles(spark, base, absent)
    assert(keptAbsent.size <= math.max(2L, total / 8),
      s"absent key kept ${keptAbsent.size} of $total files")
    assert(DataSkipping.readFiles(spark, base, keptAbsent)
      .where(col("o_orderkey") === absent.head).count() == 0L)
  }

  test("streaming ingest maintains the skip sidecar incrementally across micro-batches") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val src = "/tmp/graft_skip_ingest_src"
    val tableDir = "/tmp/graft_skip_ingest_tbl/events_skip"
    val ev = graft.Tables.events(spark, sf).cache()
    def rmrf(p: String): Unit = if (Files.exists(Paths.get(p)))
      Files.walk(Paths.get(p)).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    rmrf(src)
    (0 until 3).foreach { i =>
      ev.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/chunk$i")
      val part = Files.list(Paths.get(s"$src/chunk$i")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(s"$src/file$i.parquet"))
      rmrf(s"$src/chunk$i")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val result = graft.streaming.EventsStream.skipIngestFrom(spark, stream, tableDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    // three micro-batches → three immutable batch dirs, and the sidecar
    // references files from ALL of them (it grew batch-by-batch)
    val batchDirs = Files.list(Paths.get(tableDir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch_")).toSeq
    assert(batchDirs.size == 3, s"expected 3 batch dirs, got $batchDirs")
    val statPaths = spark.read.parquet(s"$tableDir/_skip")
      .select("path").collect().map(_.getString(0))
    val referenced = statPaths.map(p => p.split("/").takeRight(2).head).distinct
    assert(referenced.sorted.toSeq == batchDirs.sorted,
      s"sidecar must cover every batch dir: $referenced vs $batchDirs")
    // pruning bites: the 2-day window keeps a strict subset of files
    val lo = lit("2024-01-10 00:00:00").cast("timestamp")
    val hi = lit("2024-01-12 00:00:00").cast("timestamp")
    val keptN = spark.read.parquet(s"$tableDir/_skip")
      .where(!(col("max_ts") < lo || col("min_ts") >= hi)).count()
    assert(keptN > 0 && keptN < statPaths.length,
      s"kept $keptN of ${statPaths.length} files")
    // and the answer equals the batch computation
    val expect = ev.where(col("ts") >= lo && col("ts") < hi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    ev.unpersist()
    assert(result == expect, s"ingested read diverged: $result vs $expect")
  }

  test("transparent FileIndex skipping: the planner's pushed filters prune files") {
    val base = DataSkipping.dateClusteredOrders(spark, sf)
    val (df, idx) = graft.sources.SkippingFileIndex.readAuto(spark, base)
    val lo = lit("1997-01-01").cast("timestamp")
    val hi = lit("1997-04-01").cast("timestamp")
    // a plain where() — no explicit prune call anywhere
    val got = df.where(col("o_orderdate") >= lo && col("o_orderdate") < hi).count()
    val want = graft.Tables.orders(spark, sf)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi).count()
    assert(got == want, s"transparent skipping changed the answer: $got vs $want")
    val (kept, total) = idx.lastDecision.getOrElse(
      fail("listFiles was never called with the scan's data filters"))
    assert(kept < total && kept > 0,
      s"planner-pushed filters should have pruned files, kept $kept of $total")
    // an unfilterable query keeps everything (and still answers right)
    val (df2, idx2) = graft.sources.SkippingFileIndex.readAuto(spark, base)
    assert(df2.count() == graft.Tables.orders(spark, sf).count())
    val (k2, t2) = idx2.lastDecision.get
    assert(k2 == t2, s"no filters -> no pruning, kept $k2 of $t2")
    // a predicate shape zone maps can't serve degrades to keep-everything
    val (df3, idx3) = graft.sources.SkippingFileIndex.readAuto(spark, base)
    val n3 = df3.where(col("o_orderstatus") === "F").count()
    val w3 = graft.Tables.orders(spark, sf).where(col("o_orderstatus") === "F").count()
    assert(n3 == w3)
    val (k3, t3) = idx3.lastDecision.get
    assert(k3 == t3, s"untracked column must not prune, kept $k3 of $t3")
  }

  test("empty survivor list degenerates to an empty, schema-correct read") {
    val base = DataSkipping.dateClusteredOrders(spark, sf)
    val df = DataSkipping.readFiles(spark, base, Seq.empty)
    assert(df.columns.contains("o_orderkey") && df.count() == 0L)
  }
}
