package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MergeOnRead
import graft.util.AtomicTable

/** CDF floor under a LIVE STREAM reader (r13 verdict #7, the streaming
  * half — the batch half lives in ConcurrentStressSpec): a file-stream
  * source lists the feed per micro-batch, so a swept-before-listed file
  * would just never appear — silent data loss. The contract, proven
  * here against a real readStream over `_changes`:
  *  - a sweep that keeps the stream's UNREAD range is invisible —
  *    already-processed commits vacuum freely under the live query;
  *  - a sweep past the stream's position refuses LOUDLY via
  *    [[MergeOnRead.requireStreamContinuity]] (the foreachBatch guard),
  *    with the same precise below-floor language as the batch reader —
  *    never a silently shorter result. */
class CdfStreamSweepSpec extends AnyFunSuite {
  import TestSpark._

  private def stage(name: String): String = {
    val base = s"/tmp/graft_cdf_stream_spec/$name"
    AtomicTable.deleteRecursively(Paths.get(base))
    AtomicTable.publish(base) { dir =>
      Tables.orders(spark, sf).limit(1000)
        .repartition(2).write.mode("overwrite").parquet(dir)
    }
    base
  }

  private def merge(base: String, m: Int, v: Long): Unit = {
    val b = Tables.orders(spark, sf).limit(1000)
      .where(col("o_orderkey") % m === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
    MergeOnRead.mergeUpsert(spark, base, b, "o_orderkey", cdfVersion = Some(v))
  }

  /** Start a guarded CDF stream: collects seen commit versions into the
    * caller's set (shared across restarts, like any real reader's state)
    * and runs the continuity guard every micro-batch. */
  private def startGuarded(base: String,
      seen: java.util.Set[java.lang.Long],
      checkpoint: Option[String] = None) = {
    val dir = MergeOnRead.changesPath(base)
    val schema = spark.read.parquet(dir).schema
    val fn: (DataFrame, Long) => Unit = (df, _) => {
      // guard FIRST, with the high-water mark from BEFORE this batch —
      // guarding after absorbing the batch would hide the gap the batch
      // just jumped over
      val last = if (seen.isEmpty) 0L
      else seen.toArray(Array.empty[java.lang.Long]).map(_.longValue).max
      MergeOnRead.requireStreamContinuity(base, last)
      df.select("_commit_version").distinct().collect()
        .foreach(r => seen.add(r.getLong(0)))
    }
    val w = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .writeStream.foreachBatch(fn)
    checkpoint.fold(w)(c => w.option("checkpointLocation", c)).start()
  }

  test("a live stream survives sweeps that keep its unread range") {
    val base = stage("keeprange")
    merge(base, 5, 1L); merge(base, 7, 2L)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
    val q = startGuarded(base, seen)
    try {
      q.processAllAvailable() // commits 1,2 processed
      assert(seen.contains(1L) && seen.contains(2L))
      // two more commits land, then a sweep vacuums the two PROCESSED
      // commits out from under the live query — its unread range (3,4)
      // is kept, so the stream must not notice
      merge(base, 11, 3L); merge(base, 13, 4L)
      assert(MergeOnRead.vacuumChanges(base, keepCommits = 2) == 2)
      assert(MergeOnRead.changesFloor(base) == 3L)
      q.processAllAvailable()
      assert(Seq(1L, 2L, 3L, 4L).map(java.lang.Long.valueOf).forall(seen.contains),
        s"stream must deliver every commit exactly despite the sweep; saw $seen")
      assert(q.exception.isEmpty, s"guard must stay silent: ${q.exception}")
    } finally q.stop()
  }

  test("a sweep past an OFFLINE reader's position refuses loudly on restart") {
    // the realistic loss shape: a checkpointed reader is down while
    // commits land AND an aggressive sweep removes them — on restart the
    // file source would silently list only the survivors. A LIVE reader
    // keeps up by construction (the previous test); the gap opens while
    // it is offline.
    val base = stage("pastrange")
    merge(base, 5, 1L)
    val ckpt = s"/tmp/graft_cdf_stream_spec/pastrange_ckpt"
    AtomicTable.deleteRecursively(Paths.get(ckpt))
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
    val q1 = startGuarded(base, seen, Some(ckpt))
    try {
      q1.processAllAvailable() // commit 1 processed, checkpointed
      assert(seen.contains(java.lang.Long.valueOf(1L)))
    } finally q1.stop()
    // reader offline: three commits land, the sweep keeps only the newest
    merge(base, 11, 2L); merge(base, 13, 3L); merge(base, 17, 4L)
    MergeOnRead.vacuumChanges(base, keepCommits = 1)
    assert(MergeOnRead.changesFloor(base) == 4L)
    // restart from the checkpoint: the source lists only commit 4 —
    // commits 2..3 are gone UNREAD; the guard must refuse, not let the
    // stream deliver a feed with a hole
    val q2 = startGuarded(base, seen, Some(ckpt))
    try {
      val e = intercept[Exception] { q2.processAllAvailable() }
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).map(c => Option(c.getMessage).getOrElse("")).getOrElse("")
      assert(msg.contains("vacuumed past the stream reader"),
        s"must refuse with the precise continuity message, got: $msg")
      assert(msg.contains("commits 2..3 are gone"),
        s"must name the lost commits, got: $msg")
    } finally q2.stop()
  }
}
