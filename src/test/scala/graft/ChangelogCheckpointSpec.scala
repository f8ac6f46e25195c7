package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB CHANGELOG checkpointing (r10 verdict #6 — the builder's own
  * NOTES.md open item): with
  * `stateStore.rocksdb.changelogCheckpointing.enabled`, each commit
  * uploads only the batch's state DELTA (a `.changelog` file) instead of
  * a full snapshot — the low-RTO / low-upload mode for large state — and
  * recovery REPLAYS the changelog on top of the last snapshot. This spec
  * proves both halves at once: the checkpoint actually contains
  * changelog files (the mode engaged; with snapshot-every-batch it
  * wouldn't), and a restarted query folds the pre-restart state — which
  * it can only have obtained by replaying those changelogs, since the
  * snapshot interval is pushed beyond the batch count. */
class ChangelogCheckpointSpec extends AnyFunSuite {
  import TestSpark._

  test("changelog checkpointing engages and a restart replays the changelog") {
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "2")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    rs.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // push full snapshots beyond this test's batch count, so recovery has
    // ONLY changelogs to rebuild state from — if replay were broken the
    // restarted count would reset, and the assertion below would fail
    rs.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot", "100")
    import rs.implicits._
    class Counter extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, Long), (Long, Long)] {
      @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(om: OutputMode,
        tm: org.apache.spark.sql.streaming.TimeMode): Unit =
        n = getHandle.getValueState[Long]("n",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
      val next = (if (n.exists()) n.get() else 0L) + rows.size
      n.update(next)
      Iterator.single((user, next))
    }
    }

    val watch = Files.createTempDirectory("graft_clog_src").toString
    val ckpt = Files.createTempDirectory("graft_clog_ckpt").toString
    val outDir = Files.createTempDirectory("graft_clog_out").toString
    def run(): Unit = {
      val q = rs.readStream.schema("user_id LONG, v LONG").parquet(watch)
        .as[(Long, Long)].groupByKey(_._1)
        .transformWithState(new Counter, TimeMode.None(), OutputMode.Append())
        .toDF("user_id", "n")
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    Seq((1L, 0L), (1L, 0L), (2L, 0L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(watch)
    run()
    Seq((1L, 0L), (2L, 0L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(watch)
    run() // restart #1: must recover via changelog replay
    Seq((1L, 0L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(watch)
    run() // restart #2: replay across multiple changelogs
    // the mode really engaged: the state checkpoint holds .changelog files
    val stream = Files.walk(java.nio.file.Paths.get(ckpt))
    val changelogs =
      try {
        val it = stream.iterator()
        var found = Vector.empty[String]
        while (it.hasNext) {
          val p = it.next().toString
          if (p.endsWith(".changelog")) found :+= p
        }
        found
      } finally stream.close()
    assert(changelogs.nonEmpty,
      s"no .changelog files under $ckpt — changelog checkpointing did not engage")
    val rows = rs.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((1L, 4L)),
      s"restart #2 must fold replayed state (1 -> 4): $rows")
    assert(rows.contains((2L, 2L)), s"restart #1 lost user 2's state: $rows")
    assert(!rows.contains((1L, 1L)) || rows.contains((1L, 2L)),
      s"state was reset on restart: $rows")
  }
}
