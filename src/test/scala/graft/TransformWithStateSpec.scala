package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** The contract the single-batch oracle replay of `stream_transform_state`
  * cannot see: the `transformWithState` ValueState genuinely CARRIES the
  * per-user totals across micro-batches (batch 2's emission includes
  * batch 1's events), on the RocksDB state store the API requires.
  */
class TransformWithStateSpec extends AnyFunSuite {
  import TestSpark._

  test("MapState keeps per-user per-type counts across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext
    // the composite-key state shape MapState exists for: per (user,
    // event_type) counters without one grouping key per combination —
    // a secondary index inside each user's state
    class TypeCounts extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, String), (Long, String, Long)] {
      @transient private var m: org.apache.spark.sql.streaming.MapState[String, Long] = _
      override def init(om: OutputMode,
          tm: org.apache.spark.sql.streaming.TimeMode): Unit =
        m = getHandle.getMapState[String, Long]("by_type",
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(user: Long, rows: Iterator[(Long, String)],
          tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, String, Long)] = {
        val touched = scala.collection.mutable.LinkedHashSet[String]()
        rows.foreach { case (_, t) =>
          m.updateValue(t, (if (m.containsKey(t)) m.getValue(t) else 0L) + 1L)
          touched += t
        }
        touched.iterator.map(t => (user, t, m.getValue(t)))
      }
    }
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().groupByKey(_._1)
      .transformWithState(new TypeCounts, TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "event_type", "n")
      .writeStream.format("memory").queryName("tws_mapstate")
      .outputMode("append").start()
    try {
      mem.addData((1L, "view"), (1L, "view"), (1L, "buy"), (2L, "view"))
      q.processAllAvailable()
      // batch 2 folds into the RESTORED per-type map entries
      mem.addData((1L, "view"), (2L, "buy"), (2L, "view"))
      q.processAllAvailable()
      val rows = rs.table("tws_mapstate").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      // the LAST emission per (user, type) carries the cumulative count
      val last = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(last((1L, "view")) == 3L, s"user 1 views: $last")
      assert(last((1L, "buy")) == 1L && last((2L, "view")) == 2L &&
        last((2L, "buy")) == 1L, s"map entries wrong: $last")
    } finally {
      q.stop()
      rs.catalog.dropTempView("tws_mapstate")
    }
  }

  test("initial-state bootstrap: batch totals migrate into streaming state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext
    // the batch->stream migration shape: a processor seeded per key from
    // a batch table via handleInitialState, then folding stream rows
    class Seeded extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, (Long, Long), (Long, Long), Long] {
      @transient private var total: org.apache.spark.sql.streaming.ValueState[Long] = _
      override def init(om: OutputMode,
          tm: org.apache.spark.sql.streaming.TimeMode): Unit =
        total = getHandle.getValueState[Long]("total",
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInitialState(key: Long, initial: Long,
          tv: org.apache.spark.sql.streaming.TimerValues): Unit =
        total.update(initial)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
          tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
        val next = (if (total.exists()) total.get() else 0L) + rows.map(_._2).sum
        total.update(next)
        Iterator.single((key, next))
      }
    }
    val initial = Seq((1L, 100L), (2L, 50L)).toDS().groupByKey(_._1).mapValues(_._2)
    val mem = MemoryStream[(Long, Long)]
    val out = mem.toDS().groupByKey(_._1)
      .transformWithState(new Seeded, TimeMode.None(), OutputMode.Append(), initial)
    val q = out.toDF().writeStream.format("memory").queryName("tws_seeded")
      .outputMode("append").start()
    try {
      // user 1 had batch history 100; user 3 is stream-only
      mem.addData((1L, 7L), (3L, 5L))
      q.processAllAvailable()
      val rows = rs.table("tws_seeded").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 107L), (3L, 5L)),
        s"seeded key folds batch history, fresh key starts at zero: $rows")
    } finally q.stop()
  }

  test("RocksDB state survives a stop/restart of a transformWithState query") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    // running per-user count in ValueState; emits the updated count
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
    val watch = Files.createTempDirectory("graft_tws_restart_src").toString
    val ckpt = Files.createTempDirectory("graft_tws_restart_ckpt").toString
    // the memory sink refuses Append-mode checkpoint recovery — a FILE
    // sink is the restartable kind, and reading its output back is the
    // production shape anyway
    val outDir = Files.createTempDirectory("graft_tws_restart_out").toString
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
    // new file while the query is DOWN; the restarted run must recover
    // user 1's count of 2 from the RocksDB store, not restart at zero
    Seq((1L, 0L)).toDF("user_id", "v")
      .coalesce(1).write.mode("append").parquet(watch)
    run()
    val rows = rs.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.contains((1L, 3L)),
      s"restarted query must fold recovered state (1 -> 3): $rows")
    assert(!rows.contains((1L, 1L)), s"state was reset on restart: $rows")
  }

  test("event-time timer closes an idle session via handleExpiredTimer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext

    // session-timeout processor: buffer events in ListState, (re)arm an
    // event-time timer 30 min after the latest event; when the watermark
    // passes it, emit the closed session and clear state
    class SessionCloser extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Timestamp), (Long, Long)] {
      @transient private var buf: org.apache.spark.sql.streaming.ListState[Long] = _
      override def init(outputMode: OutputMode,
          timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
        buf = getHandle.getListState[Long]("buf",
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.streaming.TTLConfig.NONE)
      override def handleInputRows(user: Long, rows: Iterator[(Long, Timestamp)],
          timers: org.apache.spark.sql.streaming.TimerValues): Iterator[(Long, Long)] = {
        var maxTs = 0L
        rows.foreach { case (id, ts) =>
          buf.appendValue(id); maxTs = math.max(maxTs, ts.getTime)
        }
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
        getHandle.registerTimer(maxTs + 30 * 60 * 1000L)
        Iterator.empty
      }
      override def handleExpiredTimer(user: Long,
          timers: org.apache.spark.sql.streaming.TimerValues,
          info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(Long, Long)] = {
        val n = buf.get().size
        buf.clear()
        Iterator.single((user, n.toLong))
      }
    }

    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val mem = MemoryStream[(Long, Timestamp)]
    val out = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
      .groupByKey(_._1 % 10)
      .transformWithState(new SessionCloser,
        TimeMode.EventTime(), OutputMode.Append())
    val q = out.toDF().writeStream.format("memory").queryName("tws_timer")
      .outputMode("append").start()
    try {
      // batch 1: three user-1 events up to 10:10 — timer armed for 10:40
      mem.addData((1L, t("10:00")), (11L, t("10:05")), (21L, t("10:10")))
      q.processAllAvailable()
      assert(rs.table("tws_timer").count() == 0, "nothing closes before the timer")
      // batch 2: unrelated user-2 event at 11:30 pushes the watermark past
      // 10:40 -> user 1's timer fires, session of 3 events emitted
      mem.addData((2L, t("11:30")))
      q.processAllAvailable()
      // one more batch so the 11:30-armed timer state is irrelevant; the
      // emission we check happened in batch 2
      val rows = rs.table("tws_timer").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 3L)),
        s"expected user 1's 3-event session closed by the timer, got ${rows.toSeq}")
    } finally q.stop()
  }

  test("ValueState carries per-user totals across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", "4")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext
    def ev(id: Long, user: Long, v: Double) = EventsStream.Ev(
      id, Timestamp.valueOf("2024-01-01 10:00:00"), user, "view", v, "{}")
    val mem = MemoryStream[EventsStream.Ev]
    val out = mem.toDS().groupByKey(_.user_id)
      .transformWithState(new EventsStream.TotalsProcessor,
        TimeMode.None(), OutputMode.Append())
    val q = out.toDF().writeStream.format("memory").queryName("tws_spec")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, 1L, 10.0), ev(2, 1L, 5.5), ev(3, 2L, 1.0))
      q.processAllAvailable()
      mem.addData(ev(4, 1L, 2.25), ev(5, 3L, 7.0))
      q.processAllAvailable()
      val rows = rs.table("tws_spec").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // user 1 emitted once per batch; the second emission must FOLD IN
      // batch 1 (n=3, 1000+550+225 cents) — state carried, not reset
      val u1 = rows.filter(_._1 == 1L)
      assert(u1.length == 2, s"user 1 should emit once per batch: $u1")
      assert(u1.contains((1L, 2L, 1550L, 1000L)), s"batch-1 totals wrong: $u1")
      assert(u1.contains((1L, 3L, 1775L, 1000L)), s"batch-2 must include batch-1: $u1")
      // user 2 only in batch 1, user 3 only in batch 2
      assert(rows.filter(_._1 == 2L).toSeq == Seq((2L, 1L, 100L, 100L)))
      assert(rows.filter(_._1 == 3L).toSeq == Seq((3L, 1L, 700L, 700L)))
    } finally q.stop()
  }
}
