package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two event-time TIMER semantics `stream_timer_sessions`
  * (streaming/EventsStream.timerSessions) depends on — both discovered
  * the hard way (7 trailing sessions silently missing) and load-bearing
  * for anyone composing timers with sentinel batches:
  *
  *  1. Timers fire against the EVICTION watermark, which lags one batch:
  *     a timer whose expiry the current batch's data just passed fires in
  *     the NEXT batch — hence the query's second sentinel.
  *  2. A filter on a NON-watermark column is pushed BELOW the
  *     EventTimeWatermark node (PushPredicateThroughNonJoin), so a
  *     sentinel row dropped by such a filter never reaches the watermark
  *     accumulator and the watermark NEVER advances — timers armed
  *     against it never fire. Sentinels must ride THROUGH the stateful
  *     operator (under a reserved key) and be dropped from the output.
  */
class TimerSemanticsSpec extends AnyFunSuite {
  import TestSpark._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def run(filterSentinels: Boolean): Seq[String] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rs = spark.newSession()
    rs.conf.set("spark.sql.shuffle.partitions", 2)
    rs.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    rs.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import rs.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = rs.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val base = mem.toDF().toDF("k", "ts").withWatermark("ts", "0 seconds")
    val in = if (filterSentinels) base.filter(col("k") =!= 99L) else base
    val out = in.as[(Long, Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new TimerProbeProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
    val name = s"timer_sem_${if (filterSentinels) "f" else "p"}"
    val q = out.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    try {
      mem.addData((1L, t(0)))   // arms a timer at 10:20
      q.processAllAvailable()
      mem.addData((99L, t(40))) // sentinel: watermark past the expiry...
      q.processAllAvailable()
      mem.addData((99L, t(50))) // ...and the follow-up batch timers fire in
      q.processAllAvailable()
      rs.table(name).collect().map(_.getString(0)).toSeq
    } finally q.stop()
  }

  test("a sentinel riding THROUGH the operator advances the watermark and fires timers") {
    val rows = run(filterSentinels = false)
    assert(rows.exists(_.startsWith("TIMER k=1")),
      s"the trailing timer must fire once sentinels advance the watermark: $rows")
    // semantics #1: it fired in the batch AFTER the watermark passed the
    // expiry — the firing row saw the 10:40 sentinel's watermark
    val fired = rows.find(_.startsWith("TIMER k=1")).get
    assert(fired.contains(s"wm=${t(40).getTime}"),
      s"eviction watermark lags one batch: $fired")
  }

  test("a sentinel FILTERED before the operator never advances the watermark (pushdown)") {
    val rows = run(filterSentinels = true)
    assert(!rows.exists(_.startsWith("TIMER")),
      s"documented hazard: the pre-operator filter pushes below the " +
        s"watermark node, so no timer may fire — if this ever starts " +
        s"firing, Spark changed the pushdown rule and timerSessions can " +
        s"simplify: $rows")
  }
}

/** Probe processor: arms a 10:20 timer for every key it sees and reports
  * firings with the watermark it observed. Top-level class — an inner
  * class would capture the suite and fail task serialization. */
class TimerProbeProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, java.sql.Timestamp), String] {
  @transient private var st: org.apache.spark.sql.streaming.ValueState[Long] = _
  private def expiry = java.sql.Timestamp.valueOf("2024-01-01 10:20:00").getTime
  override def init(o: OutputMode,
      tm: org.apache.spark.sql.streaming.TimeMode): Unit =
    st = getHandle.getValueState[Long]("n", org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(k: Long, rows: Iterator[(Long, java.sql.Timestamp)],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[String] = {
    st.update(if (st.exists()) st.get() + rows.size else rows.size.toLong)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(expiry)
    Iterator.single(s"k=$k wmLate=${tv.getCurrentWatermarkInMs()}")
  }
  override def handleExpiredTimer(k: Long,
      tv: org.apache.spark.sql.streaming.TimerValues,
      e: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[String] =
    Iterator.single(s"TIMER k=$k exp=${e.getExpiryTimeInMs()} wm=${tv.getCurrentWatermarkInMs()}")
}
