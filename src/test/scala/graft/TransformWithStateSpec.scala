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
