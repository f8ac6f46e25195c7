package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Multi-batch streaming replay: split the events into 3 files and drive
  * the upsert sink one file per micro-batch in Update mode, so each batch
  * emits ONLY the keys it touched — keys from earlier batches must survive
  * through the parquet state table. This is the test where the
  * full-outer-merge logic genuinely bites (single-batch Complete-mode
  * replay exercises it only degenerately). */
class MultiBatchStreamSpec extends AnyFunSuite {
  import TestSpark._

  test("watermark drops late rows deterministically across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val mem = MemoryStream[(Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_late")
      .outputMode("append").start()
    try {
      // batch 1: two rows in the 10:00 window + one at 10:25 that pushes
      // the post-batch watermark to 10:15
      mem.addData((t("10:00"), 1L), (t("10:05"), 2L), (t("10:25"), 3L))
      q.processAllAvailable()
      // batch 2: a LATE row for the 10:00 window (10:02 < watermark 10:15
      // -> must be dropped) plus an on-time row; the 10:00 window is
      // finalized this batch WITHOUT the late row
      mem.addData((t("10:02"), 4L), (t("10:26"), 5L))
      q.processAllAvailable()
      // batch 3: advance far enough to close the 10:20 window too
      mem.addData((t("11:00"), 6L))
      q.processAllAvailable()
      val rows = spark.table("wm_late")
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(rows(t("10:00")) == 2L,  // late 10:02 row dropped, not 3
        s"10:00 window must exclude the late row; got ${rows.get(t("10:00"))}")
      assert(rows(t("10:20")) == 2L)  // 10:25 + 10:26 both on time
      // total received vs dropped is visible in the progress metrics too
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped == 1L, s"exactly the one late row is dropped, got $dropped")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits the null-padded row only after expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val v = views.toDF().toDF("v_user", "vts").withWatermark("vts", "0 seconds")
    val p = purchases.toDF().toDF("p_user", "pts").withWatermark("pts", "0 seconds")
    val joined = v.join(p,
      expr("v_user = p_user AND pts >= vts AND pts <= vts + INTERVAL 1 HOUR"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("ss_louter")
      .outputMode("append").start()
    try {
      // batch 1: user 1's view matches a purchase in-window; user 2's
      // view has no purchase — it must NOT emit yet (its window is open)
      views.addData((1L, t("10:00")), (2L, t("10:05")))
      purchases.addData((1L, t("10:30")))
      q.processAllAvailable()
      val b1 = spark.table("ss_louter").collect()
      assert(b1.length == 1 && b1.head.getLong(0) == 1L,
        s"only the matched pair emits before expiry: ${b1.toSeq}")
      // batch 2: advance BOTH watermarks past 11:05 (view-ts + 1h) ->
      // user 2's view is expired from state and emits null-padded
      views.addData((9L, t("13:00")))
      purchases.addData((9L, t("13:00")))
      q.processAllAvailable()
      // one more no-op-ish batch lets the eviction surface in sinks that
      // flush on the following micro-batch
      views.addData((8L, t("13:30")))
      purchases.addData((8L, t("13:30")))
      q.processAllAvailable()
      val rows = spark.table("ss_louter").collect()
      val padded = rows.filter(r => r.getLong(0) == 2L)
      assert(padded.length == 1 && padded.head.isNullAt(2),
        s"expired unmatched view must emit exactly one null-padded row: ${rows.toSeq}")
    } finally q.stop()
  }

  test("full-outer stream-stream join pads BOTH sides' unmatched rows after expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val views = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp)]
    val v = views.toDF().toDF("v_user", "vts").withWatermark("vts", "0 seconds")
    val p = purchases.toDF().toDF("p_user", "pts").withWatermark("pts", "0 seconds")
    val joined = v.join(p,
      expr("v_user = p_user AND pts >= vts AND pts <= vts + INTERVAL 1 HOUR"),
      "fullOuter")
    val q = joined.writeStream.format("memory").queryName("ss_fouter")
      .outputMode("append").start()
    try {
      // batch 1: user 1 matches in-window; user 2 has only a VIEW, user 3
      // has only a PURCHASE — neither may emit while its window is open
      views.addData((1L, t("10:00")), (2L, t("10:05")))
      purchases.addData((1L, t("10:30")), (3L, t("10:20")))
      q.processAllAvailable()
      val b1 = spark.table("ss_fouter").collect()
      assert(b1.length == 1 && b1.head.getLong(0) == 1L,
        s"only the matched pair emits before expiry: ${b1.toSeq}")
      // advance BOTH watermarks far past every open window, then one more
      // batch so eviction surfaces
      views.addData((9L, t("13:00")))
      purchases.addData((9L, t("13:00")))
      q.processAllAvailable()
      views.addData((8L, t("13:30")))
      purchases.addData((8L, t("13:30")))
      q.processAllAvailable()
      val rows = spark.table("ss_fouter").collect()
      // exactly ONE null-padded row per unmatched side
      val leftPad = rows.filter(r => !r.isNullAt(0) && r.getLong(0) == 2L)
      assert(leftPad.length == 1 && leftPad.head.isNullAt(2) && leftPad.head.isNullAt(3),
        s"expired unmatched VIEW must emit one right-padded row: ${rows.toSeq}")
      val rightPad = rows.filter(r => !r.isNullAt(2) && r.getLong(2) == 3L)
      assert(rightPad.length == 1 && rightPad.head.isNullAt(0) && rightPad.head.isNullAt(1),
        s"expired unmatched PURCHASE must emit one left-padded row: ${rows.toSeq}")
      // and the matched pair emitted exactly once, never re-padded
      assert(rows.count(r => !r.isNullAt(0) && r.getLong(0) == 1L) == 1,
        s"matched pair must appear exactly once: ${rows.toSeq}")
    } finally q.stop()
  }

  test("topk_min streaming state restores and merges across micro-batches") {
    // the custom TypedImperativeAggregate's serialize/deserialize is the
    // state-store contract: batch 2's candidates must merge against the
    // RESTORED batch-1 buffers, evicting and keeping correctly
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val mem = MemoryStream[(Long, Long, Long)]
    val agg = mem.toDF().toDF("g", "id", "d")
      .groupBy("g")
      .agg(call_function("topk_min", col("d"), col("id"), lit(3)).as("top"))
    val q = agg.writeStream.format("memory").queryName("topk_state")
      .outputMode("complete").start()
    try {
      mem.addData((1L, 10L, 50L), (1L, 11L, 40L), (2L, 20L, 5L))
      q.processAllAvailable()
      // batch 2: a better candidate (d=10) must enter, d=60 must be
      // rejected, and the restored d=50 must be evicted by d=45
      mem.addData((1L, 12L, 10L), (1L, 13L, 45L), (1L, 14L, 60L), (2L, 21L, 4L))
      q.processAllAvailable()
      val rows = spark.table("topk_state").collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))).toMap
      assert(rows(1L) == Seq((12L, 10L), (11L, 40L), (13L, 45L)),
        s"group 1 state wrong: ${rows(1L)}")
      assert(rows(2L) == Seq((21L, 4L), (20L, 5L)),
        s"group 2 state wrong: ${rows(2L)}")
    } finally q.stop()
  }

  test("foreachBatch upsert merge survives multi-batch Update-mode replay") {
    val src = "/tmp/graft_multibatch_src"
    val stateDir = "/tmp/graft_multibatch_state/user_totals"
    // stage: 3 chunk files, split by event_id so batches touch overlapping
    // but not identical user sets
    val ev = Tables.events(spark, sf).cache()
    import java.nio.file.{Files, Paths}
    def rmrf(p: String): Unit = if (Files.exists(Paths.get(p))) {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(p)).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    rmrf(src)
    (0 until 3).foreach { i =>
      ev.filter(col("event_id") % 3 === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/chunk$i")
    }
    // flatten the part files into the watched dir
    import scala.jdk.CollectionConverters._
    Files.createDirectories(Paths.get(src))
    (0 until 3).foreach { i =>
      val part = Files.list(Paths.get(s"$src/chunk$i")).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(s"$src/file$i.parquet"))
      rmrf(s"$src/chunk$i")
    }

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(src)
    val result = EventsStream.upsertSinkFrom(spark, stream, stateDir, OutputMode.Update)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val expect = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    ev.unpersist()

    assert(result.keySet == expect.keySet,
      s"missing=${expect.keySet -- result.keySet} extra=${result.keySet -- expect.keySet}")
    expect.foreach { case (u, (n, v)) =>
      assert(result(u)._1 == n, s"user $u count ${result(u)._1} != $n")
      assert(math.abs(result(u)._2 - v) < 1e-6, s"user $u value ${result(u)._2} != $v")
    }
  }
}
