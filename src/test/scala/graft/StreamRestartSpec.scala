package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Restart semantics: a stateful streaming aggregation driven with
  * Trigger.AvailableNow and a checkpoint must (a) stop cleanly when the
  * backlog is drained, (b) on restart, resume from the recorded offsets —
  * never re-reading already-committed input — and (c) recover its
  * aggregation STATE from the state store, so results accumulate across
  * runs as if the stream had never stopped. */
class StreamRestartSpec extends AnyFunSuite {
  import TestSpark._

  test("AvailableNow + checkpoint: offsets and agg state survive a stop/restart") {
    import spark.implicits._
    val watch = Files.createTempDirectory("graft_restart_src").toString
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString

    def startQuery() = spark.readStream
      .schema("user_id INT, value DOUBLE")
      .parquet(watch)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .format("memory").queryName("graft_restart_test")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()

    // phase 1: two users, three rows
    Seq((1, 10.0), (1, 5.0), (2, 7.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(watch)
    val q1 = startQuery()
    q1.awaitTermination()
    val after1 = spark.table("graft_restart_test").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after1 == Map(1 -> ((2L, 15.0)), 2 -> ((1L, 7.0))))

    // phase 2: new file arrives while the query is DOWN; restart
    Seq((1, 1.0), (3, 2.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(watch)
    val q2 = startQuery()
    q2.awaitTermination()

    // only the new file was read after restart...
    val rowsRead2 = q2.recentProgress.map(_.numInputRows).sum
    assert(rowsRead2 == 2, s"restart re-read committed input (numInputRows=$rowsRead2)")
    // ...yet the aggregate includes phase-1 contributions: that history can
    // only have come from the recovered state store
    val after2 = spark.table("graft_restart_test").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(after2 == Map(1 -> ((3L, 16.0)), 2 -> ((1L, 7.0)), 3 -> ((1L, 2.0))))
  }
}
