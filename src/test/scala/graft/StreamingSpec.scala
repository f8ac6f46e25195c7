package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("tumbling window counts cover all events exactly once") {
    val total = EventsStream.tumblingCounts(spark, sf)
      .agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("sliding 2h/1h windows count every event exactly twice") {
    val total = EventsStream.slidingCounts(spark, sf)
      .agg(sum("n_events")).head().getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count())
  }

  test("sessionization partitions events and respects the gap") {
    val sessions = EventsStream.sessionize(spark, sf).cache()
    val nEvents = sessions.agg(sum("n_events")).head().getLong(0)
    assert(nEvents == Tables.events(spark, sf).count())
    // no two consecutive sessions of a user within the 30-min gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val bad = sessions
      .withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        unix_timestamp(col("session_start")) - unix_timestamp(col("prev_end")) <= 30 * 60)
      .count()
    assert(bad == 0, s"$bad session pairs violate the gap")
    sessions.unpersist()
  }

  test("multimodal feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.features(spark, sf).collect()
    val f2 = Multimodal.features(spark, sf).collect()
    assert(f1.sameElements(f2))
    assert(f1.forall(r => r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6) == r.getInt(1)))
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.forall(r => r.getInt(1) == 8 && r.getInt(2) == 2))
  }
}
