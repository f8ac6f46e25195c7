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
