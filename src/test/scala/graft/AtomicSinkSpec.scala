package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.GraftSink

/** Transactional-write-protocol contracts of [[graft.sources.GraftSink]]
  * that the differential gate's happy-path roundtrip cannot see: abort
  * leaves nothing readable, stray files are invisible, a second append
  * lands atomically in the manifest, and staging never leaks into reads.
  */
class AtomicSinkSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(tag: String): String = {
    val p = Paths.get(s"/tmp/graft_sink_spec/$tag")
    if (Files.exists(p)) {
      val it = Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
      try it.forEach(f => Files.deleteIfExists(f)) finally it.close()
    }
    Files.createDirectories(p)
    p.toString
  }

  private def sample = Tables.orders(spark, sf)
    .select(col("o_orderkey"), col("o_orderstatus"))
    .limit(500)

  test("append publishes exactly the written rows; stray files are invisible") {
    val dir = freshDir("stray")
    val df = sample.cache()
    val n = df.count()
    df.write.format("graft.sources.GraftSink").option("path", dir)
      .mode("append").save()
    // a part file the manifest never saw — crashed task, concurrent
    // writer, manual copy: all must be invisible to readers
    Files.write(Paths.get(dir, "part-stray.jsonl"),
      "{\"o_orderkey\":-1,\"o_orderstatus\":\"X\"}\n".getBytes(StandardCharsets.UTF_8))
    val back = GraftSink.readBack(spark, dir, df.schema)
    assert(back.count() == n)
    assert(back.filter(col("o_orderkey") === -1).count() == 0)
    df.unpersist()
  }

  test("second append accumulates atomically; no temp manifest remains") {
    val dir = freshDir("append")
    val df = sample
    df.write.format("graft.sources.GraftSink").option("path", dir).mode("append").save()
    df.write.format("graft.sources.GraftSink").option("path", dir).mode("append").save()
    val back = GraftSink.readBack(spark, dir, df.schema)
    assert(back.count() == 2 * df.count())
    val leftovers = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("_MANIFEST."))
    assert(leftovers.isEmpty, s"temp manifest leaked: ${leftovers.mkString(",")}")
  }

  test("two concurrent job commits both land in the manifest (no lost update)") {
    val dir = freshDir("race")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    def commitOne(qid: String, n: Int): Unit = {
      val factory = new graft.sources.SinkWriterFactory(dir, schema, qid)
      val msgs = (0 until n).map { p =>
        val w = factory.createWriter(p, p.toLong)
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        row.setLong(0, p.toLong)
        w.write(row)
        w.commit()
      }.toArray[org.apache.spark.sql.connector.write.WriterCommitMessage]
      new graft.sources.SinkBatchWrite(dir, schema, qid).commit(msgs)
    }
    // race 8 committing jobs; without the commit lock the manifest's
    // read-modify-write loses whole jobs (last rename wins)
    val threads = (0 until 8).map { i =>
      new Thread(() => commitOne(s"race$i", 3))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val mf = java.nio.file.Paths.get(dir, "_MANIFEST")
    val files = new String(Files.readAllBytes(mf), StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).toSeq
    assert(files.length == 24, s"all 8 jobs x 3 files must survive: ${files.length}")
    assert(GraftSink.readBack(spark, dir, schema).count() == 24)
    assert(!Files.exists(java.nio.file.Paths.get(dir, "_COMMIT_LOCK")))
  }

  test("aborted task leaves no staged file and nothing readable") {
    val dir = freshDir("abort")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    // drive the task-level API directly: write rows, then ABORT
    val factory = new graft.sources.SinkWriterFactory(dir, schema, "qabort")
    val w = factory.createWriter(0, 7L)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    row.setLong(0, 42L)
    w.write(row)
    w.abort()
    assert(!Files.exists(Paths.get(dir, ".staging", "part-qabort-0-7.jsonl")))
    assert(GraftSink.readBack(spark, dir, schema).count() == 0)
  }

  test("commit message with zero rows publishes no file") {
    val dir = freshDir("empty")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType)))
    val factory = new graft.sources.SinkWriterFactory(dir, schema, "qempty")
    val w = factory.createWriter(1, 9L)
    val msg = w.commit() // closed with zero rows
    new graft.sources.SinkBatchWrite(dir, schema, "qempty")
      .commit(Array(msg))
    val mf = Paths.get(dir, "_MANIFEST")
    assert(Files.exists(mf))
    assert(new String(Files.readAllBytes(mf), StandardCharsets.UTF_8).trim.isEmpty)
  }
}
