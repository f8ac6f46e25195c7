package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.util.AtomicTable

/** Crash-safety contract of the pointer-swap commit: at EVERY intermediate
  * state of a publish, a reader resolving the pointer sees a complete
  * table — never a missing or half-written one. */
class AtomicTableSpec extends AnyFunSuite {
  import TestSpark._

  private def freshBase(): String =
    Files.createTempDirectory("graft_atomic").toString + "/t"

  private def df(n: Int) = {
    import spark.implicits._
    (1 to n).toDF("x")
  }

  test("publish then read round-trips; republish supersedes atomically") {
    val base = freshBase()
    assert(!AtomicTable.exists(base))
    AtomicTable.overwrite(df(3), base)
    assert(AtomicTable.read(spark, base).count() == 3)
    AtomicTable.overwrite(df(5), base)
    assert(AtomicTable.read(spark, base).count() == 5)
    // stale version was pruned after the swap
    val versions = Files.list(Paths.get(base)).iterator()
    var vDirs = 0
    versions.forEachRemaining(p => if (p.getFileName.toString.startsWith("_v")) vDirs += 1)
    assert(vDirs == 1, "superseded versions must be pruned")
  }

  test("crash after writing the new version but BEFORE the pointer swap: readers stay on the old complete version") {
    val base = freshBase()
    AtomicTable.overwrite(df(3), base)
    // simulate the crash window: a half-written next version exists on
    // disk (no _SUCCESS, truncated file), pointer never swapped
    val half = Paths.get(base, "_v99")
    Files.createDirectories(half)
    Files.writeString(half.resolve("part-00000.parquet"), "not parquet")
    assert(AtomicTable.read(spark, base).count() == 3, "reader must not see the crashed version")
    // recovery: the next successful publish supersedes and prunes the orphan
    AtomicTable.overwrite(df(7), base)
    assert(AtomicTable.read(spark, base).count() == 7)
    assert(!Files.exists(half), "crashed orphan version must be pruned on next publish")
  }

  test("crash BEFORE any publish completes: table reports not-exists rather than a half state") {
    val base = freshBase()
    val half = Paths.get(base, "_v1")
    Files.createDirectories(half)
    Files.writeString(half.resolve("part-00000.parquet"), "garbage")
    assert(!AtomicTable.exists(base))
    intercept[IllegalStateException](AtomicTable.read(spark, base))
  }

  test("time travel: keep=2 retains the previous published version, prunes older and orphans") {
    val base = freshBase()
    AtomicTable.overwrite(df(1), base, keep = 2)
    AtomicTable.overwrite(df(2), base, keep = 2)
    // a crashed orphan must not pollute the history
    Files.createDirectories(Paths.get(base, "_v50"))
    AtomicTable.overwrite(df(3), base, keep = 2)
    assert(AtomicTable.read(spark, base).count() == 3)
    val hist = AtomicTable.history(base)
    assert(hist.size == 2, s"expected 2 retained versions, got $hist")
    assert(AtomicTable.readVersion(spark, base, hist.head).count() == 2)
    assert(!Files.exists(Paths.get(base, "_v50")), "orphan survived pruning")
    intercept[IllegalArgumentException](AtomicTable.readVersion(spark, base, "_v1"))
  }

  test("a DataFrame held across a reload survives when the writer publishes with keep=2") {
    val base = freshBase()
    AtomicTable.overwrite(df(3), base, keep = 2)
    val held = AtomicTable.read(spark, base) // pinned to _v1
    AtomicTable.overwrite(df(5), base, keep = 2)
    // the held plan still reads its complete snapshot (retention covers
    // the read/prune race the scaladoc documents)...
    assert(held.count() == 3)
    // ...while fresh readers see the new version
    assert(AtomicTable.read(spark, base).count() == 5)
  }

  test("a failing writer leaves the previous version live") {
    val base = freshBase()
    AtomicTable.overwrite(df(3), base)
    intercept[RuntimeException] {
      AtomicTable.publish(base)(_ => throw new RuntimeException("writer died"))
    }
    assert(AtomicTable.read(spark, base).count() == 3)
  }
}
