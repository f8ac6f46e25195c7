package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.util.AtomicTable

/** Child-JVM driver for [[CrossProcessLockSpec]] — the SECOND PROCESS
  * the `_LOCK`/`_APPEND_LOCK` file locks exist for. Inside one JVM the
  * per-table object monitor serializes writers first and the OS
  * `FileChannel` lock never contends (the r14 "wrong #1" finding: every
  * prior stress test was single-JVM); this main is launched via
  * ProcessBuilder on the test classpath so the file-lock branch finally
  * runs under real cross-process contention. No SparkSession — the
  * commit protocol is pure file IO, so the child stays sub-second to
  * start and the contention window is tight.
  *
  * Modes:
  *  - `append <base> <appId> <nBatches> <keep> <expect>` — idempotent
  *    append of one marker file per batch, each immediately replayed
  *    (the replay must SKIP). `expect=fresh` requires every first
  *    attempt to commit; `expect=replay` requires every attempt to skip
  *    (the restarted-writer exactly-once contract). Any violation exits
  *    nonzero with a message — the parent asserts exit == 0.
  *  - `hold <base> <lockFile> <holdMs>` — take the raw OS lock on the
  *    named lock file, print `HELD`, sleep, release. The parent uses
  *    this to force a deterministic lost-race on each lock file and
  *    prove the other side BLOCKS until release (never errors, never
  *    proceeds early).
  */
object LockChild {

  def main(args: Array[String]): Unit = args(0) match {
    case "append" =>
      val Array(_, base, appId, nBatches, keep, expect) = args
      var b = 1
      while (b <= nBatches.toInt) {
        def once(): Boolean =
          AtomicTable.appendIdempotent(base, appId, b.toLong, keep.toInt) { dir =>
            Files.writeString(Paths.get(dir, s"$appId-b$b.txt"), s"$appId $b\n",
              StandardOpenOption.CREATE_NEW)
          }
        val ran = once()
        expect match {
          case "fresh" =>
            if (!ran) { System.err.println(s"FRESH SKIPPED: $appId b$b"); sys.exit(3) }
            // immediate same-txn replay must skip even under contention
            if (once()) { System.err.println(s"REPLAY RAN: $appId b$b"); sys.exit(4) }
          case "replay" =>
            if (ran) { System.err.println(s"RESTART REPLAY RAN: $appId b$b"); sys.exit(5) }
        }
        b += 1
      }
      println(s"DONE $appId")

    case "hold" =>
      val Array(_, base, lockFile, holdMs) = args
      val root = Paths.get(base)
      Files.createDirectories(root)
      val ch = java.nio.channels.FileChannel.open(root.resolve(lockFile),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      val l = ch.lock()
      println("HELD"); System.out.flush()
      Thread.sleep(holdMs.toLong)
      l.release(); ch.close()
      println("RELEASED")

    case other =>
      System.err.println(s"unknown mode $other"); sys.exit(2)
  }
}
