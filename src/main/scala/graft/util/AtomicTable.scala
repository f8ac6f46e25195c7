package graft.util

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's atomic table commit over plain parquet directories — the
  * crash-safe substitute for a transactional table format (no Delta/Iceberg
  * jars in this environment; if they appear, each `publish` becomes a
  * `MERGE`/`REPLACE TABLE` and this object retires).
  *
  * Layout under a logical table path `base`:
  * {{{
  *   base/_v<N>/      immutable published versions (ordinary parquet dirs)
  *   base/_CURRENT    pointer file whose CONTENT is the live version name
  * }}}
  *
  * `publish` writes the new version to a fresh `_v<N>` directory, then
  * replaces `_CURRENT` with an atomic rename (write a tmp file,
  * `Files.move(ATOMIC_MOVE | REPLACE_EXISTING)` = POSIX `rename(2)`; on an
  * object store the equivalent is the atomic PUT of the pointer object).
  * A crash at ANY point leaves `_CURRENT` referencing a fully-written
  * version: before the pointer move readers still see the previous
  * version; after it they see the new one. There is no delete-then-move
  * window — stale versions are pruned only AFTER the pointer is live, and
  * a crash during pruning strands garbage, never the table.
  *
  * Single-writer per table is assumed (matching the reference's
  * truncate-and-reload batch model, etl_lakehouse.py:21-35); concurrent
  * writers would need a lock or a CAS on the pointer. */
object AtomicTable {

  private val Pointer = "_CURRENT"
  private val VersionRe = "_v(\\d+)".r

  private def versions(root: Path): Seq[(Long, Path)] =
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val stream = Files.list(root)
      try stream.iterator().asScala.flatMap { p =>
        p.getFileName.toString match {
          case VersionRe(n) => Some((n.toLong, p))
          case _            => None
        }
      }.toSeq
      finally stream.close() // directory streams hold an fd until closed
    }

  /** Live version directory, or None if never published. */
  def resolve(base: String): Option[String] = {
    val ptr = Paths.get(base, Pointer)
    if (Files.exists(ptr)) Some(base + "/" + Files.readString(ptr).trim)
    else None
  }

  def exists(base: String): Boolean = resolve(base).isDefined

  /** DataFrame over the version that is current NOW. The plan is pinned
    * to that version directory, so it stays consistent while later
    * publishes happen — but with `keep = 1` the NEXT publish prunes the
    * directory out from under a still-held DataFrame. A reader that must
    * survive concurrent reloads needs the writer to publish with
    * `keep >= 2` (retention is the crash-safe answer to read/prune races,
    * exactly as in transactional table formats). */
  def read(s: SparkSession, base: String): DataFrame =
    s.read.parquet(resolve(base).getOrElse(
      throw new IllegalStateException(s"no published version at $base")))

  private val Log = "_LOG"

  /** Published-version lineage, oldest first: the `_LOG` records every
    * pointer swap, so published versions are distinguishable from
    * crashed-orphan directories. Only versions still on disk are
    * returned — i.e. the time-travel horizon. */
  def history(base: String): Seq[String] = {
    val log = Paths.get(base, Log)
    if (!Files.exists(log)) Seq.empty
    else {
      val onDisk = versions(Paths.get(base)).map(_._2.getFileName.toString).toSet
      Files.readString(log).linesIterator.map(_.trim).filter(onDisk).toSeq
    }
  }

  /** Read a retained historical version by name from [[history]]. */
  def readVersion(s: SparkSession, base: String, version: String): DataFrame = {
    require(history(base).contains(version),
      s"version $version is not in the published, still-retained history of $base")
    s.read.parquet(base + "/" + version)
  }

  /** Atomically publish one new version of the table at `base`. `write` is
    * handed the fresh version directory and must fully materialize it
    * (e.g. `df.write.parquet(_)`); the version becomes visible only via
    * the subsequent pointer swap. `keep` > 1 retains that many published
    * versions for time travel ([[readVersion]]); older versions and
    * crashed orphans are pruned only AFTER the new pointer is live. */
  def publish(base: String, keep: Int = 1)(write: String => Unit): Unit = {
    require(keep >= 1, "must keep at least the current version")
    val root = Paths.get(base)
    Files.createDirectories(root)
    val existing = versions(root)
    val name = s"_v${existing.map(_._1).maxOption.getOrElse(0L) + 1L}"
    write(base + "/" + name) // crash before the swap: pointer untouched
    val tmp = root.resolve(Pointer + ".tmp")
    Files.writeString(tmp, name)
    Files.move(tmp, root.resolve(Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // lineage append — rewritten whole + atomic move (metadata only; a
    // crash here costs time-travel history, never the live table)
    val logPath = root.resolve(Log)
    val prevLog = if (Files.exists(logPath)) Files.readString(logPath) else ""
    val logTmp = root.resolve(Log + ".tmp")
    Files.writeString(logTmp, prevLog + name + "\n")
    Files.move(logTmp, logPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // only after the new version is live: prune everything outside the
    // retained lineage tail — older published versions beyond `keep` AND
    // crashed-orphan dirs (best-effort; failure strands disk, not
    // correctness)
    val retained = history(base).takeRight(keep).toSet
    versions(root).filterNot(v => retained(v._2.getFileName.toString)).foreach { case (_, p) =>
      try deleteRecursively(p) catch { case _: java.io.IOException => () }
    }
  }

  def overwrite(df: DataFrame, base: String, keep: Int = 1): Unit =
    publish(base, keep)(df.write.mode("overwrite").parquet(_))

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      val paths = try stream.iterator().asScala.toSeq.reverse finally stream.close()
      paths.foreach(Files.delete)
    }
}
