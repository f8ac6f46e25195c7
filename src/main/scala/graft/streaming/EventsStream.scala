package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Structured Streaming over the `events` table (SURVEY.md §2.10 — ABSENT
  * in the reference; §7.5 extension surface).
  *
  * Each query runs a real streaming pipeline — `readStream` file source →
  * event-time transforms → memory sink — driven to completion with
  * `processAllAvailable()`, then returns the sink table so the driver's
  * batch-oriented harness can verify it. Because the file source delivers
  * everything in one batch, the streaming results equal their batch SQL
  * equivalents, which is exactly what the DuckDB oracles check.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (10 min event-time lag → state for at most ~watermark/slide windows per
  * key group); sessionization state is one small case class per active
  * user, evicted via ProcessingTimeTimeout in a long-running deployment.
  * Both shuffle once on the grouping key — same as their batch analogs.
  */
object EventsStream {

  /** All streaming queries run on a per-base-session CLONE with 4 shuffle
    * partitions: stateful operators fix their state-store partition count
    * at the first checkpoint, and each partition pays a per-micro-batch
    * store-commit cost regardless of data volume — at test volumes 32
    * partitions are pure fixed overhead (~30-40% of every stream query's
    * wall clock), while the batch session's 32 stay untouched. The clone
    * also disables the no-data micro-batch: it exists to advance the
    * watermark so APPEND-mode aggregations can emit closed windows, but
    * every query here either runs Complete mode (emits each batch) or
    * emits within the data batch (inner stream-stream join,
    * flatMapGroupsWithState) — the extra batch is one more full
    * state-commit round per query for zero output. A production
    * deployment sizes partitions to cluster cores and re-enables no-data
    * batches for append-mode windowed sinks; the clone is memoized so
    * both sides of a stream-stream join share one session. */
  private val streamSessions =
    scala.collection.concurrent.TrieMap[(SparkSession, Int, Boolean), SparkSession]()

  /** State-store partitions sized to the DATASET, with the events file
    * size as the scale proxy: 4 at toy SF (the per-micro-batch
    * state-store fixed cost dominates there — the measured r8 win:
    * stream_stream_join 6.0 → 2.3 s at sf0.1), growing one partition
    * per 8 MB toward the core count as the data does (sf10's 211 MB →
    * 27). The count is a DETERMINISTIC function of the dataset, so a
    * reused checkpoint can never see a partition-count change (Spark
    * pins state partitions at first checkpoint); different datasets in
    * one JVM get separate clones via the (session, count) memo key,
    * and both sides of a stream-stream join still share one clone. */
  private def eventsBytes(d: String): Long = {
    val p = java.nio.file.Paths.get(s"$d/events.parquet")
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
  }

  private def statePartitionsFor(d: String): Int = {
    val chunk = 8L << 20
    math.max(4, math.min(32, ((eventsBytes(d) + chunk - 1) / chunk).toInt))
  }

  /** Dataset-sized state store BACKEND, the same move as the dataset-
    * sized partition count: the default HDFS-backed provider keeps every
    * partition's full state map (×2 retained versions) ON-HEAP, which is
    * the right low-overhead choice at driver scale but becomes the heap
    * itself at corpus scale — the r15 sf100 probe OOM'd inside the
    * session-window state merge with ~15 M Complete-mode session rows
    * (~9 GB with retained versions) in one 16 GB JVM. Past 512 MB of
    * events the shared clone flips to RocksDB, whose state lives
    * off-heap/on-disk — what a production job at that state size runs.
    * Deterministic per dataset, and each checkpoint additionally pins
    * its provider in OffsetSeqMetadata, so a reused checkpoint can never
    * silently re-provider. */
  private def largeStateFor(d: String): Boolean = eventsBytes(d) > (512L << 20)

  private def streamSession(s: SparkSession, d: String): SparkSession =
    streamSessionN(s, statePartitionsFor(d), largeStateFor(d))

  /** Loud PRE-START guard for a REUSED checkpoint against the
    * dataset-sized state partitioning (r14 verdict #7). The partition
    * count is a deterministic function of the dataset's events file
    * size — correct for immutable fixtures, but a dataset grown or
    * shrunk IN PLACE changes the computed count while the checkpoint's
    * state layout stays pinned at whatever the first run recorded, and
    * Spark then fails opaquely deep inside the state store (or, worse
    * on old versions, silently misroutes keys). Call this before
    * `.start()` on any query that reuses a checkpoint with a
    * dataset-sized session; a fresh checkpoint passes vacuously. */
  def assertCheckpointPartitions(ckpt: String, d: String): Unit = {
    assertCheckpointPartitionsN(ckpt, statePartitionsFor(d))
    assertCheckpointProviderN(ckpt, largeStateFor(d))
  }

  /** Latest offsets-log entry of a checkpoint: (batchId, file text).
    * None for a fresh checkpoint (nothing pinned yet). The offset log's
    * metadata line records the run's effective conf — including
    * spark.sql.shuffle.partitions and the state-store providerClass —
    * THE values stateful operators pinned their state layout/format to
    * at the first checkpoint. */
  private def latestOffsetEntry(ckpt: String): Option[(Long, String)] = {
    val dir = java.nio.file.Paths.get(ckpt, "offsets")
    if (!java.nio.file.Files.isDirectory(dir)) return None
    val st = java.nio.file.Files.list(dir)
    val latest =
      try st.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        if (n.nonEmpty && n.forall(_.isDigit)) Some((n.toLong, p)) else None
      }.toSeq.sortBy(_._1).lastOption
      finally st.close()
    latest.map { case (b, p) => (b, java.nio.file.Files.readString(p)) }
  }

  private[graft] def assertCheckpointPartitionsN(ckpt: String, computed: Int): Unit =
    latestOffsetEntry(ckpt).foreach { case (batch, text) =>
      val re = """"spark\.sql\.shuffle\.partitions"\s*:\s*"?(\d+)"?""".r
      re.findFirstMatchIn(text)
        .map(_.group(1).toInt).foreach { recorded =>
          if (recorded != computed) throw new IllegalStateException(
            s"checkpoint $ckpt (offsets batch $batch) pinned $recorded " +
              s"shuffle/state partitions but the dataset now sizes to $computed " +
              "— the events file grew or shrank in place under a reused " +
              "checkpoint. Streaming state partitioning is FIXED at the first " +
              "checkpoint; restarting with a different count fails opaquely in " +
              "the state store. Either keep the original dataset size, start a " +
              "fresh checkpoint (state rebuilds by replay), or migrate the " +
              "state offline via the statestore reader.")
        }
    }

  /** Sibling guard for the dataset-sized state store BACKEND (r15 ADVICE):
    * `largeStateFor` flips the provider to RocksDB past 512 MB of events,
    * but Spark pins the providerClass in OffsetSeqMetadata at the first
    * checkpoint and keeps it on restart — so a dataset grown in place
    * across the 512 MB boundary under a reused checkpoint keeps the
    * ON-HEAP provider while the partition count (clamped at 32) may no
    * longer change, leaving the partition guard silent and the OOM
    * protection silently absent at exactly the scale where it matters.
    * This guard makes that drift loud BEFORE start, with both classes
    * and the remediations in the message. */
  private[graft] def assertCheckpointProviderN(ckpt: String, rocks: Boolean): Unit =
    latestOffsetEntry(ckpt).foreach { case (batch, text) =>
      val computed =
        if (rocks) "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      val re = """"spark\.sql\.streaming\.stateStore\.providerClass"\s*:\s*"([^"]+)"""".r
      re.findFirstMatchIn(text).map(_.group(1)).foreach { recorded =>
        // state the mismatch FACTS first and the threshold crossing as the
        // most likely cause, not the asserted one (r16 ADVICE: the same
        // exception fires if the threshold constant was retuned or the
        // checkpoint was created under a manually-set providerClass — a
        // message that asserts one cause would misdirect the remediation)
        if (recorded != computed) throw new IllegalStateException(
          s"checkpoint $ckpt (offsets batch $batch) pinned state-store provider " +
            s"$recorded but this run computes $computed. Spark keeps the " +
            "checkpoint's pinned provider on restart, so the dataset-sized " +
            "on-heap/RocksDB choice would silently NOT apply (an on-heap " +
            "store at corpus scale is the r15 sf100 OOM). Most likely cause: " +
            "the events file grew or shrank across the 512 MB RocksDB " +
            "threshold under a reused checkpoint; also possible: the " +
            "threshold constant changed between runs, or the checkpoint was " +
            "created under a manually-set providerClass. Either keep the " +
            "provider the checkpoint pinned (and the dataset size that " +
            "implies), start a fresh checkpoint (state rebuilds by replay, " +
            "with the computed provider), or migrate the state offline via " +
            "the statestore reader.")
      }
    }

  /** Dataset-independent variant (the JVM prewarm): the toy floor. */
  private def streamSession(s: SparkSession): SparkSession =
    streamSessionN(s, 4, rocks = false)

  private def streamSessionN(s: SparkSession, n: Int, rocks: Boolean): SparkSession =
    streamSessions.getOrElseUpdate((s, n, rocks), {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", n)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      // retain only the restart-essential state versions: the default
      // (100) keeps EVERY committed version's files, which single-trigger
      // replays never notice (1 version) but a multi-trigger run over
      // corpus-sized Complete-mode state multiplies — the r16 sf100
      // session-window probe held 20 full RocksDB snapshots of ~15M
      // sessions and ENOSPC'd the host. Two versions is what restart
      // semantics actually need (latest + in-flight).
      ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      if (rocks) {
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // upload per-version CHANGELOGS instead of full snapshots — the
        // production setting for frequent triggers: commit cost scales
        // with the batch's state delta, not the store size (snapshots
        // still happen in maintenance). Same r16 probe: per-trigger
        // full-snapshot sync was most of the 60 s commit time.
        ss.conf.set(
          "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          "true")
      }
      ss
    })

  /** Stage one source file into a watched directory via temp-file +
    * atomic move. The streaming file source wants a DIRECTORY; the
    * testdata is a single file — in production the upstream writer would
    * already be dropping files into the watched dir. Freshness is same
    * size AND staged mtime >= source mtime: a size-only check (the r8
    * ADVICE finding) would silently serve stale staged data whenever the
    * source is regenerated at an identical byte size, and a bare
    * exists() check would read a stale or half-copied file forever. */
  private def stageInto(srcPath: String, stageDir: java.nio.file.Path,
      name: String): Unit = {
    val src = java.nio.file.Paths.get(srcPath)
    val staged = stageDir.resolve(name)
    val fresh = java.nio.file.Files.exists(staged) &&
      java.nio.file.Files.size(staged) == java.nio.file.Files.size(src) &&
      java.nio.file.Files.getLastModifiedTime(staged).compareTo(
        java.nio.file.Files.getLastModifiedTime(src)) >= 0
    if (!fresh) {
      java.nio.file.Files.createDirectories(stageDir)
      val tmp = stageDir.resolve(name + ".tmp")
      java.nio.file.Files.copy(src, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.move(tmp, staged,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  private def eventsStream(batchSession: SparkSession, d: String,
      splitAware: Boolean = true): DataFrame = {
    val s = streamSession(batchSession, d)
    val split =
      if (splitAware) sys.env.get("SPARK_GRAFT_STREAM_SPLIT").map(_.toInt).getOrElse(1)
      else 1
    if (split > 1) {
      // MULTI-TRIGGER arrival (builder probe, r15 verdict #4): the
      // single-file staging below delivers the whole corpus in ONE
      // micro-batch, so every watermark-bounded operator holds the whole
      // corpus's state inside that one trigger — the attributed cause of
      // the >10× sf100 stream steps. With SPARK_GRAFT_STREAM_SPLIT=N the
      // events are staged once as N event-time-range chunk files with
      // strictly increasing mtimes and the source takes ONE file per
      // trigger — a time-ordered arrival, the production shape — so the
      // watermark advances between triggers and expiry actually bounds
      // state. Results are UNCHANGED: chunks are contiguous ts ranges
      // (batch i+1's min ts >= batch i's max), so nothing arrives behind
      // the watermark, and the gates' Complete-mode aggregates never drop
      // rows. Probe-only: gates run split=1 unless the env var is set.
      val stageDir = java.nio.file.Paths.get(
        s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}_split$split")
      stageSplitInto(s, d, stageDir, split)
      // schema of the REWRITTEN chunks (normalized micros, not the raw
      // vintage); normalizeTs is then an identity, shared all the same
      val schema = s.read.parquet(stageDir.toString).schema
      Tables.normalizeTs(s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(stageDir.toString))
    } else {
      val stageDir = java.nio.file.Paths.get(
        s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}")
      stageInto(s"$d/events.parquet", stageDir, "events.parquet")
      // schema of the RAW file (whatever vintage the driver wrote; see
      // Tables.eventsRaw), then the SAME ts normalization the batch reader
      // applies — shared code so the two paths cannot drift
      val schema = Tables.eventsRaw(s, d).schema
      Tables.normalizeTs(s.readStream.schema(schema).parquet(stageDir.toString))
    }
  }

  /** Stage the events table as `n` event-time-range chunk files for the
    * multi-trigger probe: repartitionByRange on ts (chunk i = i-th ts
    * range), then the part files move into the stage dir in partition
    * order with strictly increasing mtimes, so the file source's
    * (mtime, path) ordering delivers them oldest-range-first. Stamped on
    * (source size, source mtime, n) — rebuilt only when the source or the
    * chunk count changes. */
  private def stageSplitInto(s: SparkSession, d: String,
      stageDir: java.nio.file.Path, n: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(s"$d/events.parquet")
    val marker = stageDir.resolve("_SPLIT_STAMP")
    val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:$n"
    if (Files.exists(marker) && Files.readString(marker) == stamp) return
    val tmp = Files.createTempDirectory("graft_split_build")
    Tables.events(s, d)
      .repartitionByRange(n, col("ts"))
      .write.mode("overwrite").parquet(tmp.toString)
    val (count, _) = installChunks(tmp, stageDir)
    Files.writeString(marker, stamp)
    System.err.println(s"[stream-split] staged $count ts-range chunks -> $stageDir")
  }

  /** Wipe `stageDir` and move `tmp`'s part files in as chunkNNN.parquet
    * with strictly increasing mtimes (partition order == ts-range order,
    * so the file source's (mtime, path) ordering delivers them
    * oldest-range-first). Returns (chunk count, base mtime millis) so a
    * caller can append further files AFTER the chunks in mtime order. */
  private def installChunks(tmp: java.nio.file.Path,
      stageDir: java.nio.file.Path): (Int, Long) = {
    import java.nio.file.{Files, StandardCopyOption}
    if (Files.isDirectory(stageDir)) {
      val old = Files.list(stageDir)
      try old.iterator().asScala.foreach(Files.delete) finally old.close()
    }
    Files.createDirectories(stageDir)
    val partsStream = Files.list(tmp)
    val parts =
      try partsStream.iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-")).toSeq
        .sortBy(_.getFileName.toString)
      finally partsStream.close()
    val base = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (p, i) =>
      val dst = stageDir.resolve(f"chunk$i%03d.parquet")
      Files.move(p, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
    }
    (parts.size, base)
  }

  /** Stage events as ts-range chunks PLUS two terminal watermark
    * SENTINEL files — the Append-mode flush shape (r16 verdict #5). A
    * production Append-mode session sink always holds back the sessions
    * the final watermark never passes; the standard fix is terminal
    * punctuation: after end of input, inject heartbeat events far past
    * max(ts) so the watermark advances over every real session's end and
    * the tail emits. Two sentinels because the watermark computed from
    * trigger N takes effect in trigger N+1: sentinel 1's trigger runs
    * with the last REAL watermark, sentinel 2's trigger runs with
    * watermark ≈ sentinel1 − delay > every real session end and flushes
    * the tail. The sentinels use user_id −1 and ts > max + a year; their
    * own session is never closed by a later watermark, so they CANNOT
    * appear in the output (the gate filters user_id ≥ 0 anyway, as the
    * explicit contract). Chunk count follows SPARK_GRAFT_STREAM_SPLIT,
    * so the gate is arrival-shape-checkable like every other stream. */
  private def stageTerminalInto(s: SparkSession, d: String,
      stageDir: java.nio.file.Path, n: Int): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(s"$d/events.parquet")
    val marker = stageDir.resolve("_TERM_STAMP")
    val stamp = s"${Files.size(src)}:${Files.getLastModifiedTime(src).toMillis}:$n:term-v1"
    if (Files.exists(marker) && Files.readString(marker) == stamp) return
    val ev = Tables.events(s, d)
    // 1-row scalar aggregate (kilobyte-scale driver value)
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val tmp = Files.createTempDirectory("graft_term_build")
    ev.repartitionByRange(n, col("ts")).write.mode("overwrite").parquet(tmp.toString)
    val (count, base) = installChunks(tmp, stageDir)
    Seq(370L, 740L).zipWithIndex.foreach { case (days, j) =>
      val st = new Timestamp(maxTs.getTime + days * 86400000L)
      val one = s.range(1).select(
        lit(-(j + 1).toLong).as("event_id"), lit(st).as("ts"),
        lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
      val t2 = Files.createTempDirectory("graft_term_sentinel")
      one.coalesce(1).write.mode("overwrite").parquet(t2.toString)
      val ps = Files.list(t2)
      val part =
        try ps.iterator().asScala
          .find(_.getFileName.toString.startsWith("part-")).get
        finally ps.close()
      val dst = stageDir.resolve(s"sentinel$j.parquet")
      Files.move(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(base + (count + 1 + j) * 1000L))
    }
    Files.writeString(marker, stamp)
    System.err.println(
      s"[stream-term] staged $count ts-range chunks + 2 sentinels -> $stageDir")
  }

  // memory-sink names must be unique PER INVOCATION: the streaming clone
  // is shared across datasets of a base session, so a fixed per-query name
  // collides under two concurrent invocations (start() throws "query name
  // already active", or one caller reads the other's sink table)
  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private def runToTable(s: SparkSession, df: DataFrame, mode: OutputMode, name: String): DataFrame = {
    // NOT the memory sink: format("memory") holds the ENTIRE streaming
    // result in driver memory — corpus-scale state in one JVM, the exact
    // scale-killer class. The r14 sf10 probe at a 16 GB heap measured it:
    // stream_session_window's Complete-mode result alone blew
    // spark.driver.maxResultSize (>1 GiB of task results) and the heap
    // pressure OOM'd the context. A foreachBatch PARQUET spill reproduces
    // MemorySink's semantics exactly — Complete truncates-and-rewrites
    // per batch, Append/Update append the batch's emitted rows — while
    // the result lives on disk and the returned frame is a plain
    // distributed scan, as it would be against a real table sink.
    val dir = graft.util.TempDirs.scratch(s"graft_stream_sink_$name").toString
    // foreachBatch is AT-LEAST-ONCE (unlike MemorySink, which dedupes via
    // latestBatchId): a re-executed micro-batch must REPLACE its previous
    // attempt's rows, never re-append them (r14 ADVICE). Complete mode is
    // idempotent already (each batch truncates-and-rewrites the dir);
    // Append/Update get a batchId-named subdir written with overwrite, so
    // a replayed batch overwrites exactly its own output and the union of
    // subdirs holds one copy of every emitted row.
    val fn: (DataFrame, Long) => Unit =
      if (mode == OutputMode.Complete())
        (batch, _) => batch.write.mode("overwrite").parquet(dir)
      else
        (batch, id) => batch.write.mode("overwrite").parquet(s"$dir/b$id")
    val q = df.writeStream.outputMode(mode).foreachBatch(fn).start()
    try q.processAllAvailable() finally q.stop()
    // opt-in perf attribution (builder tooling): per-micro-batch engine
    // timing + state-store metrics, the data behind the NOTES.md
    // streaming floors — durationMs names the phase (addBatch vs
    // planning vs WAL), stateOperators names the store costs
    if (sys.env.contains("SPARK_GRAFT_STREAM_PROFILE"))
      q.recentProgress.foreach { p =>
        System.err.println(s"[stream-profile] $name batch=${p.batchId} " +
          s"rows=${p.numInputRows} durationMs=${p.durationMs} " +
          p.stateOperators.map(o => s"state(total=${o.numRowsTotal} " +
            s"updated=${o.numRowsUpdated} removed=${o.numRowsRemoved} " +
            s"commitMs=${o.commitTimeMs} custom=${o.customMetrics})").mkString(" "))
      }
    // explicit schema: a query whose watermark held every row back leaves
    // no part file, and the scan must still return an EMPTY frame of the
    // right shape (as the memory sink did), not fail schema inference.
    // recursiveFileLookup reads the per-batch subdirs without treating
    // them as partition columns.
    df.sparkSession.read.schema(df.schema)
      .option("recursiveFileLookup", "true").parquet(dir)
  }

  /** Tumbling 1h window counts per event type, with a 10-minute watermark.
    * Complete output mode so the single file-source batch emits every
    * window (append would hold the tail windows back until a later batch
    * advances the watermark past them). */
  def tumblingCounts(s: SparkSession, d: String): DataFrame = {
    val agg = eventsStream(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_tumbling")
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")
  }

  val tumblingOracle: String = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type"""

  /** Streaming data-quality drift monitor: per tumbling 1-day window, the
    * event-type mix as exact ppm shares plus an alert flag when the error
    * share drifts more than 2.5 points from its expected 1/5 baseline —
    * the always-on health dashboard a pipeline keeps over its ingest
    * stream. The mix is ONE streaming aggregation (conditional partial
    * sums per type — no per-type shuffle, no second aggregation for the
    * window total), and the shares/alert are a stateless projection
    * AFTER the agg, still inside the streaming query; state is one row
    * per open window, watermark-bounded. The 200000-ppm baseline is a
    * literal (the Benford-table pattern) — in production it would come
    * from a broadcast stream-static join like [[enrichJoin]]'s dim. */
  def driftMonitor(s: SparkSession, d: String): DataFrame = {
    def n(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L))
    val agg = eventsStream(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n_events"),
        n("view").as("n_view"), n("click").as("n_click"),
        n("purchase").as("n_purchase"), n("signup").as("n_signup"),
        n("error").as("n_error"))
      .select(col("window.start").as("window_start"), col("n_events"),
        expr("n_view * 1000000L DIV n_events").as("view_ppm"),
        expr("n_click * 1000000L DIV n_events").as("click_ppm"),
        expr("n_purchase * 1000000L DIV n_events").as("purchase_ppm"),
        expr("n_signup * 1000000L DIV n_events").as("signup_ppm"),
        expr("n_error * 1000000L DIV n_events").as("error_ppm"),
        expr("abs(n_error * 1000000L DIV n_events - 200000L) > 25000L").as("alert"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_drift")
      .orderBy("window_start")
  }

  val driftMonitorOracle: String = """
WITH d AS (
  SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
         count(*) AS n_events,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
         sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error
  FROM events GROUP BY 1)
SELECT window_start, n_events,
       CAST(n_view * 1000000 // n_events AS BIGINT) AS view_ppm,
       CAST(n_click * 1000000 // n_events AS BIGINT) AS click_ppm,
       CAST(n_purchase * 1000000 // n_events AS BIGINT) AS purchase_ppm,
       CAST(n_signup * 1000000 // n_events AS BIGINT) AS signup_ppm,
       CAST(n_error * 1000000 // n_events AS BIGINT) AS error_ppm,
       abs(n_error * 1000000 // n_events - 200000) > 25000 AS alert
FROM d ORDER BY window_start"""

  /** Spark 4's `transformWithState` — the current-generation arbitrary-
    * state API (typed ValueState/ListState/MapState handles, TTL,
    * timers; the successor to [[sessionize]]'s flatMapGroupsWithState) —
    * driving a per-user lifetime-totals tracker: each batch folds the
    * user's events into a ValueState and emits the updated running
    * totals (cents kept exact via per-event floor, matching the SQL).
    * Requires the RocksDB state store, so this query runs on its own
    * session clone ([[rocksSession]]) rather than the shared HDFS-backed
    * one. Single-batch replay makes the emitted totals equal the batch
    * aggregate the oracle states; TransformWithStateSpec replays TWO
    * staged batches to prove the ValueState actually carries totals
    * across micro-batches. */
  case class UserTotals(n: Long, cents: Long, maxCents: Long)
  case class TotalsOut(user_id: Long, n_events: Long, total_cents: Long,
    max_cents: Long)

  class TotalsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, TotalsOut] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserTotals] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTotals]("totals",
        org.apache.spark.sql.Encoders.product[UserTotals],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[TotalsOut] = {
      val prev = if (totals.exists()) totals.get() else UserTotals(0L, 0L, 0L)
      val next = rows.foldLeft(prev) { (t, e) =>
        val c = math.floor(e.value * 100).toLong
        UserTotals(t.n + 1, t.cents + c, math.max(t.maxCents, c))
      }
      totals.update(next)
      Iterator.single(TotalsOut(user, next.n, next.cents, next.maxCents))
    }
  }

  /** Second memoized clone with the RocksDB state store provider —
    * `transformWithState` requires it, and flipping the provider on the
    * SHARED clone would silently re-provider every other stream query's
    * checkpoints. Partitions are DATASET-SIZED like [[streamSessionN]]
    * (r15: the r14 "~6 s/micro-batch fixed cost" on
    * `stream_timer_sessions` was not fixed at all — the profile showed
    * the two 5M-row data batches paying 12-15 s each to shuffle, sort
    * and state-walk 150k users inside FOUR tasks, plus 144k timer
    * expiries in the same four; sizing to the dataset is exactly the
    * stream_stream_join fix from r14). Toy SFs still compute 4, so
    * every driver-scale gate is byte-identical. */
  private val rocksSessions =
    scala.collection.concurrent.TrieMap[(SparkSession, Int), SparkSession]()

  private def rocksSession(s: SparkSession, d: String): SparkSession =
    rocksSessionN(s, statePartitionsFor(d))

  /** Dataset-independent variant (the JVM prewarm): the toy floor. */
  private def rocksSession(s: SparkSession): SparkSession =
    rocksSessionN(s, 4)

  private def rocksSessionN(s: SparkSession, n: Int): SparkSession =
    rocksSessions.getOrElseUpdate((s, n), {
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", n)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // The two RocksDB production settings [[streamSessionN]]'s rocks
      // branch already applies, missing here since this clone was added
      // (optimization r17 — the stream profile showed every
      // transformWithState micro-batch uploading a FULL snapshot zip,
      // rocksdbSaveZipFilesLatencyMs ≈ 180 ms/batch, where the r16 sf100
      // probe established changelog checkpointing as the default for
      // frequent triggers: commit cost scales with the batch's state
      // delta, not the store size; snapshots move to maintenance).
      // minBatchesToRetain=2 is the same r16 rule — latest + in-flight is
      // what restart semantics need; the default 100 multiplies retained
      // state versions under multi-trigger corpus-scale state.
      ss.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
      ss.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      ss
    })

  /** One-time JVM warm-up for the stateful streaming machinery — called
    * from the bench's ETL-phase warmup so the COLD pass measures what a
    * cold SESSION pays, not one-per-JVM costs no production query repays:
    * the RocksDB state store's JNI library extraction + provider class
    * init (the dominant share of the first transformWithState call's
    * 9 s-vs-2.7 s cold multiple, r12 "wrong #2") and the watermarked
    * stream-stream join's state-store format/codegen init. Both run over
    * 2-row MemoryStreams — milliseconds of data, the class-loading is the
    * point. Idempotent and best-effort: a prewarm failure must never fail
    * the bench (the real queries would just pay the cold cost). */
  def prewarm(s: SparkSession, d: String = ""): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    try {
      locally { // RocksDB provider + transformWithState
        val rs = rocksSession(s)
        import rs.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = rs.sqlContext
        val mem = MemoryStream[Ev]
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
        mem.addData(Ev(1L, t0, 1L, "w", 1.0, "{}"), Ev(2L, t0, 2L, "w", 2.0, "{}"))
        val out = mem.toDS().groupByKey(_.user_id)
          .transformWithState(new TotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
        val q = out.toDF().writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName("graft_prewarm_tws").start()
        try q.processAllAvailable() finally q.stop()
        rs.catalog.dropTempView("graft_prewarm_tws")
      }
      locally { // watermarked stream-stream outer join on the shared clone
        // share the DATASET's clone when the caller names one — a second
        // (session, partitions) clone would duplicate every session-
        // scoped persisted artifact at exactly the scale that hurts
        val ss: SparkSession =
          if (d.nonEmpty) streamSession(s, d) else streamSession(s)
        import ss.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
        val a = MemoryStream[(Long, Timestamp)]
        val b = MemoryStream[(Long, Timestamp)]
        val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
        a.addData((1L, t0)); b.addData((1L, t0))
        val joined = a.toDF().toDF("au", "ats").withWatermark("ats", "0 seconds")
          .join(b.toDF().toDF("bu", "bts").withWatermark("bts", "0 seconds"),
            expr("au = bu AND bts >= ats AND bts <= ats + INTERVAL 1 HOUR"),
            "fullOuter")
        val q = joined.writeStream.outputMode(OutputMode.Append)
          .format("memory").queryName("graft_prewarm_ssj").start()
        try q.processAllAvailable() finally q.stop()
        ss.catalog.dropTempView("graft_prewarm_ssj")
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[graft] streaming prewarm failed (non-fatal): ${e.getMessage}")
    }
  }

  def transformState(s: SparkSession, d: String): DataFrame = {
    val rs = rocksSession(s, d)
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}")
    stageInto(s"$d/events.parquet", stageDir, "events.parquet")
    val schema = Tables.eventsRaw(rs, d).schema
    val ev = Tables.normalizeTs(
      rs.readStream.schema(schema).parquet(stageDir.toString))
    import rs.implicits._
    val out = ev.as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new TotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
    runToTable(s, out.toDF(), OutputMode.Append, "graft_stream_twstate")
      .orderBy("user_id")
  }

  val transformStateOracle: String = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_cents
FROM events GROUP BY 1 ORDER BY 1"""

  /** Offline STATE-STORE inspection — Spark 4's `statestore` batch data
    * source reading a streaming checkpoint's state directly: run the
    * per-user totals aggregation as a real stream against a pinned
    * checkpoint, then batch-query the state store and unwrap the
    * (key, value) pairs. The ops surface every production streaming
    * deployment needs (state debugging, migration audits, cardinality
    * checks) — and it hash-gates, because after the full replay the
    * aggregation state IS the batch aggregate the oracle states. The
    * checkpoint is rebuilt per run (fresh dir) so the state version is
    * deterministic. */
  def stateInspect(s: SparkSession, d: String): DataFrame = {
    val ss = streamSession(s, d)
    val ckpt = s"/tmp/graft_stream_ckpt/${graft.util.PathKeys.safe(d)}_state_inspect"
    val root = java.nio.file.Paths.get(ckpt)
    if (java.nio.file.Files.exists(root)) {
      val it = java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      try it.forEach(p => java.nio.file.Files.deleteIfExists(p)) finally it.close()
    }
    val agg = eventsStream(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("total_cents"))
    val sink = s"graft_state_inspect_sink_${sinkSeq.incrementAndGet()}"
    val q = agg.writeStream.outputMode(OutputMode.Complete)
      .option("checkpointLocation", ckpt)
      .format("memory")
      .queryName(sink)
      .start()
    try q.processAllAvailable() finally q.stop()
    // the memory sink exists only to drive the stream — the result is
    // read from the state store below. Drop its temp view eagerly (like
    // runToTable) or the streaming clone's catalog accumulates one
    // graft_state_inspect_sink_N entry per invocation (r10 ADVICE).
    ss.catalog.dropTempView(sink)
    // the state VALUE is the aggregation BUFFER (fields named after the
    // buffer slots: `count`, `sum`), not the output row — exactly what a
    // state audit inspects
    ss.read.format("statestore").option("path", ckpt).load()
      .select(col("key.user_id").as("user_id"),
        col("value.count").as("n_events"),
        col("value.sum").as("total_cents"))
      .orderBy("user_id")
  }

  val stateInspectOracle: String = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events GROUP BY 1 ORDER BY 1"""

  /** Streaming APPROXIMATE distinct users per day — COUNT(DISTINCT) is
    * unsupported in streaming aggregation (it would buffer every value),
    * so HLL++ `approx_count_distinct` IS the streaming answer, its
    * sketch being exactly the bounded mergeable state a stream can
    * carry. Verified with the `approx_distinct` in-band contract: the
    * batch side recomputes the exact per-window count (on the SAME
    * session clone — cross-session joins don't exist) and the output
    * hashes exact + a within-10% boolean, so the approximation quality
    * itself gates. */
  def approxDistinctStream(s: SparkSession, d: String): DataFrame = {
    val agg = eventsStream(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day"))
      .agg(approx_count_distinct("user_id", 0.02).as("approx"))
    val res = runToTable(s, agg, OutputMode.Complete, "graft_stream_approxd")
      .select(col("window.start").as("window_start"), col("approx"))
    val exact = Tables.events(res.sparkSession, d)
      .groupBy(window(col("ts"), "1 day"))
      .agg(countDistinct("user_id").as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("exact_users"), col("n_events"))
    res.join(exact, "window_start")
      .select(col("window_start"), col("exact_users"), col("n_events"),
        (abs(col("approx") - col("exact_users")) <=
          greatest(lit(1L), expr("exact_users div 10"))).as("within_10pct"))
      .orderBy("window_start")
  }

  val approxDistinctStreamOracle: String = """
SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
       count(DISTINCT user_id) AS exact_users, count(*) AS n_events,
       true AS within_10pct
FROM events GROUP BY 1 ORDER BY 1"""

  /** Sliding 2h windows every 1h — each event lands in two windows. */
  def slidingCounts(s: SparkSession, d: String): DataFrame = {
    val agg = eventsStream(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_sliding")
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))
      .orderBy("window_start", "event_type")
  }

  val slidingOracle: String = """
WITH cand AS (
  SELECT event_type, ts,
         unnest([time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour',
                 time_bucket(INTERVAL '1 hour', ts)]) AS window_start
  FROM events)
SELECT window_start, event_type, count(*) AS n_events
FROM cand
WHERE ts >= window_start AND ts < window_start + INTERVAL '2 hours'
GROUP BY 1, 2
ORDER BY window_start, event_type"""

  /** Streaming exact dedup: the stream unioned with itself (every event
    * duplicated) then dropDuplicates on the event id — counts per type must
    * equal the batch DISTINCT counts, which is what the oracle checks. In a
    * long-running deployment the id-dedup state is bounded by pairing
    * dropDuplicatesWithinWatermark with the event-time watermark; the
    * single-batch replay here exercises the same operator. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    val doubled = ev.unionByName(ev)
    val agg = doubled
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_unique"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_dedup")
      .orderBy("event_type")
  }

  val streamDedupOracle: String = """
SELECT event_type, count(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type ORDER BY event_type"""

  /** Native session_window sessionization — the built-in operator whose
    * semantics [[sessionize]] reimplements with explicit state. Sharing the
    * SAME oracle proves built-in ≡ custom: session_window merges events
    * closer than the gap and reports end = last_ts + gap, so session_end =
    * window.end - gap. (The merge boundary is strict-< versus the oracle's
    * ≤ split; the closest gap in this data is 0.66s away from exactly
    * 30min, so the boundary never binds — checked before shipping.)
    * Prefer this operator at scale: its state is managed by the engine and
    * merge-sorted per key, no user-code state handling. */
  def sessionWindow(s: SparkSession, d: String): DataFrame = {
    val agg = eventsStream(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_session_window")
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr("INTERVAL 30 MINUTES")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** Append-mode twin of [[sessionWindow]], now a full ORACLE GATE (r16
    * verdict #5; probe-only in r15-r16 because Append held back the
    * sessions the final watermark never passed). The missing tail is
    * closed with TERMINAL PUNCTUATION ([[stageTerminalInto]]): two
    * far-future sentinel triggers advance the watermark past every real
    * session end, so the production eviction path — watermark expiry
    * EVICTS and EMITS closed sessions between triggers, state bounded
    * at ~one arrival window of open sessions, the r16 sf100
    * demonstration — now emits the COMPLETE session set and
    * hash-matches the batch gap-and-islands oracle. Honors
    * `SPARK_GRAFT_STREAM_SPLIT` for multi-trigger real arrival ahead of
    * the sentinels (run with SPARK_GRAFT_STREAM_PROFILE=1 to see
    * per-trigger state total/removed). */
  def sessionWindowAppend(s: SparkSession, d: String): DataFrame = {
    val ss = streamSession(s, d)
    val split = sys.env.get("SPARK_GRAFT_STREAM_SPLIT").map(_.toInt).getOrElse(1)
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}_term$split")
    stageTerminalInto(ss, d, stageDir, split)
    val schema = ss.read.parquet(stageDir.toString).schema
    val src = Tables.normalizeTs(ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir.toString))
    val agg = src
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    runToTable(ss, agg, OutputMode.Append, "graft_stream_session_append")
      // sentinels never emit (their window outlives the final watermark);
      // the filter states the contract rather than relying on it
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr("INTERVAL 30 MINUTES")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")
  }

  // ---- stateful sessionization ----

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
    value: Double, props: String)
  /** The sessionizer's SHUFFLE row: only the fields the state machine
    * reads. The full [[Ev]] carries `props` (a JSON string, the widest
    * column) and `event_type` through the groupByKey exchange for
    * nothing — at sf10 that was a measurable share of the two 5M-row
    * data batches (r15 timer-sessions profile). */
  case class EvT(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, total_value: Double)
  case class UserState(start: Timestamp, end: Timestamp, n: Long, total: Double)

  val GapMs: Long = 30 * 60 * 1000L

  /** Custom streaming state via flatMapGroupsWithState: per-user
    * sessionization with a 30-minute inactivity gap. In a single-batch
    * replay every session closes within the call, so the output equals the
    * batch gap-and-islands SQL the oracle runs. The state handle carries
    * the open session across batches in a genuine multi-batch deployment. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // splitAware = false: this gate's contract IS the single-batch replay
    // (the end-of-input flush below closes trailing sessions exactly as
    // the batch oracle closes them at corpus end). Under multi-trigger
    // arrival an Append-mode flush-at-batch-end would SPLIT every session
    // spanning a chunk boundary (the r16 SPLIT=20 differential measured
    // it: 9554 vs 9549 sessions) — and the arrival-invariant form needs
    // event-time timers plus watermark-advancing traffic, which is
    // exactly what the production twin `stream_timer_sessions` gates.
    // So the replay gate pins whole-corpus arrival; the probe knob
    // drives the twin instead.
    val ds: Dataset[Ev] = eventsStream(s, d, splitAware = false).as[Ev]

    def fn(user: Long, events: Iterator[Ev], state: GroupState[UserState]): Iterator[Session] = {
      // Timestamps carry microseconds — compare/sort at full precision
      // (ms-truncated getTime arithmetic would drop them from the output).
      val sorted = events.toSeq.sortBy(e => (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
      val sessions = scala.collection.mutable.ArrayBuffer[Session]()
      var cur: Option[UserState] = state.getOption
      sorted.foreach { e =>
        cur match {
          // gap compare at full precision: toMillis would truncate a
          // 30min+500µs gap down to exactly the threshold
          case Some(st) if java.time.Duration.between(st.end.toInstant, e.ts.toInstant)
            .compareTo(java.time.Duration.ofMillis(GapMs)) <= 0 =>
            cur = Some(UserState(st.start, e.ts, st.n + 1, st.total + e.value))
          case Some(st) =>
            sessions += Session(user, st.start, st.end, st.n, st.total)
            cur = Some(UserState(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(UserState(e.ts, e.ts, 1, e.value))
        }
      }
      // single-batch replay: flush the trailing open session too (a live
      // deployment would keep it in state and close it on timeout instead)
      cur.foreach { st =>
        sessions += Session(user, st.start, st.end, st.n, st.total)
      }
      state.remove()
      sessions.iterator
    }

    val out = ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
    val tbl = runToTable(s, out.toDF(), OutputMode.Append, "graft_stream_sessions")
    tbl.select(col("user_id"), col("session_start"), col("session_end"),
      col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "session_start")
  }

  val sessionizeOracle: String = """
WITH e AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM e)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start"""

  /** The TIMER-based sessionizer — Spark 4's event-time timers in
    * `transformWithState` (the arbitrary-state API surface
    * [[TotalsProcessor]] doesn't touch): input rows fold into the open
    * session exactly like [[sessionize]]'s state machine, gap-closed
    * sessions emit inline, and the TRAILING open session is closed by an
    * inactivity TIMER — `registerTimer(end + gap)` re-armed per batch
    * (stale timers deleted), `handleExpiredTimer` emitting the session
    * when the WATERMARK passes the expiry. This is the production shape
    * of session timeout: nobody gets to flush trailing state "because
    * the batch ended" — expiry is an event-time fact the watermark
    * certifies. The +1 ms on the expiry keeps the ms-truncated timer
    * from firing ahead of a µs-precision continuing event at exactly the
    * gap boundary. */
  class TimerSessionProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvT, Session] {
    @transient private var sess: org.apache.spark.sql.streaming.ValueState[UserState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sess = getHandle.getValueState[UserState]("sess",
        org.apache.spark.sql.Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[EvT],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[Session] = {
      // same µs-precision ordering + gap fold as [[sessionize]]
      val sorted = rows.toSeq.sortBy(e =>
        (e.ts.toInstant.getEpochSecond, e.ts.toInstant.getNano, e.event_id))
      val closed = scala.collection.mutable.ArrayBuffer[Session]()
      var cur: Option[UserState] = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(st) if java.time.Duration.between(st.end.toInstant, e.ts.toInstant)
            .compareTo(java.time.Duration.ofMillis(GapMs)) <= 0 =>
            cur = Some(UserState(st.start, e.ts, st.n + 1, st.total + e.value))
          case Some(st) =>
            closed += Session(user, st.start, st.end, st.n, st.total)
            cur = Some(UserState(e.ts, e.ts, 1, e.value))
          case None =>
            cur = Some(UserState(e.ts, e.ts, 1, e.value))
        }
      }
      cur.foreach(sess.update)
      // re-arm the inactivity timer for the (single) open session
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      cur.foreach(st => getHandle.registerTimer(st.end.getTime + GapMs + 1))
      closed.iterator
    }
    override def handleExpiredTimer(user: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      // the watermark certified end + gap elapsed with no new event: the
      // open session is CLOSED, exactly once (state cleared with it)
      if (!sess.exists()) Iterator.empty
      else {
        val st = sess.get(); sess.clear()
        Iterator.single(Session(user, st.start, st.end, st.n, st.total))
      }
    }
  }

  /** Sessionization where trailing sessions close by EVENT-TIME TIMER
    * instead of an end-of-input flush — shares [[sessionizeOracle]], so
    * timer-closed ≡ batch-computed is the gated claim. The staged source
    * delivers the corpus in two TIME-SPLIT halves (sessions genuinely
    * span micro-batches; a 0-second watermark plus the time split keeps
    * a µs-boundary continuing event from ever racing its own timer) and
    * then two far-future sentinel batches: the first advances the
    * watermark past every expiry, the second gives the engine a batch in
    * which those (watermark-from-previous-batch) timers actually fire —
    * the no-data-batch path is disabled suite-wide, so flushing must
    * ride real triggers, exactly like a production topic that keeps
    * receiving unrelated traffic. */
  def timerSessions(s0: SparkSession, d: String): DataFrame = {
    val s = rocksSession(s0, d) // transformWithState needs the RocksDB provider
    import s.implicits._
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src_timer/${graft.util.PathKeys.safe(d)}")
    stageTimerFiles(s, d, stageDir)
    val schema = Tables.eventsRaw(s, d).schema
    // The sentinels must flow INTO the stateful operator, not be filtered
    // before it: a sentinel filter on a non-watermark column gets pushed
    // BELOW the EventTimeWatermark node (PushPredicateThroughNonJoin), so
    // a pre-operator filter would silently keep the watermark from ever
    // advancing and the trailing timers from ever firing (measured: the
    // last-gap sessions went missing; TimerSemanticsSpec pins the
    // behavior). Sentinels therefore ride through under a reserved key
    // (-1) and their own sessions are dropped from the OUTPUT.
    val ev = Tables.normalizeTs(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stageDir.toString))
      .withWatermark("ts", "0 seconds")
      .withColumn("user_id",
        when(col("event_type") === "sentinel", lit(-1L)).otherwise(col("user_id")))
      // shuffle only what the state machine reads (EvT): props and
      // event_type would otherwise ride the exchange for nothing; the
      // projection keeps ts, so the watermark tag survives it
      .select("user_id", "ts", "event_id", "value")
    val out = ev.as[EvT].groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Append())
    runToTable(s, out.toDF(), OutputMode.Append, "graft_stream_timer_sessions")
      .filter(col("user_id") >= 0) // the sentinel key's sessions are not data
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "session_start")
  }

  /** Stage the timer-session source: events split at the median ts into
    * two files (mtime-ordered), then two sentinel rows far past the last
    * event — see [[timerSessions]] for why two. Re-staged only when the
    * source changes (same freshness rule as [[stageInto]]). */
  private def stageTimerFiles(s: SparkSession, d: String,
      stageDir: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    val src = java.nio.file.Paths.get(s"$d/events.parquet")
    val stamp = stageDir.resolve("_STAMP")
    val want = Files.size(src) + ":" + Files.getLastModifiedTime(src).toMillis
    if (Files.exists(stamp) && Files.readString(stamp).trim == want) return
    graft.util.AtomicTable.deleteRecursively(stageDir)
    Files.createDirectories(stageDir)
    val ev = Tables.eventsRaw(s, d)
    // the raw column is TIMESTAMP(NANOS)/NTZ — carry the split point as a
    // string cast back to the column's own type (getTimestamp would choke
    // on the java-8 LocalDateTime representation)
    val median = lit(ev.selectExpr("CAST(percentile_approx(ts, 0.5) AS STRING)")
      .head().getString(0)).cast(ev.schema("ts").dataType)
    def writeOne(df: DataFrame, name: String, mtime: Long): Unit = {
      val tmp = stageDir.resolve("_tmp")
      graft.util.AtomicTable.deleteRecursively(tmp)
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = {
        val st = Files.list(tmp)
        try st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally st.close()
      }
      Files.move(part, stageDir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      graft.util.AtomicTable.deleteRecursively(tmp)
      Files.setLastModifiedTime(stageDir.resolve(name),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val base = System.currentTimeMillis()
    writeOne(ev.filter(col("ts") <= median), "00_events.parquet", base)
    writeOne(ev.filter(col("ts") > median), "01_events.parquet", base + 60000)
    def sentinel(offsetMs: Long) = ev.orderBy(col("ts").desc).limit(1)
      .withColumn("ts", col("ts") + expr(s"INTERVAL ${offsetMs / 1000} SECOND"))
      .withColumn("event_type", lit("sentinel"))
    writeOne(sentinel(20L * GapMs), "02_sentinel.parquet", base + 120000)
    writeOne(sentinel(40L * GapMs), "03_sentinel.parquet", base + 180000)
    Files.writeString(stamp, want + "\n")
  }

  /** foreachBatch upsert sink: each micro-batch's per-user aggregates are
    * MERGED into a parquet state table (read-modify-overwrite — the
    * plain-parquet stand-in for a Delta MERGE sink). foreachBatch is the
    * streaming escape hatch for sinks Spark has no native writer for; the
    * batchId parameter is what makes restarts idempotent (a real
    * deployment records it in the sink transaction). Single-batch replay
    * ⇒ final state equals the batch aggregate, which the oracle checks. */
  def upsertSink(s: SparkSession, d: String): DataFrame =
    upsertSinkFrom(s, eventsStream(s, d),
      s"/tmp/graft_stream_state/${graft.util.PathKeys.safe(d)}/user_totals",
      OutputMode.Complete)

  /** Core of the upsert sink, parameterized so tests can drive it with a
    * multi-batch source (maxFilesPerTrigger) and Update output mode —
    * where the merge genuinely bites: each micro-batch carries only the
    * keys it updated, and earlier keys must survive via the state table. */
  def upsertSinkFrom(s: SparkSession, events: DataFrame, stateDir: String,
    mode: OutputMode): DataFrame = {
    import graft.util.AtomicTable
    // truncate-and-reload semantics per run (S6): start from no state
    AtomicTable.deleteRecursively(java.nio.file.Paths.get(stateDir))
    val agg = events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
    val q = agg.writeStream
      .outputMode(mode)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val incoming = batch.select(col("user_id"), col("n_events"), col("sum_value"))
        val merged =
          if (AtomicTable.exists(stateDir)) {
            val state = AtomicTable.read(batch.sparkSession, stateDir)
              .select(col("user_id").as("s_uid"), col("n_events").as("s_n"),
                col("sum_value").as("s_v"))
            incoming.join(state, col("user_id") === col("s_uid"), "full_outer")
              .select(
                coalesce(col("user_id"), col("s_uid")).as("user_id"),
                coalesce(col("n_events"), col("s_n")).as("n_events"),
                coalesce(col("sum_value"), col("s_v")).as("sum_value"))
          } else incoming
        // atomic publish: the merged state lands in a fresh version dir and
        // goes live via a pointer swap — a crash mid-batch leaves the
        // previous complete state readable (no delete-then-move window).
        // Restart idempotence comes from replaying the batch: the merge is
        // keyed, so re-merging the same batchId converges on the same state.
        AtomicTable.publish(stateDir)(dir => merged.coalesce(1).write.mode("overwrite").parquet(dir))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    AtomicTable.read(s, stateDir)
      .select(col("user_id"), col("n_events"),
        round(col("sum_value"), 2).as("total_value"))
      .orderBy("user_id")
  }

  val upsertSinkOracle: String = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY user_id ORDER BY user_id"""

  /** Streaming ingest that maintains file-level data-skipping metadata as
    * it lands — the lakehouse ingest path ([[graft.ops.DataSkipping]] is
    * the batch-side OPTIMIZE; this is the write-side twin). Each
    * micro-batch is range-clustered by event time and written to its own
    * immutable batch directory, then ONE stats pass over just that
    * batch's files (grouped by `_metadata.file_path`) APPENDS per-file
    * min/max zone-map rows to the shared `_skip` sidecar — incremental
    * metadata maintenance proportional to the batch, never a re-scan of
    * the table, exactly how a 100 TB continuous ingest keeps its stats
    * current. Readers prune with the same sidecar-filter shape as the
    * batch operators: a 2-day window over the 30-day stream touches only
    * the files whose [min_ts, max_ts] box intersects it. */
  def skipIngest(s: SparkSession, d: String): DataFrame =
    skipIngestFrom(s, eventsStream(s, d),
      s"/tmp/graft_stream_state/${graft.util.PathKeys.safe(d)}/events_skip")

  /** Core of the skipping ingest, parameterized so the spec can drive it
    * with a multi-batch source (maxFilesPerTrigger) and prove the sidecar
    * grows batch-by-batch. */
  def skipIngestFrom(s: SparkSession, events: DataFrame, tableDir: String): DataFrame = {
    import graft.util.AtomicTable
    // truncate-and-reload per run (S6): a fresh ingest, no stale batches
    AtomicTable.deleteRecursively(java.nio.file.Paths.get(tableDir))
    val q = events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ss = batch.sparkSession
        val dir = s"$tableDir/batch_$batchId"
        batch.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
          .write.mode("overwrite").parquet(dir)
        // incremental sidecar maintenance: stats over ONLY this batch's
        // files, appended — cost ∝ batch, not table
        ss.read.parquet(dir)
          .select(col("_metadata.file_path").as("path"), col("ts"))
          .groupBy("path")
          .agg(min("ts").as("min_ts"), max("ts").as("max_ts"),
            count(lit(1)).as("rows"))
          .coalesce(1).write.mode("append").parquet(s"$tableDir/_skip")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // skipping read on the batch session: sidecar filter → surviving
    // files only → exact predicate on the residue
    val (lo, hi) = (lit("2024-01-10 00:00:00").cast("timestamp"),
      lit("2024-01-12 00:00:00").cast("timestamp"))
    val stats = s.read.parquet(s"$tableDir/_skip")
    val kept = stats.where(!(col("max_ts") < lo || col("min_ts") >= hi))
      .select("path").collect().map(_.getString(0)).toSeq
    val pruned =
      if (kept.isEmpty) s.read.parquet(tableDir + "/batch_0").where(lit(false))
      else s.read.parquet(kept: _*)
    pruned.where(col("ts") >= lo && col("ts") < hi)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  val skipIngestOracle: String = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
GROUP BY 1 ORDER BY 1"""

  /** Stream-static enrichment join: every micro-batch of the event stream
    * joins against a STATIC dimension snapshot (customer → market
    * segment), then aggregates per segment. The static side is planned as
    * a broadcast per micro-batch — the standard way to attach dimension
    * attributes to a stream without any stateful join; re-reading the
    * (small) dim each batch is what keeps slowly-changing dims fresh in a
    * long-running query. */
  def enrichJoin(s: SparkSession, d: String): DataFrame = {
    val ev = eventsStream(s, d)
    // the dim must live on the SAME session as the stream it joins
    val dim = Tables.customer(ev.sparkSession, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val agg = ev
      .join(broadcast(dim), Seq("user_id"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_enrich")
      .orderBy("c_mktsegment")
  }

  val enrichJoinOracle: String = """
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Stream-STREAM inner join: view events joined to purchase events of the
    * same user within a 24-hour attribution window. Both sides are
    * independent readStream sources with their own event-time watermark;
    * the equality key (user_id) plus the two-sided time-range predicate is
    * exactly the shape Spark's symmetric-hash stream join needs to bound
    * its state — each side buffers only rows younger than watermark +
    * window, keyed by user, and append mode emits a pair the moment both
    * rows exist. The single-batch replay makes the result equal the batch
    * interval join the oracle runs. */
  def streamStreamJoin(s: SparkSession, d: String): DataFrame = {
    val views = eventsStream(s, d)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val purchases = eventsStream(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "10 minutes")
    val joined = views.join(purchases,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
    runToTable(s, joined, OutputMode.Append, "graft_stream_ss_join")
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"))
      .orderBy("user_id", "view_id", "purchase_id")
  }

  val streamStreamJoinOracle: String = """
SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id,
       a.ts AS view_ts, b.ts AS purchase_ts
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'view' AND b.event_type = 'purchase'
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 24 HOUR
ORDER BY a.user_id, view_id, purchase_id"""

  /** Stream-stream FULL OUTER join, gated (MultiBatchStreamSpec proves the
    * multi-batch expiry semantics; this makes the driver enforce it per
    * round): same attribution join as [[streamStreamJoin]], but BOTH
    * sides' unmatched rows emit null-padded once watermark expiry evicts
    * them from state. Outer emission is expiry-driven, so the replay
    * needs TWO micro-batches: the data file is batch 1 (watermark still
    * at its floor — every row joins), then a SENTINEL file (one max-ts
    * row of a type neither side keeps) forces batch 2, in which the
    * batch-1 watermark (max event time − 10 min) is applied and the
    * expired unmatched state emits. `maxFilesPerTrigger=1` plus pinned
    * file mtimes fixes the batch order — sentinel-first would set the
    * watermark BEFORE the data arrived and drop every real event as
    * late. State whose window reaches past the watermark is still open
    * (correctly — a live stream would see more data), so the gated value
    * keeps only rows ≥ 25 h before the stream's end: view state expires
    * at view_ts + 24 h < WM and purchase state at purchase_ts < WM, so
    * everything at or below the cutoff is provably emitted, 50 min clear
    * of either boundary. The oracle restates the batch FULL OUTER join
    * under the same cutoff. */
  def streamStreamOuter(s0: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val s = streamSession(s0, d)
    // own staging dir: the sentinel row must never pollute the shared
    // events stage other stream queries aggregate over
    val stageDir = Paths.get(
      s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}_outer")
    stageInto(s"$d/events.parquet", stageDir, "events.parquet")
    val dataFile = stageDir.resolve("events.parquet")
    val dataMtime = Files.getLastModifiedTime(dataFile).toMillis
    val sentinel = stageDir.resolve("zz_sentinel.parquet")
    // sentinel freshness is keyed on a CONTENT STAMP of the staged data
    // file (size + mtime, in a dot-file the source listing ignores) —
    // comparing the sentinel's pinned mtime against the data's would
    // permanently suppress a rebuild after a source regeneration inside
    // the pin offset, serving a stale-vintage sentinel (review finding)
    val stamp = s"${Files.size(dataFile)}:$dataMtime"
    val stampFile = stageDir.resolve(".zz_sentinel_src")
    val fresh = Files.exists(sentinel) && Files.exists(stampFile) &&
      Files.readString(stampFile).trim == stamp
    if (!fresh) {
      // the max-RAW-ts row retyped: normalizeTs is monotonic in the raw
      // encoding, so this row's event time equals the stream's max and
      // never moves the watermark beyond what the data already set.
      // Staged in a SIBLING dir — part files written inside the watched
      // dir could be listed mid-write by a concurrent session's source.
      val tmpDir = java.nio.file.Paths.get(stageDir.toString + "_stage")
      graft.util.AtomicTable.deleteRecursively(tmpDir)
      Tables.eventsRaw(s, d).orderBy(col("ts").desc).limit(1)
        .withColumn("event_type", lit("sentinel"))
        .coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      import scala.jdk.CollectionConverters._
      val part = {
        val st = Files.list(tmpDir)
        try st.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        finally st.close()
      }
      Files.move(part, sentinel,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      graft.util.AtomicTable.deleteRecursively(tmpDir)
      Files.writeString(stampFile, stamp)
    }
    // the file source processes files in mtime order — pin data < sentinel
    Files.setLastModifiedTime(sentinel,
      java.nio.file.attribute.FileTime.fromMillis(dataMtime + 60000L))
    val schema = Tables.eventsRaw(s, d).schema
    // watermark BEFORE the type filter: the sentinel must flow through the
    // EventTimeWatermark node (to let batch 2 exist with the data's max
    // event time intact) and only then drop out of both join sides
    def side(): DataFrame = Tables.normalizeTs(
      s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(stageDir.toString))
      .withWatermark("ts", "10 minutes")
    val views = side().filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    val purchases = side().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"))
    val joined = views.join(purchases,
      col("v_user_id") === col("p_user_id") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"),
      "fullOuter")
    val out = runToTable(s0, joined, OutputMode.Append, "graft_stream_ss_outer")
    // full-precision cutoff: lit(Timestamp) keeps micros, so the boundary
    // compare is exact on both engines
    val maxTs = Tables.events(s, d).agg(max("ts")).head().getTimestamp(0)
    out.filter(coalesce(col("view_ts"), col("purchase_ts")) <=
        lit(maxTs) - expr("INTERVAL 25 HOURS"))
      .select(coalesce(col("v_user_id"), col("p_user_id")).as("user_id"),
        col("view_id"), col("purchase_id"), col("view_ts"), col("purchase_ts"))
      .orderBy(col("user_id"), col("view_id").asc_nulls_first,
        col("purchase_id").asc_nulls_first)
  }

  val streamStreamOuterOracle: String = """
WITH v AS (
  SELECT event_id AS view_id, user_id AS v_user_id, ts AS view_ts
  FROM events WHERE event_type = 'view'),
p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT * FROM v FULL OUTER JOIN p
    ON v_user_id = p_user_id
   AND purchase_ts > view_ts
   AND purchase_ts <= view_ts + INTERVAL 24 HOURS)
SELECT coalesce(v_user_id, p_user_id) AS user_id, view_id, purchase_id,
       view_ts, purchase_ts
FROM j
WHERE coalesce(view_ts, purchase_ts) <=
      (SELECT max(ts) FROM events) - INTERVAL 25 HOURS
ORDER BY user_id, view_id NULLS FIRST, purchase_id NULLS FIRST"""

  /** Streaming corpus ingestion — the LLM-pipeline filters running as a
    * structured stream: documents arrive as files, each micro-batch is
    * language-classified and quality-scored with the SAME Column
    * expressions the batch path uses ([[graft.ops.TextOps]]), and the
    * running per-language keep counts aggregate in the state store. One
    * unified declarative definition serving both batch backfill and
    * streaming ingestion is exactly the Spark argument; the oracle runs
    * the batch equivalent. */
  def corpusFilterStream(s: SparkSession, d: String): DataFrame = {
    import graft.ops.TextOps
    val ss = streamSession(s, d)
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}_docs")
    stageInto(s"$d/documents.parquet", stageDir, "documents.parquet")
    val schema = graft.Tables.documents(ss, d).schema
    val isEn = TextOps.hitCount("en") > greatest(TextOps.hitCount("es"),
      TextOps.hitCount("de"), TextOps.hitCount("fr"))
    val q = least(size(TextOps.ws).cast("double") / 100, lit(1.0)) * 0.4 +
      ((length(col("text")) - length(regexp_replace(col("text"), "[a-zA-Z]", "")))
        .cast("double") / length(col("text"))) * 0.4 +
      least(TextOps.hitCount("en").cast("double") / size(TextOps.ws) * lit(5.0),
        lit(1.0)) * 0.2
    val agg = ss.readStream.schema(schema).parquet(stageDir.toString)
      .filter(isEn && q >= 0.5)
      .groupBy("lang").agg(count(lit(1)).as("n_kept"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_corpus")
      .orderBy("lang")
  }

  val corpusFilterStreamOracle: String = {
    import graft.ops.TextOps
    s"""
WITH scored AS (
  SELECT lang,
         ${TextOps.hitCountSql("en")} > greatest(${TextOps.hitCountSql("es")},
           ${TextOps.hitCountSql("de")}, ${TextOps.hitCountSql("fr")}) AS is_en,
         least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4 +
           ((len(text) - len(regexp_replace(text, '[a-zA-Z]', '', 'g'))) * 1.0
             / len(text)) * 0.4 +
           least(${TextOps.hitCountSql("en")} * 1.0 / len(string_split(text, ' ')) * 5.0,
             1.0) * 0.2 AS q
  FROM documents)
SELECT lang, count(*) AS n_kept FROM scored
WHERE is_en AND q >= 0.5 GROUP BY lang ORDER BY lang"""
  }

  /** STREAMING ANN SERVING — the model-serving shape of the PQ index: a
    * stream of query vectors (the embeddings table staged as arriving
    * files) is joined STREAM-STATIC against the memoized PQ codes index
    * ([[graft.ops.Similarity.pqCodesIndex]] — the session artifact the
    * batch path built), scored per micro-batch with the `pq_table` /
    * `pq_adc` codegen kernels, and ranked by the `topk_min`
    * TypedImperativeAggregate running as STREAMING STATE (its
    * serialize/deserialize contract is exactly what the state store
    * needs between micro-batches). Because the file source delivers one
    * batch, the final state must equal the batch [[graft.ops.Similarity
    * .annPqTopK]] result — so this query SHARES the batch PQ oracle,
    * proving streaming ≡ batch the same way `stream_session_window`
    * shares the sessionize oracle.
    *
    * Scale shape: at 100 TB the index side is the big one — it stays
    * partitioned and cached (8 bytes + id per vector); each micro-batch
    * broadcasts only the arriving queries' 8×16 lookup tables. The
    * GATE's arrival stream is the seeded 64-query budget (r15: the
    * %100 fixture made the arrival RATE scale with the corpus, so the
    * gate was O(n²/100) inside one micro-batch — it OOM'd the 16 GB
    * heap at sf30; a production arrival rate is queries/sec, not a
    * corpus fraction). Output carries `sample_q`, sharing the sampled
    * batch-PQ oracle — streaming ≡ batch stays the gated claim. */
  def annServeStream(s0: SparkSession, d: String): DataFrame = {
    val s = streamSession(s0, d)
    graft.functions.GraftFunctions.register(s)
    import graft.ops.Similarity
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_emb/${graft.util.PathKeys.safe(d)}")
    stageInto(s"$d/embeddings.parquet", stageDir, "embeddings.parquet")
    val schema = Tables.embeddings(s, d).schema
    val codes = Similarity.pqCodesIndex(s, d)
    val cbLit = Similarity.pqCbLit(s, d)
    val sample = Similarity.seededQuerySample(s, d)
      .withColumnRenamed("query_id", "vec_id")
    val qstream = s.readStream.schema(schema).parquet(stageDir.toString)
      .filter(col("vec_id") % 100 === 0)
      .join(broadcast(sample), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(call_function("array_dot", col("v"), col("v"))))
      .withColumn("q", transform(col("v"),
        x => floor(x / col("nrm") * lit(1e6)).cast("long")))
      .select(col("query_id"),
        call_function("pq_table", col("q"), cbLit,
          lit(Similarity.PqM), lit(Similarity.PqC), lit(Similarity.PqSub)).as("qtab"))
    val agg = qstream.join(codes, col("vec_id") =!= col("query_id"))
      // score in the join projection — the qtab lookup table must never
      // ride into the aggregation's (sort-fallback-prone) input rows;
      // see Similarity.annPqTopK's note (the r14 sf10 OOM site)
      .select(col("query_id"),
        call_function("pq_adc", col("qtab"), col("codes"),
          lit(Similarity.PqM), lit(Similarity.PqC)).as("adist"),
        col("vec_id"))
      .groupBy("query_id")
      .agg(call_function("topk_min",
        col("adist"), col("vec_id"), lit(Similarity.K)).as("top"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_ann")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("vec_id"),
        col("col.dist").as("adist"), (col("pos") + 1).cast("int").as("rnk"))
      .crossJoin(broadcast(sample.agg(count(lit(1)).as("sample_q"))))
      .orderBy("query_id", "rnk")
  }

  /** STREAMING INGESTION DEDUP against the STORED LSH index — the
    * arriving batch (the top doc_id decile, staged as files) probes the
    * persisted MinHash band index ([[graft.ops.Dedup.bandedTable]], the
    * SilverArtifact the batch path built) with THREE stream-static joins
    * and no per-batch index work: each new document's banded signature is
    * a pure per-row computation ([[graft.ops.Dedup.bandedOfShingles]] —
    * `array_min` over transformed shingle arrays, no aggregation), its
    * band values equi-join the stored index, and candidates are
    * exact-Jaccard-verified against the stored shingle table. The one
    * streaming aggregation collapses a pair's multiple band collisions.
    * Because the file source delivers the whole batch, the final state
    * must equal the batch [[graft.ops.Dedup.minhashIncremental]] — so
    * this query SHARES that oracle, proving streaming ≡ batch. Daily
    * cost scales with the arriving batch, never the corpus: the index
    * side stays cached/partitioned, only new docs flow. */
  def minhashDedupStream(s0: SparkSession, d: String): DataFrame = {
    import graft.ops.Dedup
    val s = streamSession(s0, d)
    val stageDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_src/${graft.util.PathKeys.safe(d)}_docs")
    stageInto(s"$d/documents.parquet", stageDir, "documents.parquet")
    val schema = graft.Tables.documents(s, d).schema
    val maxId = graft.Tables.documents(s, d).agg(max("doc_id")).head().getLong(0)
    val thr = 9L * maxId / 10
    val shingles = Dedup.shingleTable(s, d)
    val idx = Dedup.bandedTable(s, d).filter(col("doc_id") < thr)
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_val"))
    val batch = s.readStream.schema(schema).parquet(stageDir.toString)
      .filter(col("doc_id") >= thr)
      .select(col("doc_id").as("doc_b"))
      .join(shingles.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b"), col("m").as("mb")), "doc_b")
      .select(col("doc_b"), col("sh_b"), col("mb"),
        posexplode(Dedup.bandedOfShingles(col("sh_b")))
          .as(Seq("band_idx", "band_val")))
    val hits = batch.join(idx, Seq("band_idx", "band_val"))
      .join(shingles.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a"), col("m").as("ma")), "doc_a")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("ma") + col("mb") - col("inter")), 6))
      .filter(col("jaccard") >= 0.9)
      .groupBy("doc_a", "doc_b")
      .agg(first("jaccard").as("jaccard"))
    runToTable(s, hits, OutputMode.Complete, "graft_stream_minhash")
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL MATERIALIZED-VIEW maintenance driven by the streaming
    * change feed — the composition the whole CDF tier exists for: a
    * per-status aggregate MV is seeded from the PRE-MERGE table, then
    * each micro-batch of `_changes` (one merge commit per trigger)
    * folds in as algebraic deltas — `update_preimage`/`delete` retract
    * (−1, −cents), `update_postimage`/`insert` add — and the refreshed
    * MV publishes through [[graft.util.AtomicTable.publishIdempotent]]
    * under the batch id, so a restarted maintainer can never
    * double-apply a commit. Refresh cost is ∝ |changes| + |MV|, never
    * ∝ |table| (the batch `mv_cdc_refresh` argument, now with the feed,
    * the delivery, and the exactly-once sink all real). The gate: the
    * final MV must land EXACTLY on the merged table's aggregate — it
    * shares `merge_upsert_mor`'s oracle, proving feed-maintained ≡
    * recomputed. */
  def mvFromChangesStream(s0: SparkSession, d: String): DataFrame = {
    import graft.util.AtomicTable
    val base = graft.ops.MergeOnRead.morOrders(s0, d)
    val dir = graft.ops.MergeOnRead.changesPath(base)
    val s = streamSession(s0, d)
    val mvDir =
      s"/tmp/graft_stream_state/${graft.util.PathKeys.safe(d)}/mv_from_cdf"
    AtomicTable.deleteRecursively(java.nio.file.Paths.get(mvDir))
    // seed: the MV over the table as of the initial publish (v1 data
    // files — the merges changed only sidecars, so this is the pre-merge
    // state, exactly where the change feed picks up)
    AtomicTable.overwrite(
      AtomicTable.read(s, base)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .coalesce(1),
      mvDir, keep = 2)
    val schema = s.read.parquet(dir).schema
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val ss = batch.sparkSession
        val deltas = batch.withColumn("sign",
            when(col("_change_type").isin("update_preimage", "delete"), -1L)
              .otherwise(1L))
          .groupBy("o_orderstatus")
          .agg(sum(col("sign")).as("dn"),
            sum(col("sign") * round(col("o_totalprice") * 100).cast("long"))
              .as("dcents"))
        // no recache hazard here: deltas read only the micro-batch's CDF
        // files, and the MV read inside the staged write resolves the
        // CURRENT version path eagerly — the write targets a different,
        // not-yet-published directory
        AtomicTable.publishIdempotent(mvDir, "mv_maintainer", id, keep = 2) {
          out =>
            AtomicTable.read(ss, mvDir)
              .join(deltas, Seq("o_orderstatus"), "full_outer")
              .select(col("o_orderstatus"),
                (coalesce(col("n_orders"), lit(0L)) +
                  coalesce(col("dn"), lit(0L))).as("n_orders"),
                (coalesce(col("total_cents"), lit(0L)) +
                  coalesce(col("dcents"), lit(0L))).as("total_cents"))
              .filter(col("n_orders") > 0L)
              .coalesce(1).write.mode("overwrite").parquet(out)
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    AtomicTable.read(s, mvDir).orderBy("o_orderstatus")
  }

  /** EXACTLY-ONCE streaming ingestion into the versioned store — the
    * Delta idempotent-`foreachBatch` pattern ([[graft.util.AtomicTable
    * .publishIdempotent]] is the `txnAppId`/`txnVersion` contract): each
    * micro-batch publishes under its batch id as the transaction
    * version, so a RESTARTED stream that replays a batch (here: a second
    * run with no checkpoint, which re-delivers everything as batch 0)
    * skips the duplicate publish instead of double-ingesting. The gate
    * aggregates the LIVE table after the replay run — doubled rows would
    * break both count and sum. The failure mode this kills is the #1
    * real-world streaming-sink bug: foreachBatch + a non-transactional
    * write + a crash between sink write and checkpoint commit =
    * duplicated batch on recovery. */
  def exactlyOnceIngest(s0: SparkSession, d: String): DataFrame = {
    import graft.util.AtomicTable
    val tableDir =
      s"/tmp/graft_stream_state/${graft.util.PathKeys.safe(d)}/events_txn"
    AtomicTable.deleteRecursively(java.nio.file.Paths.get(tableDir))
    def runOnce(): Unit = {
      val q = eventsStream(s0, d).writeStream
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          // O(batch) exactly-once append: prior files hardlink into the
          // new version (metadata-only), only the batch's files write —
          // a 100 TB table takes a micro-batch at batch cost, never a
          // union-rewrite
          AtomicTable.appendIdempotent(tableDir, "events_ingest", id,
            keep = 2)(dir =>
            batch.coalesce(4).write.mode("append").parquet(dir))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce() // first run ingests batch 0
    runOnce() // checkpoint lost → full replay as batch 0 again: must skip
    AtomicTable.read(streamSession(s0, d), tableDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  val exactlyOnceIngestOracle: String = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1 ORDER BY 1"""

  /** STREAMING consumption of a table's change-data feed — the Delta
    * `readChangeFeed` analog: a downstream incremental consumer (MV
    * maintenance, replication, a search-index updater) subscribes to the
    * MERGE-emitted `_changes` files ([[graft.ops.MergeOnRead]]) instead
    * of re-scanning the table. `maxFilesPerTrigger=1` mirrors per-commit
    * delivery — each merge commit wrote exactly one change file, so the
    * two upsert commits arrive as two micro-batches, and the Complete-
    * mode rollup must converge on the batch [[graft.ops.MergeOnRead
    * .changesPath]] read's answer (the oracle restates both commits'
    * pre/post images from source). Consumer cost is ∝ changes, never
    * ∝ table — the whole point of a CDF at 100 TB. */
  def tableChangesStream(s0: SparkSession, d: String): DataFrame = {
    val base = graft.ops.MergeOnRead.morOrders(s0, d)
    val dir = graft.ops.MergeOnRead.changesPath(base)
    val s = streamSession(s0, d)
    val schema = s.read.parquet(dir).schema
    val agg = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .groupBy(col("_commit_version").as("commit_version"),
        col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    runToTable(s, agg, OutputMode.Complete, "graft_stream_cdf")
      .orderBy("commit_version", "change_type")
  }

  val tableChangesStreamOracle: String = """
SELECT CAST(cv AS BIGINT) AS commit_version, ct AS change_type,
       count(*) AS n_rows,
       CAST(sum(CAST(round(p * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM (
  SELECT 1 AS cv, 'update_preimage' AS ct, o_totalprice AS p
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT 1, 'update_postimage', o_totalprice + 10.0
  FROM orders WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT 1, 'insert', o_totalprice FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT 2, 'update_preimage', o_totalprice
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT 2, 'update_postimage', o_totalprice + 5.0
  FROM orders WHERE o_orderkey % 13 = 0
)
GROUP BY 1, 2 ORDER BY 1, 2"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_table_changes"   -> (tableChangesStream _),
    "stream_mv_from_changes" -> (mvFromChangesStream _),
    "stream_exactly_once"    -> (exactlyOnceIngest _),
    "stream_minhash_dedup"   -> (minhashDedupStream _),
    "stream_ann_serve"       -> (annServeStream _),
    "stream_corpus_filter"   -> (corpusFilterStream _),
    "stream_stream_join"     -> (streamStreamJoin _),
    "stream_stream_outer"    -> (streamStreamOuter _),
    "stream_enrich_join"     -> (enrichJoin _),
    "stream_tumbling_counts" -> (tumblingCounts _),
    "stream_drift_monitor"   -> (driftMonitor _),
    "stream_transform_state" -> (transformState _),
    "stream_state_inspect"   -> (stateInspect _),
    "stream_approx_distinct" -> (approxDistinctStream _),
    "stream_sliding_counts"  -> (slidingCounts _),
    "stream_sessionize"      -> (sessionize _),
    "stream_timer_sessions"  -> (timerSessions _),
    "stream_session_window"  -> (sessionWindow _),
    "stream_session_append"  -> (sessionWindowAppend _),
    "stream_dedup"           -> (streamDedup _),
    "stream_upsert_sink"     -> (upsertSink _),
    "stream_skip_ingest"     -> (skipIngest _)
  )

  val oracleSql: Map[String, String] = Map(
    // streaming serving must equal the batch PQ result — shared oracle
    "stream_ann_serve"       -> graft.ops.Similarity.annPqSampledOracle,
    "stream_table_changes"   -> tableChangesStreamOracle,
    // feed-maintained MV ≡ the merged table's aggregate: shares the
    // merge_upsert_mor restatement verbatim
    "stream_mv_from_changes" -> graft.ops.MergeOnRead.oracleSql("merge_upsert_mor"),
    "stream_exactly_once"    -> exactlyOnceIngestOracle,
    "stream_minhash_dedup"   -> graft.ops.Dedup.minhashIncrementalOracle(),
    "stream_corpus_filter"   -> corpusFilterStreamOracle,
    "stream_stream_join"     -> streamStreamJoinOracle,
    "stream_stream_outer"    -> streamStreamOuterOracle,
    "stream_enrich_join"     -> enrichJoinOracle,
    "stream_tumbling_counts" -> tumblingOracle,
    "stream_drift_monitor"   -> driftMonitorOracle,
    "stream_transform_state" -> transformStateOracle,
    "stream_state_inspect"   -> stateInspectOracle,
    "stream_approx_distinct" -> approxDistinctStreamOracle,
    "stream_sliding_counts"  -> slidingOracle,
    "stream_sessionize"      -> sessionizeOracle,
    "stream_session_window"  -> sessionizeOracle, // built-in ≡ custom state
    "stream_session_append"  -> sessionizeOracle, // terminal-flushed Append ≡ batch
    "stream_timer_sessions"  -> sessionizeOracle, // timer-closed ≡ batch
    "stream_dedup"           -> streamDedupOracle,
    "stream_upsert_sink"     -> upsertSinkOracle,
    "stream_skip_ingest"     -> skipIngestOracle
  )
}
