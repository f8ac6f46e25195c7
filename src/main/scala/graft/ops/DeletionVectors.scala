package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.util.{AtomicTable, PathKeys, SessionCaches}

/** Merge-on-read row deletes — deletion vectors, the mechanism modern
  * table formats (Delta DVs, Iceberg position deletes) use to delete rows
  * WITHOUT rewriting data files. At 100 TB a copy-on-write delete of 0.1%
  * of rows rewrites terabytes; a deletion vector writes kilobytes.
  *
  * Mechanics on top of [[AtomicTable]]'s immutable version directories:
  *
  *  - **delete** — one scan evaluates the predicate and records each
  *    matching row's physical position `(file, row_index)` (Spark's
  *    parquet `_metadata.row_index` column — the row's ordinal within its
  *    file, stable because data files are immutable). Positions append to
  *    a `_dv` sidecar inside the SAME version directory, so version
  *    pruning/time travel carry the deletes with the data they apply to,
  *    and plain readers (which ignore `_`-prefixed dirs) are untouched.
  *  - **read** — the DV applies as a broadcast LEFT ANTI join on
  *    (file, position): the DV side is deleted-rows-sized (kilobytes to
  *    megabytes), so the data side never shuffles. An engine deleting
  *    billions of rows per file would swap the broadcast list for a
  *    per-file bitmap pushed into the scan; the join shape here is the
  *    same decision Delta makes below its DV-bitmap threshold.
  *  - **idempotence / composition** — the anti-join is set semantics:
  *    re-appending the same positions or composing multiple deletes is
  *    harmless (duplicates cannot double-delete).
  *  - **compaction** — `compactDeletes` materializes the surviving rows
  *    into a NEW version (atomic publish) whose `_dv` starts empty:
  *    merge-on-read debt is paid back in one rewrite, exactly Delta's
  *    `REORG TABLE ... APPLY (PURGE)`.
  */
object DeletionVectors {

  private val Dv = "_dv"

  private[ops] def verDir(base: String): String =
    AtomicTable.resolve(base).getOrElse(
      throw new IllegalStateException(s"no published version at $base"))

  private[ops] def dvPath(base: String): String = s"${verDir(base)}/$Dv"

  /** Record (do not rewrite): append the physical positions of rows
    * matching `pred` to the current version's deletion vector. */
  def deleteWhere(s: SparkSession, base: String, pred: Column): Unit =
    s.read.parquet(verDir(base))
      .where(pred)
      .select(col("_metadata.file_path").as("path"),
        col("_metadata.row_index").as("pos"))
      .coalesce(1)
      .write.mode("append").parquet(dvPath(base))

  private[ops] def hasDv(base: String): Boolean =
    java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dvPath(base)))

  /** The table with its deletion vector applied. Broadcast anti-join on
    * the physical position — the data side keeps its partitioning and
    * never shuffles. */
  def readWithDv(s: SparkSession, base: String): DataFrame = {
    val dataCols = AtomicTable.read(s, base).columns.map(col).toSeq
    val data = s.read.parquet(verDir(base))
      .withColumn("__path", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    if (!hasDv(base)) data.select(dataCols: _*)
    else {
      val dv = s.read.parquet(dvPath(base))
        .select(col("path").as("__path"), col("pos").as("__pos"))
      data.join(broadcast(dv), Seq("__path", "__pos"), "left_anti")
        .select(dataCols: _*)
    }
  }

  /** Pay back the merge-on-read debt: publish a new version holding only
    * the surviving rows (fresh `_dv`-free files), atomically. */
  def compactDeletes(s: SparkSession, base: String, nFiles: Int = 8): Unit = {
    val survivors = readWithDv(s, base)
    AtomicTable.publish(base)(dir =>
      survivors.repartition(nFiles).write.mode("overwrite").parquet(dir))
  }

  // --------------------------------------- composition with file skipping

  /** Files of `base` whose EVERY row is deleted — decided purely from
    * metadata: the DV's per-file distinct-position counts against the
    * zone-map sidecar's per-file row counts ([[DataSkipping.stats]]).
    * Both sides are file-count-sized (never data-sized), so at 100 TB
    * this is a metadata join over ~10^6 rows, the same shape as a Delta
    * log replay deciding a file is 100% covered by its DV bitmap. */
  def dvDeadFiles(s: SparkSession, base: String): Seq[String] = {
    if (!hasDv(base)) return Seq.empty
    val dead = s.read.parquet(dvPath(base))
      .select("path", "pos").distinct() // delete idempotence: re-appended positions count once
      .groupBy("path").agg(count(lit(1)).as("n_dead"))
    DataSkipping.stats(s, base)
      .join(dead, "path")
      .where(col("n_dead") === col("rows"))
      .select("path").collect().map(_.getString(0)).toSeq
  }

  /** [[readWithDv]] composed with file skipping: fully-deleted files are
    * pruned OUT OF THE SCAN (they never reach the FileScan's path list —
    * DvPruneSpec asserts `inputFiles` shrinks), and the broadcast DV
    * drops their entries too, so a delete of an entire partition costs
    * zero data I/O at read time instead of scan-then-anti-join. Partially
    * deleted files keep the positional anti-join. Returns the DataFrame
    * plus (keptFiles, totalFiles) for plan audits. */
  def readWithDvPruned(s: SparkSession, base: String): (DataFrame, Int, Int) = {
    val dataCols = AtomicTable.read(s, base).columns.map(col).toSeq
    val all = DataSkipping.stats(s, base)
      .select("path").collect().map(_.getString(0)).toSeq
    val dead = dvDeadFiles(s, base).toSet
    val kept = all.filterNot(dead)
    val data = DataSkipping.readFiles(s, base, kept)
      .withColumn("__path", col("_metadata.file_path"))
      .withColumn("__pos", col("_metadata.row_index"))
    val out =
      if (!hasDv(base)) data.select(dataCols: _*)
      else {
        val dv = s.read.parquet(dvPath(base))
          .where(if (dead.isEmpty) lit(true) else !col("path").isin(dead.toSeq: _*))
          .select(col("path").as("__path"), col("pos").as("__pos"))
        data.join(broadcast(dv), Seq("__path", "__pos"), "left_anti")
          .select(dataCols: _*)
      }
    (out, kept.size, all.size)
  }

  // --------------------------------------------------------------- queries

  private val dvMemo =
    SessionCaches.memo[(SparkSession, String)]("deletion_vectors.orders")

  /** The delete this query family applies — restated verbatim in the
    * oracle's WHERE NOT(...). */
  private def doomed: Column =
    col("o_orderpriority") === "1-URGENT" && col("o_orderkey") % 10 < 3

  /** orders staged (plain range-clustered copy, separate from the
    * skipping demos so their file counts stay untouched) with the delete
    * recorded ONCE per session — the memo is the "delete committed"
    * state a real table carries in its metadata. */
  private def dvOrders(s: SparkSession, d: String): String =
    dvMemo.getOrElseUpdate((s, d), {
      val base = s"/tmp/graft_dv/${PathKeys.safe(d)}/orders"
      AtomicTable.publish(base) { dir =>
        Tables.orders(s, d).repartition(8).write.mode("overwrite").parquet(dir)
      }
      deleteWhere(s, base, doomed)
      base
    })

  /** Aggregate over the DV-applied table — answer must equal a full scan
    * with the delete predicate negated (the oracle), proving the
    * positional anti-join deletes exactly the doomed rows. Prices sum as
    * exact integer cents: group totals reach ~10^9 where cross-engine
    * double summation-order error exceeds the 4-dp compare grid (the r9
    * hash flake); per-row `round(x*100)` is IEEE-identical across engines
    * and the long sum is exact. */
  def deletionVectorRead(s: SparkSession, d: String): DataFrame =
    readWithDv(s, dvOrders(s, d))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("o_orderstatus")

  private val dvpMemo =
    SessionCaches.memo[(SparkSession, String)]("deletion_vectors.orders_pruned")

  /** The pruning demo's delete: a date-RANGE predicate against a table
    * range-clustered ON that date, so the leading files die entirely (the
    * "drop an old partition" shape) while the boundary file dies only
    * partially — both paths of [[readWithDvPruned]] exercise. Restated
    * verbatim in the oracle's WHERE NOT(...). */
  private val pruneCutoff = "1996-07-01"

  /** orders staged date-clustered WITH a zone-map sidecar (so per-file row
    * counts exist as metadata), then the range delete recorded once per
    * session. Separate base from the skipping demos and [[dvOrders]] so
    * their file counts stay untouched. */
  private[graft] def dvPrunedOrders(s: SparkSession, d: String): String =
    dvpMemo.getOrElseUpdate((s, d), {
      val base = s"/tmp/graft_dvp/${PathKeys.safe(d)}/orders"
      DataSkipping.optimizedWrite(s,
        Tables.orders(s, d).withColumn("o_datekey",
          unix_date(col("o_orderdate").cast("date")).cast("long")),
        base, clusterCols = Seq("o_datekey"), statsCols = Seq("o_orderdate"),
        bloomCol = None, nFiles = 16)
      deleteWhere(s, base,
        col("o_orderdate") < lit(pruneCutoff).cast("timestamp"))
      base
    })

  /** Aggregate over the DV-applied, file-pruned table — answer must equal
    * the full scan with the delete negated, while the scan itself touches
    * only surviving files (DvPruneSpec + PLANS.md audit the path-list
    * shrink). Exact integer cents, as everywhere money sums cross 10^8. */
  def dvFilePrune(s: SparkSession, d: String): DataFrame = {
    val (df, _, _) = readWithDvPruned(s, dvPrunedOrders(s, d))
    df.groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "deletion_vector_read" -> (deletionVectorRead _),
    "dv_file_prune" -> (dvFilePrune _)
  )

  val oracleSql: Map[String, String] = Map(
    "deletion_vector_read" -> """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 10 < 3)
GROUP BY 1 ORDER BY 1""",
    "dv_file_prune" -> """
SELECT o_orderstatus, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
WHERE NOT (o_orderdate < TIMESTAMP '1996-07-01')
GROUP BY 1 ORDER BY 1"""
  )
}
