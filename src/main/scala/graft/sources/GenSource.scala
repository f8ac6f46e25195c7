package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 read path (SURVEY.md §2.1 extension surface): a
  * deterministic generated table — `id`, `bucket`, `val_hash`, `payload`
  * derived purely from the row id — demonstrating what a real connector
  * must implement for Spark to scan EFFICIENTLY at 100 TB:
  *
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `id` narrow the generated interval INSIDE the source,
  *    so partitions outside the range are never planned — the DSv2 analog
  *    of parquet row-group pruning. Pushed filters are fully handled
  *    (nothing is re-evaluated upstream).
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): readers
  *    materialize only the projected columns (md5 work is skipped when
  *    `val_hash`/`payload` are pruned).
  *  - **split planning** ([[Batch.planInputPartitions]]): the pruned range
  *    fans out into `splits` independent [[InputPartition]]s — the
  *    parallelism contract every distributed scan builds on.
  *
  * Row values are engine-neutral (md5-derived, integer hex parse), so the
  * whole path is differential-gate-checkable against DuckDB generating the
  * same rows from `range()`.
  *
  * Usage: `spark.read.format("graft.sources.GraftGen")
  *   .option("rows", n).option("splits", k).load()`.
  */
class GraftGen extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val splits = Option(properties.get("splits")).map(_.toInt).getOrElse(8)
    new GenTable(rows, splits)
  }
}

object GraftGen {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("val_hash", StringType, nullable = false),
    StructField("payload", DoubleType, nullable = false)))

  /** The deterministic row payload: md5 over a salted id. */
  def hashOf(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"g:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Uniform double in [0,1): first 8 md5 hex chars / 2^32 — the same
    * integer-hex-parse construction the DuckDB oracles use. */
  def payloadOf(hash: String): Double =
    java.lang.Long.parseLong(hash.substring(0, 8), 16).toDouble / 4294967296.0
}

private[sources] class GenTable(rows: Long, splits: Int) extends Table with SupportsRead {
  override def name: String = s"graftgen($rows rows, $splits splits)"
  override def schema: StructType = GraftGen.schema
  override def capabilities: util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GenScanBuilder(rows, splits)
}

private[sources] class GenScanBuilder(rows: Long, splits: Int) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = GraftGen.schema

  private def num(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case GreaterThanOrEqual("id", v) => num(v).isDefined
      case GreaterThan("id", v)        => num(v).isDefined
      case LessThanOrEqual("id", v)    => num(v).isDefined
      case LessThan("id", v)           => num(v).isDefined
      case EqualTo("id", v)            => num(v).isDefined
      case IsNotNull("id" | "bucket" | "val_hash" | "payload") => true
      case _ => false
    }
    supported.foreach {
      case GreaterThanOrEqual("id", v) => lo = math.max(lo, num(v).get)
      case GreaterThan("id", v)        => lo = math.max(lo, num(v).get + 1)
      case LessThanOrEqual("id", v)    => hi = math.min(hi, num(v).get + 1)
      case LessThan("id", v)           => hi = math.min(hi, num(v).get)
      case EqualTo("id", v)            => lo = math.max(lo, num(v).get); hi = math.min(hi, num(v).get + 1)
      case _ => () // IsNotNull on non-nullable columns is vacuously true
    }
    pushed = supported
    residual // range pruning is exact — pushed filters need no re-check
  }

  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new GenScan(lo, math.max(lo, hi), splits, required)
}

private[sources] class GenScan(lo: Long, hi: Long, splits: Int, schema: StructType)
  extends Scan with Batch {
  override def readSchema: StructType = schema
  override def description: String =
    s"GraftGen range=[$lo,$hi) cols=[${schema.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val span = hi - lo
    if (span <= 0) return Array.empty
    val n = math.min(splits.toLong, span).toInt
    (0 until n).map { i =>
      GenPartition(lo + span * i / n, lo + span * (i + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new GenReaderFactory(schema)
}

private[sources] case class GenPartition(start: Long, end: Long) extends InputPartition

private[sources] class GenReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GenReader(p.asInstanceOf[GenPartition], schema)
}

private[sources] class GenReader(p: GenPartition, schema: StructType)
  extends PartitionReader[InternalRow] {
  private var cur = p.start - 1
  override def next(): Boolean = { cur += 1; cur < p.end }
  override def get(): InternalRow = {
    // column pruning bites here: the md5 is computed at most once per row,
    // and not at all unless a hash-derived column survived the projection
    lazy val h = GraftGen.hashOf(cur)
    InternalRow.fromSeq(schema.fieldNames.toSeq.map {
      case "id" => cur
      case "bucket" => (cur % 16).toInt
      case "val_hash" => UTF8String.fromString(h)
      case "payload" => GraftGen.payloadOf(h)
    })
  }
  override def close(): Unit = ()
}
