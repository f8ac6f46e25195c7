package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.Medallion

/** Pipeline/API-surface coverage queries:
  *
  *  - [[writeRoundtrip]] — S3/S6 (SURVEY.md §2.1): materialize the full
  *    bronze/silver/gold medallion to a lake directory with overwrite
  *    (truncate-and-reload semantics, etl_lakehouse.py:21-35) and read the
  *    fact back from storage — the reference's actual persistence path.
  *  - [[typedDatasetAgg]] — the typed Dataset[T]/Encoder surface
  *    (SURVEY.md §1.6): case-class rows, groupByKey + typed aggregation.
  *  - [[jsonExtract]] — semi-structured props column on the events stream:
  *    JSON field extraction + aggregation (extension; reference has no
  *    JSON anywhere).
  *  - [[csvRoundtrip]] — non-parquet format surface (reference is
  *    parquet-only; CSV/JSON readers are table-stakes for a lakehouse
  *    engine): write a dim as CSV, read it back with an explicit schema.
  */
object PipelineOps {

  /** Full medallion write + read-back of the gold fact from storage. */
  def writeRoundtrip(s: SparkSession, d: String): DataFrame = {
    val lake = s"/tmp/graft_lake/${graft.util.PathKeys.safe(d)}"
    Medallion.writeAll(s, d, lake)
    graft.util.AtomicTable.read(s, s"$lake/gold/fact_sales")
      // sale_year is the directory-partition column added by the layout
      // optimization in writeAll — project back to the logical fact schema
      .select("customer_sk", "part_sk", "supplier_sk", "date_sk", "price", "ship_cost")
      .orderBy("customer_sk", "part_sk", "supplier_sk", "date_sk", "price", "ship_cost")
  }

  case class LineRow(l_returnflag: String, l_linestatus: String,
    l_quantity: Double, l_extendedprice: Double)
  case class FlagAgg(flag_status: String, sum_qty: Double, n_rows: Long)

  /** Typed aggregator: sums quantity and counts rows with MAP-SIDE partial
    * aggregation. `mapGroups` would shuffle every input row to its group's
    * reducer (measured 2× slower at sf0.1); an Aggregator[IN,BUF,OUT]
    * reduces per-partition first — the typed API's equivalent of a hash
    * aggregate, and the §2.11 custom-aggregator surface. */
  object QtyCount extends org.apache.spark.sql.expressions.Aggregator[LineRow, (Double, Long), (Double, Long)] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: LineRow): (Double, Long) =
      (b._1 + a.l_quantity, b._2 + 1)
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Long)): (Double, Long) = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    override def outputEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      bufferEncoder
  }

  /** Typed Dataset path: Encoders, groupByKey, custom Aggregator —
    * compile-time field checking where the DataFrame path is
    * stringly-typed. l_quantity values are small integers as doubles, so
    * the partial-aggregated sum is exact in any order (oracle-safe). */
  def typedDatasetAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds: Dataset[LineRow] = Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
      .as[LineRow]
    ds.groupByKey(r => r.l_returnflag + "-" + r.l_linestatus)
      .agg(QtyCount.toColumn)
      .map { case (key, (qty, n)) => FlagAgg(key, qty, n) }
      .toDF()
      .orderBy("flag_status")
  }

  val typedDatasetAggOracle: String = """
SELECT concat(l_returnflag, '-', l_linestatus) AS flag_status,
       sum(l_quantity) AS sum_qty, count(*) AS n_rows
FROM lineitem
GROUP BY 1 ORDER BY flag_status"""

  /** JSON extraction over the events props column + grouped agg. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  val jsonExtractOracle: String = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type ORDER BY event_type"""

  /** CSV round-trip: write nation as headered CSV, read back with an
    * explicit StructType (never schema-inference for engine contracts). */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = s"/tmp/graft_csv/${graft.util.PathKeys.safe(d)}/nation"
    Tables.nation(s, d).write.mode("overwrite").option("header", "true").csv(out)
    s.read.schema(Tables.nation(s, d).schema).option("header", "true").csv(out)
      .orderBy("n_nationkey")
  }

  val csvRoundtripOracle: String =
    "SELECT * FROM nation ORDER BY n_nationkey"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_write_roundtrip" -> (writeRoundtrip _),
    "typed_dataset_agg"        -> (typedDatasetAgg _),
    "json_extract_props"       -> (jsonExtract _),
    "csv_roundtrip"            -> (csvRoundtrip _)
  )

  val oracleSql: Map[String, String] = Map(
    "pipeline_write_roundtrip" -> Analytics.oracleSql("gold_fact_sales"),
    "typed_dataset_agg"        -> typedDatasetAggOracle,
    "json_extract_props"       -> jsonExtractOracle,
    "csv_roundtrip"            -> csvRoundtripOracle
  )
}
