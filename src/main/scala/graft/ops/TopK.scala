package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Bounded top-K-per-group aggregation with MAP-SIDE partial buffers.
  *
  * The window formulation (`row_number().over(partitionBy(k).orderBy(v))
  * <= K`) must shuffle EVERY (group, item) row to its group's reducer and
  * sort whole partitions there. This typed `Aggregator` instead keeps a
  * bounded K-element buffer per group inside each map task (partial
  * aggregation), so only ≤ K rows per group per input partition ever
  * reach the shuffle — at 100 TB the difference between shuffling the
  * fact table and shuffling K·partitions rows per group. Results are
  * identical to the window version (same desc-score/asc-id tie order),
  * which the differential gate and TopKSpec both check. */
object TopK {

  /** Items are (id, score); kept order: score DESC, id ASC (the standard
    * deterministic top-k tie-break). Buffers are tiny (≤ K), so simple
    * sort-and-truncate beats a heap for the K this engine targets. */
  class TopKAgg(k: Int)
    extends Aggregator[(Long, Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {
    private val ord: Ordering[(Long, Double)] = Ordering.by(t => (-t._2, t._1))
    override def zero: Seq[(Long, Double)] = Seq.empty
    override def reduce(buf: Seq[(Long, Double)], a: (Long, Long, Double)): Seq[(Long, Double)] = {
      val item = (a._2, a._3)
      // hot path: a full buffer whose k-th element already beats this row
      // admits nothing — skip the allocation + sort entirely
      if (buf.size >= k && ord.lteq(buf.last, item)) buf
      else (item +: buf).sorted(ord).take(k)
    }
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      (a ++ b).sorted(ord).take(k)
    override def finish(r: Seq[(Long, Double)]): Seq[(Long, Double)] = r.sorted(ord)
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Double)]] =
      bufferEncoder
  }

  /** Top-3 parts per supplier by total quantity — semantically identical
    * to RelOps.windowRankPerGroup (shares its oracle) but aggregated with
    * the bounded-buffer path instead of a window sort. */
  def topPartsPerSupplier(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    import s.implicits._
    val totals = Tables.lineitem(s, d)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum("l_quantity").as("total_qty"))
      .as[(Long, Long, Double)]
    val top = totals.groupByKey(_._1)
      .agg(new TopKAgg(k).toColumn.name("top"))
    top.flatMap { case (supp, items) =>
      items.iterator.zipWithIndex.map { case ((part, qty), i) =>
        (supp, part, qty, i + 1)
      }
    }
      .toDF("l_suppkey", "l_partkey", "total_qty", "rnk")
      .orderBy("l_suppkey", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "topk_per_group_agg" -> ((s: SparkSession, d: String) => topPartsPerSupplier(s, d))
  )

  /** Same semantics ⇒ same oracle as the window formulation. */
  val oracleSql: Map[String, String] = Map(
    "topk_per_group_agg" -> graft.queries.RelOps.oracleSql("window_rank_per_group")
  )
}
