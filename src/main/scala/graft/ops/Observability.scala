package graft.ops

import org.apache.spark.sql.DataFrame

/** Plan-level observability (A6 in SURVEY.md §2.4: the reference sums
  * pandas `memory_usage(deep=True)` over its transform frames,
  * etl_script_dwh/etl_dwh.py:92-98). The Spark-native equivalent reads
  * Catalyst's statistics instead of materializing anything: size-in-bytes
  * and row-count estimates straight off the optimized plan, refined by AQE
  * at runtime when adaptive execution is on. */
object Observability {

  final case class PlanStats(sizeBytes: BigInt, rowCount: Option[BigInt], numPartitions: Int)

  /** Optimizer estimates for a frame — no job is triggered. */
  def planStats(df: DataFrame): PlanStats = {
    val stats = df.queryExecution.optimizedPlan.stats
    PlanStats(stats.sizeInBytes, stats.rowCount, df.rdd.getNumPartitions)
  }

  /** Human-readable one-liner, the analog of the reference's printed MB
    * metric. Leaf scans are sized from file statistics and accurate;
    * without CBO column stats, Catalyst sizes joins as naive products that
    * can overflow any realistic magnitude — flag those instead of printing
    * a nonsense number. */
  def describe(name: String, df: DataFrame): String = {
    val s = planStats(df)
    val oneEB = BigInt(1L << 60)
    val sizeStr =
      if (s.sizeBytes > oneEB)
        "size estimate unreliable (naive join product; supply CBO stats for real numbers)"
      else f"est ${s.sizeBytes.toDouble / (1024 * 1024)}%.2f MB"
    s"$name: $sizeStr${s.rowCount.map(r => s", est $r rows").getOrElse("")}, ${s.numPartitions} partitions"
  }
}
