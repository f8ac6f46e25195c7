package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
/** Scratch: prove AQE runtime exchange/subtree reuse for restructured
  * queries (opt r17). Prints live (executed) shuffle-exchange, generate
  * and scan counts from the FINAL adaptive plan — the numbers static
  * `.explain` can't show because pre-AQE plans duplicate shared subtrees
  * (reuse is a runtime stage-cache effect). Distinct-by-id: a subtree
  * referenced from N consumers but materialized once counts once.
  * Usage: sbt "runMain graft.ProbeReuse <sfDir> q1,q2,..." */
object ProbeReuse {
  private def flatten(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec        => flatten(q.plan)
      case r: ReusedExchangeExec    => flatten(r.child)
      case other                    => other.children.flatMap(flatten)
    })
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq("tfidf_top_terms", "lm_score", "bm25_rank"))
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      val live = nodes.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e.id
      }.distinct.size
      val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
      val gens = nodes.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g.id
      }.distinct.size
      val scans = nodes.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.id
      }.distinct.size
      println(s"[reuse] $q: liveShuffles=$live reusedExchanges=$reused " +
        s"liveGenerates=$gens liveScans=$scans")
    }
    spark.stop()
  }
}
