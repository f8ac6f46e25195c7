package graft
import org.apache.spark.sql.SparkSession
/** Scratch: prove AQE runtime exchange reuse for the restructured queries. */
object ProbeReuse {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("tfidf_top_terms", "lm_score", "bm25_rank")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val shuffles = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
      println(s"[reuse] $q: ReusedExchange=$reused liveExchanges=$shuffles final=${plan.contains("isFinalPlan=true")}")
      if (q == "tfidf_top_terms") println(plan.linesIterator.take(45).mkString("\n"))
    }
    spark.stop()
  }
}
