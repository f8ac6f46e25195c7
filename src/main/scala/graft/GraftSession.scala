package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession entry point for the engine — the one-stop builder a
  * library user calls instead of hand-assembling configs.
  *
  * Defaults encode the deployment guidance that recurs in this codebase's
  * scaladoc: shuffle partitions sized to the cluster (NOT the 200 default —
  * match cores locally, 2-3× total cores on a cluster), AQE on (runtime
  * coalescing + skew-join splitting), UTC session time zone (oracle/date
  * parity), and the graft expression library registered for SQL use.
  */
object GraftSession {

  def builder(master: String = s"local[${Runtime.getRuntime.availableProcessors}]",
    shufflePartitions: Option[Int] = None,
    appName: String = "graft"): SparkSession.Builder = {
    val parts = shufflePartitions.getOrElse(
      if (master.startsWith("local")) Runtime.getRuntime.availableProcessors else 200)
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", classOf[graft.functions.GraftExtensions].getName)
  }

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }
}
