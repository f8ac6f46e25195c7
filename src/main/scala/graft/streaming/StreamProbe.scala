package graft.streaming

import org.apache.spark.sql.SparkSession

/** Builder probe for the MULTI-TRIGGER streaming floor (r15 verdict #4):
  * runs [[EventsStream.sessionWindowAppend]] — the production Append-mode
  * twin of the `stream_session_window` gate — so the per-trigger state
  * metrics show watermark expiry actually EVICTING closed sessions
  * between triggers. Use with the arrival knobs:
  * {{{
  *   SPARK_GRAFT_STREAM_SPLIT=20 SPARK_GRAFT_STREAM_PROFILE=1 \
  *     SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.streaming.StreamProbe /tmp/graft_sf100"
  * }}}
  * The gates themselves are driven multi-trigger through graft.TimeOne
  * with the same env vars — this main exists only for the Append-mode
  * variant, which is not a gate (Append holds back the final watermark's
  * tail sessions, so it cannot share the batch oracle). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = EventsStream.sessionWindowAppend(spark, sfDir).count()
    val t = (System.nanoTime() - t0) / 1e9
    println(f"[stream-probe] session_window_append: $n emitted sessions in $t%.3f s " +
      s"(split=${sys.env.getOrElse("SPARK_GRAFT_STREAM_SPLIT", "1")})")
    spark.stop()
  }
}
