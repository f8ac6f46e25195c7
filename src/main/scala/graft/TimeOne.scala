package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness for perf iteration:
  * {{{
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.TimeOne text_top_bigrams /root/testdata/sf0.1"
  * }}}
  * Runs the query once to warm (plan/caches/JIT), then 3 timed passes,
  * printing each pass and the min — the steady-state latency the bench's
  * min-of-2 approximates. Keeps perf experiments out of the full bench's
  * 4-minute loop. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    fn(spark, sfDir).count() // warm
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name pass $i: $t%.3f s")
      t
    }
    println(f"[timeone] $name min: ${times.min}%.3f s")
    spark.stop()
  }
}
