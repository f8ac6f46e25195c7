package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for named queries to one file each —
  * the optimization-round evidence trail (`plans/r17/<q>_before.txt` /
  * `_after.txt`):
  * {{{
  *   sbt "runMain graft.ExplainDump /root/testdata/sf0.1 plans/r17 before q1,q2"
  *   sbt "runMain graft.ExplainDump /root/testdata/sf0.1 plans/r17 after  all"
  * }}}
  * Query list is comma-separated exact names, or `all` for every declared
  * query. Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus) so the dumped plans match what the bench runs. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ExplainDump <sfDir> <outDir> <suffix> <q1,q2|all>")
    val Array(sfDir, outDir, suffix, qlist) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // mirror Bench's planner-affecting confs (r17 review finding: a
      // session drift here would dump a different physical join operator
      // than the benchmark actually runs, invalidating plan evidence)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (qlist == "all") SparkEntry.queries.keys.toSeq.sorted
      else qlist.split(",").toSeq
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${name}_$suffix.txt"), txt)
      System.err.println(s"[explain] $name -> ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
