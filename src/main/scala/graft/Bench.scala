package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup = the ETL phase: materialize the gold star schema once, the
    // way the reference separates ETL wall-time (etl_lakehouse.py:139-147)
    // from per-query latency measured on the already-built gold zone
    // (test_queries.py:132-144). Reported separately, not hidden.
    val w0 = System.nanoTime()
    try {
      graft.pipeline.Medallion.factSales(spark, sfDir).count()
      graft.pipeline.Medallion.dimPart(spark, sfDir).count()
    } catch { case _: Throwable => () }
    val warmup = (System.nanoTime() - w0) / 1e9
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def timeAll(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        // a failed query must not masquerade as a fast one
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // three passes, report the per-query MEDIAN: this host's per-query
    // noise reaches 4× (identical-code totals measured 56.9-94.2s across
    // back-to-back runs — NOTES.md), so min-of-2 still mixed one outlier
    // pass into cross-round deltas; the median of 3 is robust to a single
    // slow AND a single anomalously fast pass (pass count in the JSON)
    val passes = Seq(timeAll(), timeAll(), timeAll())
    val results = passes.head.keys.map { k =>
      k -> passes.map(_(k)).sorted.apply(1)
    }.toMap
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    def r3(v: Double): String = java.math.BigDecimal.valueOf(v)
      .setScale(3, java.math.RoundingMode.HALF_UP).toPlainString
    def entries(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","warmup_etl_sec":${r3(warmup)},"passes":3,"failed":$fl,"queries":${entries(results.toSeq)},"sf":"$sfDir"}"""
    // The harness that collects this output keeps only a ~2000-char tail of
    // stdout, and the full per-query map overflows it — the JSON line must
    // stay short enough to survive the tail capture INTACT. Print a line
    // capped at ~1600 chars: keep the slowest queries (the ones that matter
    // for a perf read), elide the fastest, record how many were elided. The
    // complete map is persisted to bench_out.json below either way.
    val budget = 1600
    val stdoutJson =
      if (json.length <= budget) json
      else {
        val bySlowest = results.toSeq.sortBy(-_._2)
        var kept = bySlowest
        var line = json
        while (line.length > budget && kept.nonEmpty) {
          kept = kept.dropRight(math.max(1, kept.size / 8))
          line = s"""{"metric":"total","value":${r3(total)},"unit":"sec","warmup_etl_sec":${r3(warmup)},"passes":3,"failed":$fl,"queries_total":${results.size},"queries_elided":${results.size - kept.size},"queries":${entries(kept)},"sf":"$sfDir"}"""
        }
        line
      }
    println(stdoutJson)
    // stdout tail-capture can truncate the (long) JSON line — persist it to
    // a file as well so the numbers are always machine-readable. Best-effort:
    // a read-only CWD must not fail the bench after valid results printed.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")).toAbsolutePath
      java.nio.file.Files.writeString(out, json + "\n")
    } catch { case scala.util.control.NonFatal(e) =>
      // IOException AND e.g. InvalidPathException from a malformed env
      // override — nothing here may fail the bench after results printed
      System.err.println(s"[bench] could not persist bench_out.json: ${e.getMessage}")
    } finally spark.stop()
  }
}
