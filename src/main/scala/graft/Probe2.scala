package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for the sparse-retrieval family (opt r17)
  * — NOT part of the declared query surface. */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String, n: Int = 3)(f: => A): Unit = {
      f // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe2] $label%-44s min=${ts.min}%8.1f ms med=${ts.sorted.apply(n / 2)}%8.1f ms")
    }
    val w = graft.ops.TextOps.sparseWeights(spark, sfDir)
    t("sparseWeights.count (cached)") { w.count() }
    println(s"[probe2] weights rows: ${w.count()}")
    val qids = w.select("doc_id").where(col("doc_id") % 100 === 0).distinct()
      .withColumn("__ord", md5(col("doc_id").cast("string")))
      .orderBy(col("__ord"), col("doc_id"))
      .limit(graft.ops.TextOps.SparseQueryBudget)
      .select("doc_id")
    t("qids (collect)") { qids.collect() }
    val qw = w.join(broadcast(qids), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("query_id"), col("tok"), col("wt").as("qwt"))
    t("qw.count") { qw.count() }
    val joined = w.join(broadcast(qw), "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("qwt * wt")).as("score"))
    t("probe join+agg (noop count)") { joined.count() }
    println(s"[probe2] joined rows: ${joined.count()}")
    t("full sparse_retrieval") {
      graft.ops.TextOps.sparseRetrieval(spark, sfDir).count()
    }
    t("knn dense side (artifact read)") {
      graft.ops.Similarity.knnGraph(spark, sfDir, 3)
        .filter(col("vec_a") % 100 === 0).count()
    }
    t("full rrf_fusion") {
      SparkEntry.queries("rrf_fusion")(spark, sfDir).count()
    }
    spark.stop()
  }
}
