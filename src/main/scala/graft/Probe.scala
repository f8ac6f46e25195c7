package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement probe for the optimization round — NOT part of the
  * declared query surface. Times the components of the per-query constant
  * floor: parquet resolution (listing + footer schema), planning, and the
  * execute of a trivial aggregate, with fresh vs reused table plans. */
object Probe {
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
    def t[A](label: String, n: Int = 5)(f: => A): Unit = {
      f // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"[probe] $label%-48s min=${ts.min}%8.1f ms  med=${ts.sorted.apply(n / 2)}%8.1f ms")
    }
    // 1. resolution cost: spark.read.parquet on a single-file table
    t("read.parquet(lineitem) resolution") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
    }
    t("read.parquet(nation) resolution") {
      spark.read.parquet(s"$sfDir/nation.parquet")
    }
    // 2. trivial agg, fresh read each time (the bench shape)
    t("fresh read + agg(min,max).count") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(min("l_shipdate"), max("l_shipdate")).count()
    }
    // 3. same but table resolved once
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("reused df + agg(min,max).count") {
      li.agg(min("l_shipdate"), max("l_shipdate")).count()
    }
    // 4. pure job dispatch: empty-ish range count
    t("spark.range(32).count (job floor)") { spark.range(0, 32, 1, 32).count() }
    t("spark.range local 1-part count") { spark.range(0, 1, 1, 1).count() }
    // 5. one shuffle of tiny data at 32 partitions vs 4
    t("tiny groupBy 32 shuffle parts") {
      li.groupBy("l_returnflag").count().count()
    }
    val s4 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "4")
    val li4 = s4.read.parquet(s"$sfDir/lineitem.parquet")
    t("tiny groupBy 4 shuffle parts") {
      li4.groupBy("l_returnflag").count().count()
    }
    // 6. a real mid-tier query hot, for reference
    t("q1_sales_per_month hot", 3) {
      SparkEntry.queries("q1_sales_per_month")(spark, sfDir).count()
    }
    spark.stop()
  }
}
