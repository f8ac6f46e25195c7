package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  test("word_ngrams generator: counts, edges, nulls, and slice equivalence") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // a k-word string yields k-n+1 n-grams in order
    val r = spark.sql("SELECT word_ngrams('a b c d', 3) AS ngram").as[String].collect()
    assert(r.sameElements(Array("a b c", "b c d")))
    // shorter than n → no rows; NULL input → no rows (explode-like)
    assert(spark.sql("SELECT word_ngrams('a b', 3)").count() == 0)
    assert(spark.sql("SELECT word_ngrams(CAST(NULL AS STRING), 3)").count() == 0)
    // equivalence with the declarative slice formulation on real data
    val docs = Tables.documents(spark, sf)
    val viaUdtf = docs.selectExpr("word_ngrams(text, 2) AS g")
      .groupBy("g").count()
    val viaSlice = docs
      .selectExpr("split(text, ' ') AS ws")
      .selectExpr("explode(sequence(0, size(ws) - 2)) AS i", "ws")
      .selectExpr("concat_ws(' ', slice(ws, i + 1, 2)) AS g")
      .groupBy("g").count()
    assert(viaUdtf.exceptAll(viaSlice).isEmpty && viaSlice.exceptAll(viaUdtf).isEmpty)
    // non-literal n is rejected at analysis, not silently computed
    val err = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c', CAST(rand() * 3 AS INT))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("array_dot works from pure SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    assert(spark.sql("SELECT array_dot(NULL, array(1.0d)) AS d").head().isNullAt(0))
    // type check rejects non-double arrays with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT array_dot(array('x'), array(1.0d))").collect()
    }
    assert(err.getMessage.contains("array<double>"))
  }

  test("pq kernels match hand-computed codes, tables, and ADC distances") {
    GraftFunctions.register(spark)
    // 2 subspaces × 2 centroids × 2 dims; codebook flat subspace-major:
    // m0: c0=(0,0) c1=(10,10); m1: c0=(5,5) c1=(0,0)
    val row = spark.sql(
      """SELECT pq_encode(array(9L,9L,1L,1L), array(0L,0L,10L,10L,5L,5L,0L,0L), 2, 2, 2) AS codes,
        |       pq_table(array(9L,9L,1L,1L),  array(0L,0L,10L,10L,5L,5L,0L,0L), 2, 2, 2) AS qtab,
        |       pq_adc(array(3L,7L,2L,9L), array(1, 0), 2, 2) AS adist""".stripMargin)
      .head()
    // m0: |(9,9)-(0,0)|²=162 vs |(9,9)-(10,10)|²=2 → code 1
    // m1: |(1,1)-(5,5)|²=32 vs |(1,1)-(0,0)|²=2 → code 1
    assert(row.getSeq[Int](0) == Seq(1, 1))
    assert(row.getSeq[Long](1) == Seq(162L, 2L, 32L, 2L))
    assert(row.getLong(2) == 7L + 2L) // qtab[m0][c1] + qtab[m1][c0]
    // tie goes to the LOWEST centroid index (both engines' contract)
    val tie = spark.sql(
      "SELECT pq_encode(array(5L), array(4L, 6L), 1, 2, 1) AS codes").head()
    assert(tie.getSeq[Int](0) == Seq(0), "equidistant must pick centroid 0")
  }

  test("SQL-registered aggregates reject wrong input types at analysis") {
    // without checkInputDataTypes these passed analysis and died with a
    // per-task ClassCastException on executors (review finding)
    GraftFunctions.register(spark)
    val e1 = intercept[Exception] {
      spark.sql("SELECT misra_gries(id, 4) FROM range(10)").collect()
    }
    assert(e1.getMessage.contains("string column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_min(CAST(id AS INT), id, 3) FROM range(10)").collect()
    }
    assert(e2.getMessage.contains("bigint"), e2.getMessage)
    // a foldable NULL n used to NPE at first eval instead of failing analysis
    val e3 = intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c', CAST(NULL AS INT))").collect()
    }
    assert(e3.getMessage.contains("non-null literal"), e3.getMessage)
  }

  test("pq kernels reject malformed geometry instead of reading garbage") {
    GraftFunctions.register(spark)
    // codes array shorter than m: UnsafeArrayData would read adjacent
    // memory and return a silently-wrong distance without the guard
    val e1 = intercept[Exception] {
      spark.sql("SELECT pq_adc(array(1L,2L,3L,4L), array(0), 2, 2)").collect()
    }
    assert(e1.getMessage.contains("codes"), e1.getMessage)
    // out-of-range code: would index another subspace's slot
    val e2 = intercept[Exception] {
      spark.sql("SELECT pq_adc(array(1L,2L,3L,4L), array(0, 3), 2, 2)").collect()
    }
    assert(e2.getMessage.contains("out of range"), e2.getMessage)
    // undersized codebook for pq_encode
    val e3 = intercept[Exception] {
      spark.sql("SELECT pq_encode(array(1L,2L), array(0L,0L), 2, 2, 1)").collect()
    }
    assert(e3.getMessage.contains("codebook"), e3.getMessage)
  }

  test("topk_min keeps the K smallest (dist, id) pairs in rank order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 5L), (1L, 11L, 3L), (1L, 12L, 3L), (1L, 13L, 9L), (1L, 14L, 1L),
      (2L, 20L, 7L)).toDF("g", "id", "d")
    val got = rows.groupBy("g")
      .agg(call_function("topk_min", col("d"), col("id"), lit(3)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.id"), col("col.dist"))
      .orderBy("g", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    // group 1: (1,14) then ties d=3 resolve by id asc: (3,11), (3,12)
    assert(got == Seq(
      (1L, 0, 14L, 1L), (1L, 1, 11L, 3L), (1L, 2, 12L, 3L),
      (2L, 0, 20L, 7L)))
    // equivalence with the window formulation on real data
    val base = Tables.lineitem(spark, sf)
      .groupBy("l_suppkey", "l_partkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val viaAgg = base.groupBy("l_suppkey")
      .agg(call_function("topk_min", col("q"), col("l_partkey"), lit(3)).as("top"))
      .select(col("l_suppkey"), posexplode(col("top")))
      .select(col("l_suppkey"), col("col.id").as("l_partkey"), col("col.dist").as("q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey").orderBy(asc("q"), asc("l_partkey"))
    val viaWindow = base
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("l_suppkey", "l_partkey", "q")
    assert(viaAgg.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("GraftExtensions injects all three functions into a SparkSessionExtensions instance") {
    // structural: the injection itself must not throw (a second in-JVM
    // SparkContext can't be built to exercise the full builder path here);
    // array_dot, misra_gries, AND word_ngrams must all register so a
    // deployment via spark.sql.extensions gets the full function library
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }

  test("nfc_normalize composes decomposed sequences (codegen path, via SQL)") {
    GraftFunctions.register(spark)
    // decomposed e-acute built from explicit UTF-8 bytes (editor-proof):
    // 'e' + COMBINING ACUTE U+0301 = bytes CC 81; composed form = C3 A9
    val nfd = "'e' || decode(unhex('CC81'), 'UTF-8')"
    val nfc = "decode(unhex('C3A9'), 'UTF-8')"
    val r = spark.sql(
      s"SELECT nfc_normalize($nfd) = $nfc AS composed, length($nfd) AS raw, " +
        s"length(nfc_normalize($nfd)) AS n").head()
    assert(r.getBoolean(0) && r.getInt(1) == 2 && r.getInt(2) == 1)
    // idempotent; ASCII is a no-op; NULL propagates
    assert(spark.sql(
      s"SELECT nfc_normalize(nfc_normalize($nfd)) = nfc_normalize($nfd)").head().getBoolean(0))
    assert(spark.sql("SELECT nfc_normalize('plain ascii')").head().getString(0) == "plain ascii")
    assert(spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))").head().isNullAt(0))
    // the normalized twin of a decomposed text hash-collides with the
    // precomposed original -- the dedup failure mode the op exists for
    assert(spark.sql(
      s"SELECT md5(nfc_normalize('caf' || $nfd)) = md5('caf' || $nfc)").head().getBoolean(0))
    // a non-string argument is an analysis error, not a runtime surprise
    val err = intercept[Exception](spark.sql("SELECT nfc_normalize(42)").collect())
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("register fails loudly when a foreign implementation squats a graft name") {
    // isolated session state: the foreign registration must not leak into
    // the suite-shared session's registry
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot",
      _ => org.apache.spark.sql.catalyst.expressions.Literal(1), "built-in")
    val err = intercept[IllegalStateException] { GraftFunctions.register(s2) }
    assert(err.getMessage.contains("array_dot") &&
      err.getMessage.contains("foreign"),
      s"must name the colliding function and the refusal: ${err.getMessage}")
  }

  test("register is idempotent over its own prior registrations") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    GraftFunctions.register(s2) // ours already present: keep, don't throw
    assert(s2.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) == 11.0)
  }
}
