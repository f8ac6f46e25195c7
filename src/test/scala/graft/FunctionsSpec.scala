package graft

import org.apache.spark.sql.SparkSessionExtensions
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

  test("GraftExtensions injects all three functions into a SparkSessionExtensions instance") {
    // structural: the injection itself must not throw (a second in-JVM
    // SparkContext can't be built to exercise the full builder path here);
    // array_dot, misra_gries, AND word_ngrams must all register so a
    // deployment via spark.sql.extensions gets the full function library
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }
}
