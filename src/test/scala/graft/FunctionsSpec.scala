package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, GraftFunctions}

class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

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

  test("GraftExtensions injects array_dot into a SparkSessionExtensions instance") {
    // structural: the injection itself must not throw (a second in-JVM
    // SparkContext can't be built to exercise the full builder path here)
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }
}
