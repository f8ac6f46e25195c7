package graft

import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Scala-side pin of tools/verify_local.py's DETERMINISTIC_OK allowlist
  * (r10 verdict "wrong" #3): those six queries' fractional float output
  * columns are exempt from the tolerance-headroom audit ONLY because each
  * is built from exact-integer aggregation plus one final division — a
  * construction with zero summation-order freedom. Until now that
  * invariant lived in a Python comment; this spec enforces it on the
  * ANALYZED PLANS: no Sum over a fractional (double/float) child may
  * appear anywhere in an allowlisted query. (Average over double is a
  * different contract — its outputs are magnitude-exempt in the audit,
  * not allowlisted — but the two allowlisted queries that aggregate
  * money keep even their averages off fractional sums where the values
  * reach summation-order territory; the magnitude exemption covers the
  * rest.) Referenced from tools/verify_local.py next to the allowlist. */
class DeterministicMoneySpec extends AnyFunSuite {
  import TestSpark._

  private val Allowlisted = Seq(
    "q1_sales_per_month",
    "q4_sales_by_nation",
    "tpch_pricing_summary",
    "tpch_small_quantity",
    "mom_growth_movers",
    "ols_trend")

  private def fractionalSums(p: LogicalPlan): Seq[String] =
    p.collect { case a: Aggregate => a }.flatMap(_.aggregateExpressions.flatMap(
      _.collect {
        case s: Sum if s.child.dataType == DoubleType ||
            s.child.dataType == FloatType =>
          s"sum(${s.child.sql}: ${s.child.dataType.simpleString})"
      }))

  Allowlisted.foreach { name =>
    test(s"$name carries no Sum over a fractional column (allowlist invariant)") {
      val df = SparkEntry.queries(name)(spark, sf)
      val bad = fractionalSums(df.queryExecution.analyzed)
      assert(bad.isEmpty,
        s"$name is DETERMINISTIC_OK-allowlisted but its plan sums fractional " +
          s"floats (summation-order nondeterminism): ${bad.mkString(", ")}")
    }
  }

  test("the allowlist names match tools/verify_local.py") {
    // keep the two sites in lockstep: a rename or addition on the Python
    // side must show up here (and get its plan checked) too
    val py = java.nio.file.Files.readString(
      java.nio.file.Paths.get("tools/verify_local.py"))
    Allowlisted.foreach { n =>
      assert(py.contains("\"" + n + "\""),
        s"$n is checked here but absent from verify_local.py's DETERMINISTIC_OK")
    }
    val listed = "\"([a-z0-9_]+)\": \\{".r.findAllMatchIn(py).map(_.group(1)).toSet
    assert(listed == Allowlisted.toSet,
      s"verify_local.py allowlists ${listed -- Allowlisted.toSet} that this spec does not check")
  }
}
