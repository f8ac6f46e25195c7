package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.AtomicTable

/** Write-side CHECK constraints (AtomicTable.publishChecked): the oracle
  * gate (`constrained_write`) proves the refused-commit ANSWER; this spec
  * proves the enforcement mechanics — atomic refusal (pointer untouched,
  * staged directory discarded), exact per-constraint counts, and the
  * SQL-standard NULL semantics (only FALSE violates). */
class ConstraintPublishSpec extends AnyFunSuite {
  import TestSpark._

  private def freshBase(): String =
    Files.createTempDirectory("graft_checked").toString + "/t"

  private def versionDirs(base: String): Int = {
    val stream = Files.list(Paths.get(base))
    try stream.iterator().asScala.count(
      _.getFileName.toString.matches("_v\\d+"))
    finally stream.close()
  }

  test("violating publish is refused atomically: pointer unchanged, staged dir discarded, exact counts") {
    import spark.implicits._
    val base = freshBase()
    AtomicTable.publishChecked(Seq(1, 2, 3).toDF("x"), base,
      Map("pos" -> (col("x") > 0)))
    assert(AtomicTable.read(spark, base).count() == 3)
    val e = intercept[AtomicTable.ConstraintViolationException] {
      AtomicTable.publishChecked(Seq(1, -2, 3, -4, 0).toDF("x"), base,
        Map("pos" -> (col("x") > 0), "small" -> (col("x") < 100)))
    }
    // only violated constraints are reported, with exact row counts
    assert(e.counts == Map("pos" -> 3L))
    // the table is untouched: same rows, one version, no stranded staging
    assert(AtomicTable.read(spark, base).count() == 3)
    assert(AtomicTable.history(base).size == 1)
    assert(versionDirs(base) == 1,
      "the refused staged version directory must be discarded eagerly")
    // a subsequent clean publish commits normally
    AtomicTable.publishChecked(Seq(7, 8).toDF("x"), base,
      Map("pos" -> (col("x") > 0)))
    assert(AtomicTable.read(spark, base).count() == 2)
  }

  test("NULL constraint results pass (SQL CHECK: only FALSE violates)") {
    import spark.implicits._
    val base = freshBase()
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    AtomicTable.publishChecked(df, base, Map("pos" -> (col("x") > 0)))
    assert(AtomicTable.read(spark, base).count() == 3,
      "a NULL (unknown) check result must not count as a violation")
    // ... but an explicit NOT-NULL constraint still catches the row
    val e = intercept[AtomicTable.ConstraintViolationException] {
      AtomicTable.publishChecked(df, base + "2",
        Map("not_null" -> col("x").isNotNull))
    }
    assert(e.counts == Map("not_null" -> 1L))
  }

  test("an empty frame publishes: constraints are vacuously satisfied") {
    import spark.implicits._
    val base = freshBase()
    AtomicTable.publishChecked(Seq.empty[Int].toDF("x"), base,
      Map("pos" -> (col("x") > 0)))
    assert(AtomicTable.read(spark, base).count() == 0)
  }

  test("generated columns: absent computes, correct-supplied passes, wrong-supplied refused") {
    import spark.implicits._
    val gens = Map("y" -> (col("x") * 2))
    // absent → computed at write
    val base = freshBase()
    AtomicTable.publishGenerated(Seq(1, 2, 3).toDF("x"), base, gens)
    val got = AtomicTable.read(spark, base).orderBy("x")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == Seq((1, 2), (2, 4), (3, 6)))
    // supplied and consistent → verified, commits
    AtomicTable.publishGenerated(
      Seq((4, 8), (5, 10)).toDF("x", "y"), base, gens)
    assert(AtomicTable.read(spark, base).count() == 2)
    // supplied but disagreeing with the generator → refused, untouched
    val e = intercept[AtomicTable.ConstraintViolationException] {
      AtomicTable.publishGenerated(
        Seq((6, 12), (7, 99)).toDF("x", "y"), base, gens)
    }
    assert(e.counts == Map("generated_y" -> 1L))
    assert(AtomicTable.read(spark, base).count() == 2)
  }
}
