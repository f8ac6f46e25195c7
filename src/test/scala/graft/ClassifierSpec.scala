package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Classifier

/** Learning contract of the batch perceptron beyond the differential
  * gate's trajectory equality: on a linearly separable planted corpus it
  * actually LEARNS (misclassifications go to zero and stay there), and
  * the applied model's confusion matrix is consistent with the final
  * round's count. */
class ClassifierSpec extends AnyFunSuite {
  import TestSpark._

  /** A corpus whose label (English-stopword presence) is linearly
    * separable in the stopword-ppm feature by a wide margin: "english"
    * docs are stopword-dense prose, "other" docs are digit noise with
    * zero stopword hits. */
  private def plantedCorpus(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-clf").toString
    val en = (1 to 40).map(i =>
      (i.toLong, "the cat and the dog is in the house of it " * 5))
    val other = (41 to 80).map(i =>
      (i.toLong, s"111 222 333 444 555 666 777 888 999 $i " * 5))
    (en ++ other).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("separable planted corpus: misclassifications reach 0 and stay there") {
    val dir = plantedCorpus()
    val traj = Classifier.perceptronTrain(spark, dir)
      .orderBy("round").collect()
      .map(r => r.getInt(0) -> r.getLong(5))
    assert(traj.length == Classifier.Rounds)
    // round 1 starts from w=0 where EVERYTHING is misclassified (margin 0)
    assert(traj.head._2 == 80L, s"round 1 should see all 80 docs: ${traj.toSeq}")
    val converged = traj.dropWhile(_._2 != 0L)
    assert(converged.nonEmpty,
      s"never reached 0 misclassified on a separable corpus: ${traj.toSeq}")
    assert(converged.forall(_._2 == 0L),
      s"left the separating solution after converging: ${traj.toSeq}")
  }

  test("score confusion matrix is perfect on the separable corpus") {
    val dir = plantedCorpus()
    val conf = Classifier.perceptronScore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(conf.getOrElse((1L, 1L), 0L) == 40L &&
      conf.getOrElse((-1L, -1L), 0L) == 40L &&
      !conf.contains((1L, -1L)) && !conf.contains((-1L, 1L)),
      s"expected a diagonal confusion matrix: $conf")
  }
}
