package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.SessionCaches

/** The session-memo contract (util/SessionCaches): hits don't rebuild,
  * clear() evicts + unpersists, and correctness never depends on a memo
  * hit — ops recompute identically after eviction. */
class SessionCachesSpec extends AnyFunSuite {
  import TestSpark._

  test("memo hits, clear evicts this session's entries, rebuild works") {
    val m = SessionCaches.memo[(org.apache.spark.sql.SparkSession, String)]("spec.synthetic")
    var builds = 0
    def get() = m.getOrElseUpdate((spark, "x"), {
      builds += 1
      spark.range(3).toDF().persist()
    })
    val df = get(); get()
    assert(builds == 1, "second lookup must hit the memo")
    assert(SessionCaches.clear(spark) >= 1, "clear must report the eviction")
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clear must unpersist the cached DataFrame")
    get()
    assert(builds == 2, "post-clear lookup must rebuild")
  }

  test("a memoized op recomputes correctly after clear (no hidden state)") {
    val before = graft.ops.GraphOps.undirectedEdges(spark, sf)
      .orderBy("u", "v").collect().toSeq
    SessionCaches.clear(spark)
    val after = graft.ops.GraphOps.undirectedEdges(spark, sf)
      .orderBy("u", "v").collect().toSeq
    assert(before == after)
  }
}
