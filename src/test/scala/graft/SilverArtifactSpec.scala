package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.util.SilverArtifact

/** The stored-artifact contract (r10 verdict #1/#2 and the r10 ADVICE
  * fingerprint finding): an artifact is rebuilt exactly when its SOURCE
  * part files or its derivation logic change — never on a mere re-read,
  * and always on an in-place part-file rewrite that leaves the parent
  * directory entry untouched (the case `Files.size(dir)` missed). */
class SilverArtifactSpec extends AnyFunSuite {
  import TestSpark._

  private def freshRoots(): (String, String) = {
    val src = Files.createTempDirectory("silver-src").toString
    val store = Files.createTempDirectory("silver-store").toString
    (src, store)
  }

  private def writeSource(src: String, rows: Seq[Int]): Unit = {
    import spark.implicits._
    rows.toDF("x").coalesce(1).write.mode("overwrite").parquet(s"$src/t.parquet")
  }

  test("hit serves the store without invoking the build") {
    val (src, store) = freshRoots()
    writeSource(src, 1 to 10)
    var builds = 0
    def get() = {
      val fp = SilverArtifact.sourceFingerprint(s"$src/t.parquet", "spec-v1")
      SilverArtifact.getOrBuild(spark, s"$store/a", fp) {
        builds += 1; spark.read.parquet(s"$src/t.parquet")
      }
    }
    assert(get().count() == 10 && builds == 1)
    assert(get().count() == 10 && builds == 1) // second call: pure read
  }

  test("in-place part-file rewrite invalidates (directory entry unchanged)") {
    val (src, store) = freshRoots()
    writeSource(src, 1 to 10)
    def fp() = SilverArtifact.sourceFingerprint(s"$src/t.parquet", "spec-v1")
    val before = fp()
    // rewrite the part file CONTENT in place: same file count, same parent
    // dir, different bytes/mtime — the directory-level fingerprint the r10
    // ADVICE flagged would not see this
    val part = Files.list(Paths.get(s"$src/t.parquet")).iterator()
    val partFiles = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (part.hasNext) partFiles += part.next()
    writeSource(src, 1 to 25)
    assert(fp() != before)
    var builds = 0
    def get(f: String) =
      SilverArtifact.getOrBuild(spark, s"$store/a", f) {
        builds += 1; spark.read.parquet(s"$src/t.parquet")
      }
    assert(get(before).count() == 25 && builds == 1)
    assert(get(fp()).count() == 25 && builds == 2) // stale stamp → rebuild
    assert(get(fp()).count() == 25 && builds == 2)
  }

  test("logic-version change invalidates a byte-identical source") {
    val (src, store) = freshRoots()
    writeSource(src, 1 to 5)
    val f1 = SilverArtifact.sourceFingerprint(s"$src/t.parquet", "logic-v1")
    val f2 = SilverArtifact.sourceFingerprint(s"$src/t.parquet", "logic-v2")
    assert(f1 != f2)
    var builds = 0
    def get(f: String) =
      SilverArtifact.getOrBuild(spark, s"$store/a", f) {
        builds += 1; spark.read.parquet(s"$src/t.parquet")
      }
    get(f1); get(f1); get(f2)
    assert(builds == 2)
  }

  test("plan digest: derivation change rebuilds, unchanged derivation serves the store") {
    // the r11 verdict #2 contract: the logic component of a fingerprint is
    // a digest of the derivation's canonicalized plan — no hand-bumped
    // constant. Same derivation, rebuilt from scratch → same digest
    // (canonicalization normalizes expr ids); any semantic knob flip →
    // different digest → auto-orphaned artifact.
    import org.apache.spark.sql.functions.col
    val (src, store) = freshRoots()
    writeSource(src, 1 to 20)
    def derive(threshold: Int) =
      spark.read.parquet(s"$src/t.parquet").filter(col("x") > threshold)
    val d1a = SilverArtifact.planFingerprint(derive(5))
    val d1b = SilverArtifact.planFingerprint(derive(5))
    val d2 = SilverArtifact.planFingerprint(derive(7))
    assert(d1a == d1b, "identical derivations must digest identically")
    assert(d1a != d2, "a changed filter literal must change the digest")
    var builds = 0
    def get(df: org.apache.spark.sql.DataFrame) =
      SilverArtifact.getOrBuild(spark, s"$store/a",
        SilverArtifact.sourceFingerprint(s"$src/t.parquet",
          SilverArtifact.planFingerprint(df)))({ builds += 1; df })
    assert(get(derive(5)).count() == 15 && builds == 1)
    assert(get(derive(5)).count() == 15 && builds == 1) // unchanged: stored copy
    assert(get(derive(7)).count() == 13 && builds == 2) // knob flip: rebuild
    assert(get(derive(7)).count() == 13 && builds == 2)
  }

  test("plan digest scrubs per-JVM exprId UUIDs (cross-session stability)") {
    // canonicalized.toJSON embeds ExprId.jvmId, a random UUID minted per
    // JVM — without the scrub every session computed a fresh digest and
    // every stored gold artifact missed (caught by hit/miss stderr lines,
    // invisible to single-JVM tests). The scrub must equate two dumps
    // differing only in that UUID and leave everything else significant.
    def doc(id: String) =
      s"""{"class":"Alias","exprId":{"id":7,"jvmId":"$id"},"child":[{"num-children":0}]}"""
    val a = SilverArtifact.scrubJvmIds(doc("4b8cb9f9-e5f8-43ad-8de8-8b06ee67523f"))
    val b = SilverArtifact.scrubJvmIds(doc("d6382089-78b8-4bd2-a361-4380b1dfd2f6"))
    assert(a == b, "jvmId-only differences must scrub to identical text")
    assert(a.contains("\"id\":7"), "the canonicalized exprId NUMBER must survive")
    assert(SilverArtifact.scrubJvmIds(doc("x").replace("7", "8")) !=
      SilverArtifact.scrubJvmIds(doc("x")),
      "non-jvmId differences must remain significant")
  }

  test("plan digest covers input files: an upstream republish cascades downstream") {
    // the review finding on the first cut: plan TEXT renders a file
    // relation as just "parquet" — no paths — so a dim artifact rebuilt
    // to a new version directory under an unchanged fact plan would NOT
    // have changed the fact's digest. The file-list component is what
    // makes the cascade real.
    import org.apache.spark.sql.functions.col
    val (src, _) = freshRoots()
    writeSource(src, 1 to 10)
    import spark.implicits._
    (1 to 10).toDF("x").coalesce(1).write.mode("overwrite")
      .parquet(s"$src/t2.parquet")
    def derive(path: String) =
      spark.read.parquet(path).filter(col("x") > 5)
    val d1 = SilverArtifact.planFingerprint(derive(s"$src/t.parquet"))
    val d2 = SilverArtifact.planFingerprint(derive(s"$src/t2.parquet"))
    assert(d1 != d2,
      "identical plan over a different input directory must digest differently")
  }

  test("plan digest is not blind past the toString truncation width") {
    // toString elides columns past spark.sql.debug.maxToStringFields
    // (default 25) — a change confined to column 30 of a wide projection
    // must still change the digest (the toJSON serialization is what
    // guarantees it)
    import org.apache.spark.sql.functions.{col, lit}
    val (src, _) = freshRoots()
    writeSource(src, 1 to 5)
    def wide(knob: Int) = {
      val cols = (0 until 30).map {
        case 28 => (col("x") * knob).as("c28")
        case i  => (col("x") + lit(i)).as(s"c$i")
      }
      spark.read.parquet(s"$src/t.parquet").select(cols: _*)
    }
    assert(SilverArtifact.planFingerprint(wide(2)) !=
      SilverArtifact.planFingerprint(wide(3)),
      "a change in an elided-by-toString column must still change the digest")
    assert(SilverArtifact.planFingerprint(wide(2)) ==
      SilverArtifact.planFingerprint(wide(2)))
  }

  test("racing getOrBuild callers both land on a consistent published artifact") {
    val (src, store) = freshRoots()
    writeSource(src, 1 to 50)
    val fp = SilverArtifact.sourceFingerprint(s"$src/t.parquet", "race-v1")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var err: Throwable = null
    def get() =
      SilverArtifact.getOrBuild(spark, s"$store/a", fp) {
        builds.incrementAndGet()
        spark.read.parquet(s"$src/t.parquet")
      }
    val threads = (1 to 4).map(_ => new Thread(() =>
      try { assert(get().count() == 50) }
      catch { case t: Throwable => err = t }))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(err == null, s"racing reader failed: $err")
    // the per-base build lock + double-checked fingerprint collapse the
    // racing misses to ONE build; subsequent calls are pure hits
    assert(builds.get() == 1, s"racing misses built ${builds.get()} times")
    assert(get().count() == 50 && builds.get() == 1)
  }

  test("single-file parquet sources fingerprint without error") {
    val (src, _) = freshRoots()
    writeSource(src, 1 to 3)
    // promote the part file to a bare single-file table like the testdata
    val part = Files.list(Paths.get(s"$src/t.parquet")).iterator()
    var single: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) single = p
    }
    val dst = Paths.get(src, "single.parquet")
    Files.copy(single, dst)
    val fp = SilverArtifact.sourceFingerprint(dst.toString, "v1")
    assert(fp.contains("files=1"))
  }
}
