package graft.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE place the session-lifetime memo contract is stated (r6 ADVICE:
  * the per-op TrieMap caches — shingles, grams, k-NN edges, gold tables,
  * BPE merges… — each restated "lives for the JVM" locally and nothing
  * offered eviction).
  *
  * Contract: a memo entry is keyed by the owning [[SparkSession]]
  * INSTANCE (reference identity — a hash would let a new session collide
  * into a DataFrame bound to a stopped one) plus the op's parameters, and
  * lives until either (a) the JVM exits — the batch-job case, where the
  * memo is the in-session analog of the stored artifact (shingle table,
  * ANN index, gold zone) a 100 TB pipeline would write once per corpus
  * version — or (b) [[SessionCaches.clear]] is called for that session —
  * the long-lived-notebook case the r6 ADVICE flagged: a server iterating
  * many datasets or parameter values would otherwise accumulate pinned
  * MEMORY_AND_DISK DataFrames for the JVM lifetime. `clear` drops every
  * entry owned by the session and unpersists cached DataFrames; the next
  * call simply recomputes (correctness never depends on a memo hit —
  * specs re-run ops after clearing to prove it).
  */
object SessionCaches {

  private val registry = TrieMap[String, (Memo[_], Class[_])]()

  /** A named memo whose key's FIRST element must be the owning
    * SparkSession; values that are DataFrames are unpersisted on evict. */
  final class Memo[K <: Product] private[SessionCaches] () {
    private val m = TrieMap[K, Any]()
    private val buildLocks = TrieMap[K, Object]()
    /** First-touch is guarded by a PER-KEY lock: TrieMap's own
      * getOrElseUpdate may evaluate the builder on BOTH of two racing
      * threads and silently drop one result — and a dropped
      * MEMORY_AND_DISK-persisted DataFrame would stay pinned for the JVM
      * lifetime (r7 ADVICE). Per-key (not per-memo) because some builders
      * are NOT cheap plan construction — the gold-zone memo runs a
      * SilverArtifact publish (real write jobs) on a store miss, and a
      * single memo-wide monitor would serialize writeAll's concurrently
      * staged gold builds one behind another (review finding). Distinct
      * keys build in parallel; racing callers of the SAME key collapse to
      * one build; hits stay lock-free. Lock identity comes from TrieMap's
      * atomic putIfAbsent-style getOrElseUpdate, so both racers see one
      * winner object. */
    def getOrElseUpdate[V](k: K, v: => V): V =
      m.get(k) match {
        case Some(x) => x.asInstanceOf[V]
        case None =>
          val lock = buildLocks.getOrElseUpdate(k, new Object)
          lock.synchronized {
            m.get(k) match {
              case Some(x) => x.asInstanceOf[V]
              case None =>
                val built = v
                m.put(k, built)
                built
            }
          }
      }
    private[SessionCaches] def evict(s: SparkSession): Int = {
      var n = 0
      m.keys.foreach { k =>
        if (k.productElement(0).asInstanceOf[AnyRef] eq s)
          m.remove(k).foreach { v =>
            v match { case df: DataFrame => df.unpersist(); case _ => () }
            // the build lock is deliberately NOT removed: a racer already
            // inside lock.synchronized would otherwise be invisible to a
            // post-evict caller minting a fresh lock, and the two would
            // double-build (re-opening the dropped-persisted-DataFrame
            // leak the lock exists to prevent). Locks are bare Objects —
            // one per distinct key ever built, bounded and tiny.
            n += 1
          }
      }
      n
    }
  }

  /** Obtain (or create) the memo registered under `name`. Call once per
    * cache site into a `private val`; the name keys the global registry
    * so `clear` can reach every site. The key CLASS is recorded at first
    * registration and later callers must request the same one — two
    * sites accidentally sharing a name with different key arities would
    * otherwise ClassCastException deep inside a lookup (r7 ADVICE). */
  def memo[K <: Product](name: String)(implicit kt: scala.reflect.ClassTag[K]): Memo[K] = {
    val (m, cls) = registry.getOrElseUpdate(name, (new Memo[K](), kt.runtimeClass))
    require(cls == kt.runtimeClass,
      s"memo '$name' already registered with key ${cls.getName}, requested ${kt.runtimeClass.getName}")
    m.asInstanceOf[Memo[K]]
  }

  /** Evict every registered memo entry owned by `s` (unpersisting cached
    * DataFrames); returns the number of entries dropped. */
  def clear(s: SparkSession): Int =
    registry.values.foldLeft(0)(_ + _._1.evict(s))

  /** `persist(MEMORY_AND_DISK)` only when this plan is not ALREADY in the
    * CacheManager. The CacheManager is SHARED across `newSession()` clones
    * while the memos here key by session instance — so a memo on a clone
    * rebuilding a plan the parent session already cached would re-persist
    * it, pinning nothing new and logging a "Asked to cache already cached
    * data" WARN per occurrence. `Dataset.storageLevel` consults the shared
    * CacheManager by canonicalized plan, so the guard is exact. Use at
    * memo-lifetime persist sites; transient persist/unpersist pairs must
    * NOT use it (skipping their persist would make the paired unpersist
    * drop someone else's cache entry). */
  implicit final class PersistOnce[T](private val ds: org.apache.spark.sql.Dataset[T]) extends AnyVal {
    def persistOnce(): org.apache.spark.sql.Dataset[T] =
      if (ds.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else ds
  }
}
