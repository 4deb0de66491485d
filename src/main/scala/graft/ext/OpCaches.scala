package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of operator-internal caches.
  *
  * Several operators persist a small intermediate across multiple
  * actions (a support table feeding a guard count, split points, and
  * the final reduction — the agg over the corpus must run ONCE). The
  * returned frames are lazy and still read the cache, so the operator
  * itself cannot unpersist before returning without re-running the
  * corpus pass on the caller's action. MEMORY_ONLY keeps the blocks
  * LRU-evictable (recompute is exact — every operator is integer/
  * decimal arithmetic, so an evicted block reproduces bit-for-bit),
  * but the BLOCK-MANAGER ENTRIES still accumulate over a long session:
  * each stays registered until unpersisted, and `getPersistentRDDs` /
  * the storage UI fill with dead entries.
  *
  * [[pin]] is the drop-in replacement for those bare `.persist` calls:
  * same storage level, plus registration here. [[release]] then lets a
  * long-running session (a notebook, a service loop) deterministically
  * drop every operator cache between units of work — non-blocking,
  * safe at ANY time for the exactness reason above.
  *
  * Retention: the registry holds the frame strongly between pin and
  * release — no NEW retention while the cache entry exists, because
  * Spark's CacheManager already holds the cached plan strongly for as
  * long as it does (that is precisely the leak being managed). Frames
  * someone ELSE uncached (`spark.catalog.clearCache()` between bench
  * queries, an inline unpersist) are pruned on every [[pin]] as well
  * as on [[release]], so the registry is bounded by the number of
  * LIVE caches even in sessions that never call release().
  */
object OpCaches {

  private val reg =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Drop entries whose cache no longer exists — their plans must not
    * outlive the block-manager entries they were registered for.
    */
  private def prune(): Unit = {
    val it = reg.iterator()
    while (it.hasNext)
      if (it.next().storageLevel == StorageLevel.NONE) it.remove()
  }

  private def register(df: DataFrame, level: StorageLevel): DataFrame = {
    prune()
    df.persist(level)
    reg.add(df)
    df
  }

  /** Persist MEMORY_ONLY and register for deterministic release — the
    * default for small support tables whose recompute is one exact
    * agg pass (LRU eviction is cheap to repair).
    */
  def pin(df: DataFrame): DataFrame =
    register(df, StorageLevel.MEMORY_ONLY)

  /** Persist MEMORY_AND_DISK and register — for intermediates whose
    * recompute is a corpus-scale BUILD (setSimJoin's ranked prefixes:
    * shingle join + groupBy + sort, consumed 3-4× by aliased
    * self-join sides): spilling to local disk beats re-running the
    * build, so eviction-to-disk is the right degradation.
    */
  def pinDisk(df: DataFrame): DataFrame =
    register(df, StorageLevel.MEMORY_AND_DISK)

  /** Non-blocking unpersist of every still-cached registered frame;
    * always empties the registry. Returns how many frames were
    * actually unpersisted.
    */
  def release(): Int = {
    var n = 0
    val it = reg.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (df.storageLevel != StorageLevel.NONE) {
        df.unpersist(blocking = false)
        n += 1
      }
      it.remove()
    }
    n
  }

  /** Currently registered (pinned, not yet released) frames.
    * Diagnostic only.
    */
  def registered: Int = reg.size()
}
