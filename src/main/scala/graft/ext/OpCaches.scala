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
  * release — no NEW retention, because Spark's CacheManager already
  * holds the cached plan strongly for as long as the cache exists
  * (that is precisely the leak being managed). A frame someone else
  * uncached in the meantime (`spark.catalog.clearCache()`, an inline
  * unpersist) is simply dropped from the registry at the next release.
  */
object OpCaches {

  private val reg =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  /** Persist MEMORY_ONLY and register for deterministic release. */
  def pin(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_ONLY)
    reg.add(df)
    df
  }

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
