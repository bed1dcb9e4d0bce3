package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared registry of operator-internal MEMORY_AND_DISK persists.
  *
  * Operators that tokenize-then-explode (Dedup shingles, Chunking token
  * windows) MUST put a cache boundary above the tokenizer: explode makes
  * `InferFiltersFromGenerate` derive a `size(tokens) > 0` filter, and
  * predicate pushdown substitutes the whole tokenizer expression into
  * the parquet scan — re-running it per row on the scan's (possibly
  * single) input split. The persist stops the substitution AND dedupes
  * the tokenization across downstream consumers.
  *
  * The registry makes those internal persists releasable by long-lived
  * drivers (`releaseAll`); entries are added idempotently per logical
  * plan, so repeated calls over the same input reuse the existing cache
  * entry instead of growing the queue. */
private[graft] object TrackedCaches {

  private val entries =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** True when `df`'s exact plan is already served by the cache
    * manager — callers use it to skip a persist whose only effect
    * would be a second materialized copy of already-cached data. */
  def isCached(df: DataFrame): Boolean =
    df.sparkSession.sharedState.cacheManager
      .lookupCachedData(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isDefined

  def persist(df: DataFrame): DataFrame = {
    // classic.Dataset is the only runtime Dataset in a JVM-local session
    val cached = df.sparkSession.sharedState.cacheManager
      .lookupCachedData(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      .isDefined
    if (cached) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      entries.add(p)
      p
    }
  }

  /** Register an ALREADY-persisted frame (e.g. the CC loop's final
    * label table) so `releaseAll` covers it too. */
  def track(df: DataFrame): DataFrame = {
    entries.add(df)
    df
  }

  /** Hooks run on every `releaseAll` — for driver-side maps that hold
    * handles to frames this registry is about to unpersist (a cached
    * handle to an unpersisted frame silently recomputes per consumer). */
  private val releaseHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]
  def onRelease(hook: () => Unit): Unit = releaseHooks.add(hook)

  def releaseAll(blocking: Boolean = false): Unit = {
    var df = entries.poll()
    while (df != null) {
      df.unpersist(blocking)
      df = entries.poll()
    }
    releaseHooks.forEach(h => h())
  }
}
