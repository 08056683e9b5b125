package graft.ops

import org.apache.spark.sql.DataFrame

/** Bounded-lifetime persists for query builders that cache an intermediate
  * shared by several consumers of their LAZY result (the hostile-dedup
  * shingle table, the NFC fresh-rows frame). The builder re-runs once per
  * bench sample / verify call, and a bare `.cache()` from the previous
  * invocation would linger until LRU eviction, adding memory-pressure
  * noise to the very bench the min-of-3 protocol tries to stabilize
  * (r13 advice). [[swap]] keys each persist to its call site and
  * unpersists the PREVIOUS holder before caching the new one, so at most
  * ONE generation per site is ever resident — the [[Scratch]] discipline
  * applied to executor storage instead of tmp dirs.
  *
  * Verify and Bench additionally `clearCache()` between queries/samples;
  * this bounds builders invoked OUTSIDE those harnesses too (a user
  * looping a query in a notebook gets the same guarantee).
  */
object Caches {

  private val live = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Cache `df` under `key`, releasing the previous generation cached
    * under the same key (non-blocking: the old blocks drop as their last
    * readers finish). Returns the cached frame. Synchronized, and the new
    * frame is cached BEFORE the old is released: an unsynchronized
    * put-then-cache would let two concurrent callers interleave into two
    * resident generations — the exact state this class exists to prevent.
    * The map holds at most one (small) plan per call site and the sites
    * are a fixed code-level set, so retention is bounded by construction.
    *
    * Same-plan generations: Spark's CacheManager keys entries by
    * CANONICALIZED plan, not DataFrame instance. When the new generation's
    * plan sameResults the previous one's, the `cache()` above was a no-op
    * hit on the previous entry, and unpersisting `prev` would evict that
    * one SHARED entry — leaving the new generation uncached, the opposite
    * of the invariant (r14 advice). The release is skipped in that case:
    * both instances then share the single resident entry, which is still
    * "at most one generation per site".
    */
  def swap(key: String, df: DataFrame): DataFrame = synchronized {
    df.cache()
    val prev = live.put(key, df)
    if ((prev != null) && (prev ne df) &&
        !prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed))
      prev.unpersist(blocking = false)
    df
  }
}
