package graft.ops

import graft.SparkSpec

/** Cached-storage discipline (r10 verdict item #3): a long registry sweep
  * must hold cached storage FLAT — query-local persist()s are released by
  * the harness's per-query clearCache (Bench and, since r11, Verify), and
  * the lineage-truncation/memo RDDs that legitimately survive (localCheckpoint
  * blocks are RDD-layer, not CacheManager entries) must be CONSTANT across
  * repeats, not per-run accumulation.
  */
class CacheDisciplineSpec extends SparkSpec {

  private def persistentRddCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("persisting queries + per-query clearCache hold storage flat across repeats") {
    val persistingQueries = Seq(
      "q_line_dedup",      // segment frame persist
      "q_heavy_hitters",   // exact-count table persist
      "q_image_phash",     // fingerprint frame persist
      "q_unigram_refit"    // memoized lattice (localCheckpoint, survives by design)
    )
    def sweep(): Int = {
      persistingQueries.foreach { q =>
        graft.SparkEntry.queries(q)(spark, sfDir).foreach(_ => ())
        spark.catalog.clearCache()
      }
      persistentRddCount
    }
    val afterFirst = sweep()
    val afterSecond = sweep()
    val afterThird = sweep()
    // first sweep may establish constant state (the unigram memo's
    // truncated frames); repeats must not add to it
    assert(afterSecond <= afterFirst,
      s"storage grew across sweeps: $afterFirst -> $afterSecond")
    assert(afterThird <= afterFirst,
      s"storage grew across sweeps: $afterFirst -> $afterThird")
  }

  test("Caches.swap keeps a same-plan new generation cached (shared entry survives)") {
    import org.apache.spark.sql.functions.col
    // two INSTANCES with the same canonicalized plan: CacheManager keys by
    // plan, so b.cache() is a no-op hit on a's entry — swap must not
    // unpersist a (that would evict the one shared entry and leave the new
    // generation uncached, the opposite of the documented invariant)
    val a = spark.range(10).toDF("n").filter(col("n") > 2)
    val b = spark.range(10).toDF("n").filter(col("n") > 2)
    try {
      // Dataset.storageLevel IS a cache-manager lookup on the canonicalized
      // plan: NONE means no resident entry covers this frame
      Caches.swap("spec_sameplan", a)
      Caches.swap("spec_sameplan", b)
      assert(b.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
        "same-plan swap evicted the shared cache entry")
      // a genuinely NEW plan still releases the old generation
      val c = spark.range(10).toDF("n").filter(col("n") > 3)
      Caches.swap("spec_sameplan", c)
      assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "distinct-plan swap failed to release the previous generation")
    } finally spark.catalog.clearCache()
  }
}
