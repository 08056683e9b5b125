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
}
