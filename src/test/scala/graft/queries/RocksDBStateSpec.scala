package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Provider-independence of the stateful streaming semantics (r13 verdict
  * item 3): at 100 TB keyed state the production state store is RocksDB,
  * not the default HDFS-backed in-memory provider — large state must live
  * off-heap/on-disk per executor. Every stateful gate family (windowed
  * agg, dedup state, stream-stream join buffer, arbitrary GroupState,
  * state timeouts, watermark expiry) is re-run here under
  * RocksDBStateStoreProvider — INCLUDING the four crash-recovery gates,
  * whose checkpoints are written and restored by the provider under test —
  * and must produce row-identical results to the default provider: the
  * engine's semantics are a contract of the PLAN, never of the store.
  */
class RocksDBStateSpec extends SparkSpec {

  private val providerConf = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The stateful gate set: all four recovery families + the state
    * lifecycle gates (timeout, expiry) + one windowed-agg and one
    * stream-stream join representative.
    */
  private val statefulGates = Seq(
    "q_stream_recovery", "q_stream_recovery_dedup", "q_stream_recovery_join",
    "q_stream_recovery_state", "q_stream_timeout", "q_stream_dedup_expiry",
    "q_stream_tumbling", "q_stream_join")

  private def rows(name: String): Set[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSet

  for (gate <- statefulGates)
    test(s"$gate is provider-independent (RocksDB ≡ default HDFS-backed)") {
      val default = rows(gate)
      val prev = spark.conf.getOption(providerConf)
      spark.conf.set(providerConf, rocksdb)
      try {
        val rocks = rows(gate)
        assert(rocks == default,
          s"$gate diverged under RocksDB: only-rocks=${(rocks -- default).take(3)} " +
            s"only-default=${(default -- rocks).take(3)}")
      } finally prev match {
        case Some(v) => spark.conf.set(providerConf, v)
        case None => spark.conf.unset(providerConf)
      }
    }
}
