package graft

import org.apache.spark.sql.SparkSession

/** SPARK_GRAFT_CONF="k=v;k=v" — arbitrary session-conf overlay for
  * robustness sweeps (AQE off, exchange reuse off, odd partition counts…).
  * ONE parser for Verify and Bench: segments are trimmed (a space after
  * ';' must not silently turn a real key into an unknown one, faking a
  * green sweep under default configs) and malformed segments fail loudly
  * with the offending text.
  */
object SessionConf {
  def overlay(builder: SparkSession.Builder): SparkSession.Builder = {
    // Graft base default, set BEFORE the env overlay so SPARK_GRAFT_CONF
    // can still override it in sweeps: the driver-generated parquet holds
    // isAdjustedToUTC=false timestamps, which Spark 4 would infer as
    // TIMESTAMP_NTZ — a type watermarks, unix_micros and interval
    // arithmetic reject. One visible session-level choice here replaces
    // the old per-call mutation inside Tables.load (which silently
    // disabled NTZ inference for unrelated readers created later);
    // Tables.ntzToLtz stays as the local belt for externally-built
    // sessions that skip this overlay.
    builder.config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // Shuffle-writer selection (r16, guide §2.2 "fewer, larger blocks"):
    // the bypass-merge writer creates one FILE per reduce partition per
    // map task — M×R file creations per shuffle — while the tungsten sort
    // writer emits one spill file + index per map task after an in-memory
    // partition-id radix sort. Spark's default threshold (200) uses bypass
    // for every narrow shuffle; measured on this engine's registry the
    // crossover is far lower: at R=32 an interleaved min-of-2 A/B over a
    // 20-query subset ran 36.8 s (bypass) vs 31.5 s (tungsten) — a stack
    // probe showed DiskBlockObjectWriter.open as the hottest non-idle
    // executor frame — while at R=8 bypass stays at par (13.99 vs
    // 14.77 s). Threshold 16 keeps bypass exactly for the tiny-R shuffles
    // where it wins and is inert at production widths (R ≫ 200 already
    // uses the tungsten writer under any threshold). Set BEFORE the env
    // overlay so SPARK_GRAFT_CONF sweeps can still override it.
    builder.config("spark.shuffle.sort.bypassMergeThreshold", "16")
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty =>
            builder.config(k.trim, v.trim)
          case _ =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_CONF segment is not k=v: '$kv'")
        }
      }
    }
    builder
  }
}
