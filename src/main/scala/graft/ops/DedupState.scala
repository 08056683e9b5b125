package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental exactly-once-seen state — the reference's ETLState (C1).
  *
  * ETLState keeps sha256 hashes of seen values in ONE S3 JSON document and
  * checks membership in-process (/root/reference/bert/etl/__init__.py:24-84)
  * — O(state) download per run, impossible at 100 TB. Here the state is a
  * parquet table of hashes and membership is a distributed anti-join:
  * the only data moved is the shuffled key columns.
  *
  * Batch flow (mirrors contains → contain → synchronize):
  * {{{
  *   val fresh = DedupState.filterNew(spark, batch, statePath, Seq("text"))
  *   // ... process fresh ...
  *   DedupState.commit(spark, fresh, statePath, Seq("text"))
  * }}}
  * `RESET_ETL_STATE` (bert/etl/__init__.py:44-47) → just delete the path.
  *
  * Streaming twin: `dropDuplicatesWithinWatermark` (see graft.streaming),
  * which bounds state by event time instead of growing forever.
  */
object DedupState {

  /** Key hash = [[Identity.contentHash]] (ONE content-identity
    * implementation in the engine, gated by q_dedup_nfc /
    * q_class_roundtrip). `nfc = true` dedups under NFC text identity —
    * see contentHash's scaladoc for the equivalence contract.
    */
  private def hashCol(df: DataFrame, cols: Seq[String], nfc: Boolean) =
    Identity.contentHash(df, cols, nfc)

  /** Rows of `df` whose key-hash is NOT in the state table. Also drops
    * in-batch duplicates (keep-any via dropDuplicates on the hash — the
    * reference's in-run `contains` check as items stream by).
    * `nfc = true` dedups under NFC text identity (see [[hashCol]]); the
    * state dir RECORDS its identity mode (a `_graft_identity_mode` marker
    * written by the first [[commit]]) and both entry points fail fast on a
    * mismatched flag — a silent mismatch would treat every row as new (or
    * drop nothing), corrupting incremental dedup with no error (r13
    * advice).
    */
  def filterNew(spark: SparkSession, df: DataFrame, statePath: String, keyCols: Seq[String],
                nfc: Boolean = false): DataFrame = {
    checkMode(spark, statePath, nfc)
    val withHash = df.withColumn("__state_hash", hashCol(df, keyCols, nfc))
      .dropDuplicates("__state_hash")
    val out =
      if (exists(spark, statePath)) {
        val state = spark.read.parquet(statePath)
        withHash.join(state, withHash("__state_hash") === state("seen_hash"), "left_anti")
      } else withHash
    out.drop("__state_hash")
  }

  /** Record these rows' hashes as seen (the reference's synchronize —
    * bert/etl/__init__.py:49-63 — but append-only parquet, no
    * read-modify-write of a single object). The first commit also stamps
    * the state dir's identity mode; later calls (and [[filterNew]]) must
    * match it.
    */
  def commit(spark: SparkSession, df: DataFrame, statePath: String, keyCols: Seq[String],
             nfc: Boolean = false): Unit = {
    checkMode(spark, statePath, nfc)
    // stamp the mode BEFORE the data lands: stamping after would leave a
    // crash window (hashes written, no marker) in which a later
    // wrong-mode caller passes checkMode, appends mixed-mode hashes, and
    // then certifies the corrupted state as ITS mode. A marker-only dir
    // from a crash between these lines is harmless — filterNew/stateSize
    // treat a dir with no data files as empty state.
    recordMode(spark, statePath, nfc)
    df.select(hashCol(df, keyCols, nfc).as("seen_hash")).distinct()
      .write.mode(SaveMode.Append).parquet(statePath)
  }

  private def modeName(nfc: Boolean): String = if (nfc) "nfc" else "raw"

  private def modeMarker(statePath: String) =
    new org.apache.hadoop.fs.Path(statePath, "_graft_identity_mode")

  /** Fail fast when the caller's identity mode disagrees with the mode the
    * state was built under. Underscore-prefixed, so parquet scans of the
    * state dir skip the marker (the _SUCCESS convention).
    */
  private def checkMode(spark: SparkSession, statePath: String, nfc: Boolean): Unit = {
    val marker = modeMarker(statePath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val stored = try {
        val buf = new Array[Byte](16) // marker is 3 bytes; bounded read
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim
      } finally in.close()
      require(stored == modeName(nfc),
        s"DedupState at $statePath was built under identity mode '$stored' but this call " +
          s"uses '${modeName(nfc)}' — mixed modes silently corrupt incremental dedup " +
          "(every row looks new, or nothing is dropped). Use one mode per state path.")
    }
  }

  /** Stamp the state dir's identity mode, exactly once. `overwrite = false`
    * makes the filesystem the arbiter of two CONCURRENT first commits with
    * different modes: with overwrite both would pass [[checkMode]] (no
    * marker yet), both would write markers (last wins), and mixed-mode
    * hashes would land in the state — the silent corruption the marker
    * exists to prevent (r14 advice). Losing the create race is fine: the
    * loser re-validates against the winner's marker and fails fast on a
    * mode mismatch BEFORE its data lands.
    */
  private def recordMode(spark: SparkSession, statePath: String, nfc: Boolean): Unit = {
    val marker = modeMarker(statePath)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      try {
        val out = fs.create(marker, false)
        try out.write(modeName(nfc).getBytes("UTF-8")) finally out.close()
      } catch {
        case e: java.io.IOException =>
          // lost the create race (FileAlreadyExistsException, or a raw
          // "file exists" IOException from FS impls that don't subclass
          // it): validate against the winner. Anything else is a real
          // I/O failure — rethrow rather than certify an unstamped dir.
          if (fs.exists(marker)) checkMode(spark, statePath, nfc) else throw e
      }
    }
  }

  def stateSize(spark: SparkSession, statePath: String): Long =
    if (exists(spark, statePath)) spark.read.parquet(statePath).count() else 0L

  /** State "exists" = the dir holds at least one DATA file. Underscore
    * entries (the mode marker, _SUCCESS) don't count — a marker-only dir
    * left by a commit that crashed before its parquet write is empty
    * state, not an unreadable table.
    */
  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }
}
