package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row identity — the reference's QueueItem content hash (§1.3).
  *
  * Reference: `sha256(identity_encoders_json(payload) + '-' + uuid4())`
  * (/root/reference/bert/queues.py:29-35). The appended uuid4 made every
  * identity globally unique, so DynamoDB "dedup" never deduped (SURVEY
  * §1.3) — a bug-shaped design we deliberately split into two honest
  * operators:
  *  - [[contentHash]]: deterministic content identity → dedup key
  *  - [[uniqueId]]: uuid per row → uniqueness, never dedup
  */
object Identity {

  /** sha256 over the canonical JSON of the given columns (all columns if
    * empty). to_json(struct(...)) preserves field order as given, so the
    * canonical form is stable under column reordering at call sites that
    * pass explicit names. Codegen'd end-to-end.
    */
  def contentHash(df: DataFrame, cols: Seq[String] = Nil): Column = {
    val fields = (if (cols.isEmpty) df.columns.toSeq else cols).map(df.col)
    sha2(to_json(struct(fields: _*)), 256)
  }

  def withIdentity(df: DataFrame, idCol: String = "identity", cols: Seq[String] = Nil): DataFrame =
    df.withColumn(idCol, contentHash(df, cols))

  /** Globally unique id (the reference's uuid4 tail) — explicitly NOT a
    * content hash. */
  def uniqueId: Column = expr("uuid()")
}
