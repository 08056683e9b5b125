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
    *
    * `nfc = true` unicode-normalizes every STRING column (the codegen'd
    * [[graft.functions.UnicodeNormalize]] kernel) before hashing, so
    * byte-distinct render-identical spellings share an identity — the
    * q_unicode_dedup classes. This is THE content-hash implementation:
    * [[DedupState]] builds its state keys here, so the q_dedup_nfc gate
    * covers this code path end-to-end. Raw bytes stay the default; which
    * equivalence an identity dedups under is a caller contract.
    */
  def contentHash(df: DataFrame, cols: Seq[String] = Nil, nfc: Boolean = false): Column = {
    if (nfc) graft.functions.GraftFunctions.register(df.sparkSession)
    val names = if (cols.isEmpty) df.columns.toSeq else cols
    // nfc normalizes TOP-LEVEL string columns only. A string nested inside
    // an array/map/struct would silently keep BYTE identity while the
    // caller believes it got NFC — fail fast instead (r13 advice).
    // Stringless columns (numbers, dates, binaries) pass through: they
    // carry no NFC expectation.
    if (nfc) names.foreach { c =>
      val t = df.schema(c).dataType
      require(t == org.apache.spark.sql.types.StringType || !containsString(t),
        s"contentHash(nfc = true): column '$c' has type ${t.simpleString}, whose NESTED " +
          "strings would be hashed by raw bytes, not NFC. Normalize/flatten the column " +
          "upstream, or hash it without nfc.")
    }
    val fields = names.map { c =>
      if (nfc && df.schema(c).dataType == org.apache.spark.sql.types.StringType)
        call_function("unicode_normalize", df.col(c), lit("NFC")).as(c)
      else df.col(c)
    }
    sha2(to_json(struct(fields: _*)), 256)
  }

  def withIdentity(df: DataFrame, idCol: String = "identity", cols: Seq[String] = Nil,
                   nfc: Boolean = false): DataFrame =
    df.withColumn(idCol, contentHash(df, cols, nfc))

  /** Globally unique id (the reference's uuid4 tail) — explicitly NOT a
    * content hash. */
  def uniqueId: Column = expr("uuid()")

  /** Does this type contain a string anywhere (itself, array element, map
    * key/value, struct field — recursively)? */
  private def containsString(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case StringType => true
      case a: ArrayType => containsString(a.elementType)
      case m: MapType => containsString(m.keyType) || containsString(m.valueType)
      case s: StructType => s.fields.exists(f => containsString(f.dataType))
      case _ => false
    }
  }
}
