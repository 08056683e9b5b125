package graft.types

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.collection.mutable
import scala.reflect.ClassTag

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Custom-class encoder registry — the reference's `BertETLEncodingMap`
  * (/root/reference/bert/encoders/datatypes.py:11-81) and the ETLReference
  * resolution chain (bert/encoders/etl.py:32-73,
  * bert/etl/__init__.py:239-260), re-expressed for Spark (SURVEY §1.3 last
  * row).
  *
  * Reference semantics kept:
  *  - a registry keyed by class, duplicate registration refused
  *    (datatypes.py:25-26 raises);
  *  - a serialized object is a string-keyed record carrying its class path
  *    under `_class_path_ref` (etl/__init__.py:241,251);
  *  - `sign` stamps `bert-etl-encoding-map-signature` = sha256 hex of the
  *    concatenation of the record's sorted non-empty keys
  *    (datatypes.py:48-59), refusing to re-sign;
  *  - resolution reads the tag, finds the class, validates the tag matches
  *    (Deserialize, etl/__init__.py:254-258), and rebuilds the object;
  *    unknown tags are a loud error (resolve_signature's
  *    NotImplementedError).
  *
  * Spark re-expression: the wire record is a struct column whose fields are
  * the payload + tag + signature, built from codegen'd built-ins
  * ([[ClassRegistry.encodeClassColumn]] — struct/lit/sha2, no UDF), so an
  * encoded frame is columnar, prunable, and oracle-checkable; the JVM
  * Registry below is the edge adapter for driver-side config records, same
  * budget class as [[Codec]] (runs once at ingest, never in the row hot
  * path). Class-path resolution by `importlib` has no JVM analog we'd
  * want (reflection on untrusted queue strings); instead resolution goes
  * through the EXPLICIT registry — same lookup, no arbitrary class loading.
  */
object ClassRegistry {

  val RefKey = "_class_path_ref"
  val SigKey = "bert-etl-encoding-map-signature"

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** One class's codec: payload fields to/from the typed value. `classPath`
    * is the wire tag (reference uses `module.ClassName`).
    */
  abstract class ClassCodec[T](implicit ct: ClassTag[T]) {
    def classPath: String = ct.runtimeClass.getName
    def handles(v: Any): Boolean = ct.runtimeClass.isInstance(v)
    def fields(v: T): Map[String, String]
    def from(fields: Map[String, String]): T
    private[ClassRegistry] def fieldsAny(v: Any): Map[String, String] =
      fields(v.asInstanceOf[T])
  }

  final class Registry {
    private val codecs = mutable.LinkedHashMap[String, ClassCodec[_]]()

    /** Duplicate registration is refused, as the reference does
      * (datatypes.py:25-26).
      */
    def register(c: ClassCodec[_]): this.type = {
      require(!codecs.contains(c.classPath),
        s"codec already registered for ${c.classPath}")
      codecs(c.classPath) = c
      this
    }

    def registered: Seq[String] = codecs.keys.toSeq

    /** sha256 over the record's sorted non-empty keys; re-signing refused
      * (datatypes.py:48-59).
      */
    def sign(m: Map[String, String]): Map[String, String] = {
      require(!m.contains(SigKey), s"record already signed ($SigKey present)")
      val mesh = m.keys.filter(_.nonEmpty).toSeq.sorted.mkString("")
      m + (SigKey -> sha256Hex(mesh))
    }

    /** Serialize: first registered codec whose class matches, tag stamped,
      * record signed. None when no codec claims the value (the reference
      * falls through to its scalar grammar; callers here do the same via
      * [[Codec.encodeScalar]]).
      */
    def encode(v: Any): Option[Map[String, String]] =
      codecs.values.find(_.handles(v)).map { c =>
        sign(c.fieldsAny(v) + (RefKey -> c.classPath))
      }

    /** Deserialize + validate: tag present and registered, signature (when
      * present) recomputed over the payload+tag keys and equal. Returns the
      * rebuilt value.
      */
    def decode(m: Map[String, String]): Any = {
      val tag = m.getOrElse(RefKey,
        throw new IllegalArgumentException(s"record has no $RefKey"))
      val codec = codecs.getOrElse(tag,
        throw new IllegalArgumentException(s"no codec registered for $tag"))
      m.get(SigKey).foreach { sig =>
        val mesh = (m - SigKey).keys.filter(_.nonEmpty).toSeq.sorted.mkString("")
        require(sha256Hex(mesh) == sig,
          s"signature mismatch for $tag: key set was altered in transit")
      }
      codec.from(m - RefKey - SigKey)
    }
  }

  // ------------------------------------------------------- column surface

  /** Column-level serialize: payload columns + tag + signature as ONE
    * struct of codegen'd built-ins. The signature mesh is the sorted key
    * set, known at plan time, so sha2 constant-folds — zero per-row cost
    * beyond the struct itself.
    */
  def encodeClassColumn(classPath: String, payload: (String, Column)*): Column = {
    val keys = payload.map(_._1) :+ RefKey
    require(keys.distinct.size == keys.size, s"duplicate payload key in $keys")
    require(!payload.exists(_._1 == SigKey), s"payload may not preset $SigKey")
    val mesh = keys.filter(_.nonEmpty).sorted.mkString("")
    val cols = payload.map { case (k, c) => c.as(k) } :+
      lit(classPath).as(RefKey) :+
      sha2(lit(mesh), 256).as(SigKey)
    struct(cols: _*)
  }

  /** Column-level validation of an encoded struct: tag registered and
    * signature equal to the recomputation from the struct's own field
    * names (minus the signature itself). Pure built-ins.
    */
  def validClassColumn(c: Column, registry: Registry,
      structFields: Seq[String]): Column = {
    val mesh = structFields.filterNot(_ == SigKey).filter(_.nonEmpty)
      .sorted.mkString("")
    c.getField(RefKey).isin(registry.registered: _*) &&
      c.getField(SigKey) === sha2(lit(mesh), 256)
  }

  // ----------------------------------------------- reference-shaped types

  /** The ETLReference analog: a by-name pointer to a dataset. `resolve`
    * returns the readable Dataset (reference: ETLReference.resolve →
    * ETLDatasetReader → ETLDataset, etl/__init__.py:245-246) — here the
    * named sf table as a DataFrame, the Spark-native meaning of "resolve a
    * serialized reference into rows".
    */
  final case class DatasetRef(table: String) {
    def resolve(spark: SparkSession, sfDir: String): DataFrame =
      graft.Tables.load(spark, sfDir, table)
  }

  object DatasetRefCodec extends ClassCodec[DatasetRef] {
    override val classPath = "graft.types.DatasetRef"
    def fields(v: DatasetRef): Map[String, String] = Map("message" -> v.table)
    def from(fields: Map[String, String]): DatasetRef =
      DatasetRef(fields.getOrElse("message",
        throw new IllegalArgumentException("DatasetRef record has no message")))
  }

  /** A fresh registry with the built-in codecs, mirroring etl.py's
    * module-level map construction (etl.py:53-56).
    */
  def default(): Registry = new Registry().register(DatasetRefCodec)
}
