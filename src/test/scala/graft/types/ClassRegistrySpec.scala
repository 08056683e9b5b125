package graft.types

import org.scalatest.funsuite.AnyFunSuite

import ClassRegistry._

/** The custom-class encoder registry (reference BertETLEncodingMap /
  * ETLReference, SURVEY §1.3 last row): registration guard, signing,
  * tagged round-trip, resolution to a readable Dataset, and the column
  * surface agreeing byte-for-byte with the JVM surface.
  */
class ClassRegistrySpec extends AnyFunSuite {

  test("encode stamps tag + signature; decode validates and round-trips") {
    val reg = ClassRegistry.default()
    val rec = reg.encode(DatasetRef("nation")).get
    assert(rec(RefKey) == "graft.types.DatasetRef")
    assert(rec("message") == "nation")
    // signature = sha256 of sorted non-empty keys BEFORE signing
    assert(rec(SigKey) == sha256Hex("_class_path_refmessage"))
    assert(reg.decode(rec) == DatasetRef("nation"))
  }

  test("unregistered values fall through (None), like the reference's scalar fallback") {
    assert(ClassRegistry.default().encode(42).isEmpty)
  }

  test("duplicate registration refused (datatypes.py:25-26 semantics)") {
    val reg = ClassRegistry.default()
    intercept[IllegalArgumentException] { reg.register(DatasetRefCodec) }
  }

  test("re-signing a signed record refused (datatypes.py:53-54 semantics)") {
    val reg = ClassRegistry.default()
    val rec = reg.encode(DatasetRef("region")).get
    intercept[IllegalArgumentException] { reg.sign(rec) }
  }

  test("decode refuses unknown tags and tampered key sets") {
    val reg = ClassRegistry.default()
    val rec = reg.encode(DatasetRef("region")).get
    intercept[IllegalArgumentException] {
      reg.decode(rec + (RefKey -> "com.example.Unknown"))
    }
    // adding a key breaks the signature mesh
    intercept[IllegalArgumentException] { reg.decode(rec + ("extra" -> "x")) }
    // a record with no tag at all
    intercept[IllegalArgumentException] { reg.decode(rec - RefKey) }
  }

  test("DatasetRef resolves to the named table's rows (ETLReference.resolve analog)") {
    val spark = graft.SparkSpec.session
    val df = DatasetRef("region").resolve(spark, "/root/testdata/sf0.001")
    assert(df.count() == 5) // TPC-H region is fixed at 5 rows
  }

  test("column-level encode agrees with the JVM encode, field for field") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val reg = ClassRegistry.default()
    val jvm = reg.encode(DatasetRef("events")).get
    val row = Seq("events").toDF("source")
      .select(encodeClassColumn(DatasetRefCodec.classPath,
        "message" -> col("source")).as("rec"))
      .select("rec.*").collect().head
    assert(row.getAs[String]("message") == jvm("message"))
    assert(row.getAs[String](RefKey) == jvm(RefKey))
    assert(row.getAs[String](SigKey) == jvm(SigKey))
    // and the validation column accepts it
    val ok = Seq("events").toDF("source")
      .select(encodeClassColumn(DatasetRefCodec.classPath,
        "message" -> col("source")).as("rec"))
      .select(validClassColumn(col("rec"), reg,
        Seq("message", RefKey, SigKey)).as("v"))
      .collect().head.getBoolean(0)
    assert(ok)
  }
}
