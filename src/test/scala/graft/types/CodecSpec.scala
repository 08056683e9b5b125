package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Codec._

/** Property-tested round-trips for the tagged-scalar and tensor codecs
  * (§1.3), including the wire formats the reference gets WRONG (int32/64
  * and uint16 decode, ndarray decode) — we assert the correct behavior the
  * SURVEY documents as deliberate divergence. ScalaCheck is driven directly
  * (no scalatestplus bridge in the dependency budget).
  */
class CodecSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("scalar tag grammar matches the reference examples") {
    assert(encodeScalar(true) == "bool:True")
    assert(encodeScalar(false) == "bool:False")
    assert(encodeScalar(5) == "int:5")
    assert(encodeScalar(0.1) == "float:0.1")
    assert(encodeScalar(null) == "null:")
    assert(encodeScalar("plain") == "plain")
  }

  test("scalar round-trips (long, double, boolean, bigint)") {
    check(Prop.forAll { (n: Long) => decodeScalar(encodeScalar(n)) == BigInt(n) })
    check(Prop.forAll { (d: Double) =>
      d.isNaN || d.isInfinite || decodeScalar(encodeScalar(d)) == d
    })
    check(Prop.forAll { (b: Boolean) => decodeScalar(encodeScalar(b)) == b })
    val big = BigInt("123456789012345678901234567890")
    assert(decodeScalar(s"int:$big") == big)
  }

  test("strings that merely look tagged decode as their payload (grammar is total)") {
    assert(decodeScalar("int:42") == BigInt(42))
    assert(decodeScalar("not-a-tag:x") == "not-a-tag:x")
    assert(decodeScalar("") == "")
  }

  private val dtypes = Gen.oneOf("float32", "float64", "int32", "int64")
  private val smallDouble = Gen.chooseNum(-1000, 1000).map(_.toDouble)

  test("tensor wire round-trip for every dtype") {
    check(Prop.forAll(dtypes, Gen.chooseNum(1, 4), Gen.chooseNum(1, 4)) { (dt, r, c) =>
      val data = (0 until r * c).map(i => (i + 1).toDouble)
      val t = Tensor(Seq(r, c), dt, data)
      val back = decodeTensor(encodeTensor(t))
      back.shape == t.shape && back.dtype == dt && back.data == data
    })
  }

  test("float64 tensor round-trips arbitrary values bit-exactly") {
    check(Prop.forAll(Gen.listOfN(6, smallDouble)) { xs =>
      val t = Tensor(Seq(xs.size), "float64", xs)
      decodeTensor(encodeTensor(t)).data == xs
    })
  }

  test("0-d tensor (scalar ndarray) round-trips") {
    val t = Tensor(Seq.empty, "float64", Seq(3.5))
    assert(decodeTensor(encodeTensor(t)).data == Seq(3.5))
  }

  test("fortran-order flattening matches numpy asfortranarray for 2x3") {
    // row-major [[1,2,3],[4,5,6]] → fortran order 1,4,2,5,3,6
    val f = toFortranOrder(Seq(2, 3), Seq(1, 2, 3, 4, 5, 6).map(_.toDouble))
    assert(f == Seq(1, 4, 2, 5, 3, 6).map(_.toDouble))
  }

  test("fortran order is identity for vectors") {
    check(Prop.forAll(Gen.listOfN(5, smallDouble)) { xs =>
      toFortranOrder(Seq(xs.size), xs) == xs
    })
  }

  test("column-level codec round-trips through a DataFrame") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tagged = Seq("int:42", "float:2.5", "bool:True", "null:", "plain words").toDF("t")
    val decoded = tagged.select(Codec.decodeScalarColumn(col("t")).as("v")).select("v.*")
    val rows = decoded.collect().map(r =>
      (r.getAs[String]("kind"), Option(r.get(r.fieldIndex("i"))),
       Option(r.get(r.fieldIndex("d"))), Option(r.get(r.fieldIndex("b"))))).toList
    assert(rows.map(_._1) == List("int", "float", "bool", "null", "string"))
    assert(rows(0)._2.contains(42L) && rows(1)._3.contains(2.5) && rows(2)._4.contains(true))
    // encode side
    val enc = Seq((5L, 2.5, true)).toDF("i", "d", "b").select(
      Codec.encodeScalarColumn(col("i"), LongType).as("ei"),
      Codec.encodeScalarColumn(col("d"), DoubleType).as("ed"),
      Codec.encodeScalarColumn(col("b"), BooleanType).as("eb")).collect().head
    assert(enc.getString(0) == "int:5" && enc.getString(1) == "float:2.5"
      && enc.getString(2) == "bool:True")
  }

  test("shape/data mismatch is rejected") {
    intercept[IllegalArgumentException] { Tensor(Seq(2, 2), "float64", Seq(1.0)) }
    intercept[IllegalArgumentException] { decodeTensor("np.int64:AAAA") }
  }
}
