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

  // ------------------------------------------------- np scalar dtype zoo

  test("np scalar wire strings produced by numpy decode to the exact value") {
    // every constant below was emitted by numpy itself (tostring() + b64),
    // one per dtype of the reference zoo (numpy.py:52-115)
    assert(decodeScalar("np.float16:AD4=") == NpScalar("float16", 1.5f))
    assert(decodeScalar("np.float16:AJQ=") == NpScalar("float16", -0.0009765625f)) // subnormal
    assert(decodeScalar("np.float16:/3s=") == NpScalar("float16", 65504.0f)) // max finite half
    assert(decodeScalar("np.float32:0A9JQA==") == NpScalar("float32", 3.14159f))
    assert(decodeScalar("np.float64:aVcUiwq/BcA=") == NpScalar("float64", -2.718281828459045))
    assert(decodeScalar("np.complex64:AADAPwAAIMA=") == NpScalar("complex64", Complex64(1.5f, -2.5f)))
    assert(decodeScalar("np.int8:gA==") == NpScalar("int8", -128.toByte))
    assert(decodeScalar("np.int16:AIA=") == NpScalar("int16", -32768.toShort))
    assert(decodeScalar("np.int32:////fw==") == NpScalar("int32", Int.MaxValue))
    assert(decodeScalar("np.int64:AAAAAAAAAIA=") == NpScalar("int64", Long.MinValue))
    assert(decodeScalar("np.uint8:/w==") == NpScalar("uint8", 255))
    assert(decodeScalar("np.uint16://8=") == NpScalar("uint16", 65535))
    assert(decodeScalar("np.uint32://///w==") == NpScalar("uint32", 4294967295L))
    assert(decodeScalar("np.uint64://////////8=") ==
      NpScalar("uint64", BigInt("18446744073709551615")))
    assert(decodeScalar("np.intc:+f///w==") == NpScalar("intc", -7))
    assert(decodeScalar("np.intp:ywT7cR8BAAA=") == NpScalar("intp", 1234567890123L))
    assert(decodeScalar("np.bool_:AQ==") == NpScalar("bool_", true))
    assert(decodeScalar("np.bool_:AA==") == NpScalar("bool_", false))
  }

  test("np.incp (reference's intp encode typo, numpy.py:115) is accepted as intp") {
    assert(decodeScalar("np.incp:ywT7cR8BAAA=") == NpScalar("intp", 1234567890123L))
  }

  test("np scalar encode∘decode is the identity on correctly-tagged wire strings") {
    val wires = Seq(
      "np.float16:AD4=", "np.float32:0A9JQA==", "np.float64:aVcUiwq/BcA=",
      "np.complex64:AADAPwAAIMA=", "np.int8:gA==", "np.int16:AIA=",
      "np.int32:////fw==", "np.int64:AAAAAAAAAIA=", "np.uint8:/w==",
      "np.uint16://8=", "np.uint32://///w==", "np.uint64://////////8=",
      "np.intc:+f///w==", "np.intp:ywT7cR8BAAA=", "np.bool_:AQ==")
    wires.foreach { w =>
      assert(encodeScalar(decodeScalar(w)) == w, s"round-trip broke for $w")
    }
  }

  test("np scalar property round-trips per dtype") {
    check(Prop.forAll { (v: Float) =>
      v.isNaN || decodeNpScalar(encodeNpScalar(NpScalar("float32", v))) == NpScalar("float32", v)
    })
    check(Prop.forAll { (v: Byte) =>
      decodeNpScalar(encodeNpScalar(NpScalar("int8", v))) == NpScalar("int8", v)
    })
    check(Prop.forAll { (v: Short) =>
      decodeNpScalar(encodeNpScalar(NpScalar("int16", v))) == NpScalar("int16", v)
    })
    check(Prop.forAll { (v: Long) =>
      decodeNpScalar(encodeNpScalar(NpScalar("int64", v))) == NpScalar("int64", v)
    })
    check(Prop.forAll(Gen.chooseNum(0, 255)) { v =>
      decodeNpScalar(encodeNpScalar(NpScalar("uint8", v))) == NpScalar("uint8", v)
    })
    check(Prop.forAll(Gen.chooseNum(0L, 4294967295L)) { v =>
      decodeNpScalar(encodeNpScalar(NpScalar("uint32", v))) == NpScalar("uint32", v)
    })
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val u = BigInt(v) * 2 + (v % 2) // spread into the full unsigned range
      decodeNpScalar(encodeNpScalar(NpScalar("uint64", u))) == NpScalar("uint64", u)
    })
  }

  test("half-precision conversion round-trips every one of the 65536 bit patterns") {
    // floatToHalf(halfToFloat(h)) == h for all finite/Inf patterns; NaNs
    // need only stay NaN (payload bits are not specified)
    (0 to 0xffff).foreach { bits =>
      val h = bits.toShort
      val f = halfToFloat(h)
      if (f.isNaN) assert(halfToFloat(floatToHalf(f)).isNaN)
      else assert(floatToHalf(f) == h,
        f"half bits 0x$bits%04x -> $f -> 0x${floatToHalf(f) & 0xffff}%04x")
    }
  }

  test("floatToHalf rounds to nearest even like numpy") {
    // 1.0 + 2^-11 is exactly halfway between 1.0 and the next half; ties to
    // even mantissa → 1.0. 1.0 + 3×2^-12 rounds up.
    assert(floatToHalf(1.0f + math.pow(2, -11).toFloat) == floatToHalf(1.0f))
    assert(halfToFloat(floatToHalf(1.0f + 3 * math.pow(2, -12).toFloat)) > 1.0f)
    // overflow → Inf (numpy: np.float16(65520.0) == inf)
    assert(halfToFloat(floatToHalf(65520.0f)).isInfinite)
    assert(halfToFloat(floatToHalf(65504.0f)) == 65504.0f)
  }

  // ------------------------------------------------- ndarray dtype zoo

  test("ndarray wire strings produced by numpy decode exactly (int16/float16/bool_/uint8/complex64)") {
    val t1 = decodeTensor("np.ndarray:2,3:int16:AAAsAWQAkAHIAPQB")
    assert(t1.shape == Seq(2, 3) && t1.dtype == "int16")
    // fortran order of [[0,100,200],[300,400,500]]
    assert(t1.data == Seq(0.0, 300.0, 100.0, 400.0, 200.0, 500.0))
    val t2 = decodeTensor("np.ndarray:2,2:float16:AD5AQoDAAEQ=")
    assert(t2.data == Seq(1.5, 3.125, -2.25, 4.0)) // fortran order
    val t3 = decodeTensor("np.ndarray:3:bool_:AQAB")
    assert(t3.data == Seq(1.0, 0.0, 1.0))
    val t4 = decodeTensor("np.ndarray:3:uint8:AP+A")
    assert(t4.data == Seq(0.0, 255.0, 128.0))
    val t5 = decodeTensor("np.ndarray:2:complex64:AACAPwAAAEAAAGDAAACAPg==")
    assert(t5.dtype == "complex64" && t5.shape == Seq(2))
    assert(t5.data == Seq(1.0, 2.0, -3.5, 0.25)) // interleaved (re, im)
  }

  test("tensor wire round-trip across the full dtype zoo") {
    val intish = Gen.oneOf("int8", "int16", "int32", "int64", "intc", "intp")
    check(Prop.forAll(intish, Gen.listOfN(4, Gen.chooseNum(-100, 100))) { (dt, xs) =>
      val t = Tensor(Seq(xs.size), dt, xs.map(_.toDouble))
      decodeTensor(encodeTensor(t)) == t
    })
    val uintish = Gen.oneOf("uint8", "uint16", "uint32", "uint64")
    check(Prop.forAll(uintish, Gen.listOfN(4, Gen.chooseNum(0, 200))) { (dt, xs) =>
      val t = Tensor(Seq(xs.size), dt, xs.map(_.toDouble))
      decodeTensor(encodeTensor(t)) == t
    })
    check(Prop.forAll(Gen.listOfN(3, Gen.oneOf(0.0, 1.0))) { xs =>
      val t = Tensor(Seq(xs.size), "bool_", xs)
      decodeTensor(encodeTensor(t)) == t
    })
    check(Prop.forAll(Gen.listOfN(6, Gen.chooseNum(-50, 50))) { xs =>
      // complex64: 3 logical elements = 6 interleaved slots
      val t = Tensor(Seq(3), "complex64", xs.map(_.toDouble))
      decodeTensor(encodeTensor(t)) == t
    })
    check(Prop.forAll(Gen.listOfN(4, Gen.chooseNum(-8, 8))) { xs =>
      // float16: ±8 integers are exactly representable in half precision
      val t = Tensor(Seq(xs.size), "float16", xs.map(_.toDouble))
      decodeTensor(encodeTensor(t)) == t
    })
  }
}
