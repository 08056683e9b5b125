package graft.types

import java.nio.{ByteBuffer, ByteOrder}
import java.util.Base64

/** Tagged-scalar and tensor codec — the reference's encoder subsystem
  * (§1.3 / §2.5) reduced to what survives on Spark.
  *
  * Reference encoding (DynamoDB-AttributeValue-like,
  * /root/reference/bert/encoders/base.py:22-153): dicts → {'M':…},
  * lists → {'L':…}, bytes → {'B':…}, strings → {'S': raw}, and scalars
  * stringified with a type prefix: 'bool:True', 'int:5', 'float:0.1',
  * 'null:'. numpy extensions (bert/encoders/numpy.py:26-234) add
  * 'np.<dtype>:<base64 LE bytes>' scalars and
  * 'np.ndarray:<shape-csv>:<dtype>:<base64 Fortran-order buffer>'.
  *
  * In Spark the M/L/S layers dissolve into StructType/ArrayType/StringType
  * + Encoders; what survives is (a) the scalar tag grammar for interop with
  * queues written by the reference, (b) the ndarray buffer layout. Both are
  * implemented here as plain JVM functions (edge adapters — run once at
  * ingest, not in the relational hot path).
  *
  * Deliberate divergences from reference BUGS (do-not-replicate list,
  * SURVEY §0):
  *  - np.int32/int64 decode: the reference compares an 8-char prefix slice
  *    against 9-char literals so those branches never match
  *    (numpy.py:171,175); we decode them correctly.
  *  - uint16 decodes as uint8 in the reference (numpy.py:184-186); we
  *    decode 2 LE bytes.
  *  - ndarray decode slices the wrong variable (numpy.py:205-206) and
  *    can't work at all; we round-trip shape/dtype/buffer faithfully.
  */
object Codec {

  // ---------------------------------------------------------------- scalars

  /** Encode a scalar to the reference's tag grammar. Strings are raw (the
    * 'S' layer carries them untagged); booleans use Python capitalization
    * for wire compatibility.
    */
  def encodeScalar(v: Any): String = v match {
    case null => "null:"
    case b: Boolean => if (b) "bool:True" else "bool:False"
    case n: Byte => s"int:$n"
    case n: Short => s"int:$n"
    case n: Int => s"int:$n"
    case n: Long => s"int:$n"
    case n: BigInt => s"int:$n"
    case f: Float => s"float:${f.toDouble}"
    case d: Double => s"float:$d"
    case np: NpScalar => encodeNpScalar(np)
    case s: String => s
    case other =>
      throw new IllegalArgumentException(s"not a tagged scalar: ${other.getClass}")
  }

  /** Decode the tag grammar; untagged input is a raw string (matches
    * decode_aws_object's fall-through, base.py:146-153). Python ints are
    * arbitrary-precision, so 'int:' decodes to BigInt and callers narrow
    * explicitly (documented Long-overflow divergence, SURVEY §7.4).
    * `np.<dtype>:` tags decode to [[NpScalar]] (dtype preserved so the
    * encode∘decode round trip is byte-identical).
    */
  def decodeScalar(s: String): Any = s match {
    case "null:" => null
    case "bool:True" => true
    case "bool:False" => false
    case _ if s.startsWith("int:") => BigInt(s.substring(4))
    case _ if s.startsWith("float:") => s.substring(6).toDouble
    case _ if s.startsWith("np.") && !s.startsWith("np.ndarray:") &&
      s.indexOf(':') > 0 =>
      // Total like the reference's decode fall-through (base.py:146-153):
      // an 'np.<x>:<y>' look-alike with an unknown dtype, a non-base64
      // payload, or a short buffer is NOT an error — it is an ordinary
      // string that happens to resemble a tag, and comes back unchanged.
      try decodeNpScalar(s)
      catch { case scala.util.control.NonFatal(_) => s }
    case _ => s
  }

  // ----------------------------------------------------------- np scalars

  /** One numpy scalar off the reference wire: dtype name + JVM value.
    * Value types per dtype: float16/float32 → Float, float64 → Double,
    * complex64 → [[Complex64]], int8 → Byte, int16 → Short,
    * int32/intc → Int, int64/intp → Long, uint8/uint16 → Int,
    * uint32 → Long, uint64 → BigInt (full unsigned range), bool_ →
    * Boolean. Carrying the dtype (not just a widened value) makes
    * encodeScalar(decodeScalar(s)) == s for every reference-written tag.
    */
  final case class NpScalar(dtype: String, value: Any)

  /** complex64 = two LE float32 (re, im) — numpy's buffer layout. */
  final case class Complex64(re: Float, im: Float)

  /** IEEE 754 half → float. Java 17 lacks Float.float16ToFloat (Java 20+),
    * so the bit fiddle is spelled out: sign, 5-bit exponent (bias 15,
    * subnormals, Inf/NaN), 10-bit mantissa.
    */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits >>> 15) << 31
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val fbits =
      if (exp == 0x1f) sign | 0x7f800000 | (mant << 13) // Inf / NaN
      else if (exp != 0) sign | ((exp - 15 + 127) << 23) | (mant << 13)
      else if (mant == 0) sign // ±0
      else { // subnormal: value = mant × 2^-24 — normalize to 1.f × 2^(-14-shift)
        var m = mant; var shift = 0
        while ((m & 0x400) == 0) { m <<= 1; shift += 1 }
        sign | ((113 - shift) << 23) | ((m & 0x3ff) << 13)
      }
    java.lang.Float.intBitsToFloat(fbits)
  }

  /** float → IEEE 754 half, round-to-nearest-even (numpy's conversion). */
  def floatToHalf(f: Float): Short = {
    val fbits = java.lang.Float.floatToIntBits(f)
    val sign = (fbits >>> 16) & 0x8000
    val exp = (fbits >>> 23) & 0xff
    val mant = fbits & 0x7fffff
    val out =
      if (exp == 0xff) sign | 0x7c00 | (if (mant != 0) 0x200 | (mant >>> 13) else 0)
      else {
        val e = exp - 127 + 15
        if (e >= 0x1f) sign | 0x7c00 // overflow → Inf
        else if (e <= 0) { // subnormal or underflow
          if (e < -10) sign
          else {
            // half-subnormal mantissa = significand >> (14 - e), rounded
            // to nearest-even over ALL dropped bits (one shift, so no
            // sticky bit is lost to an intermediate truncation)
            val sgf = mant | 0x800000
            val shift = 14 - e // 14..24
            val base = sgf >>> shift
            val rem = sgf & ((1 << shift) - 1)
            val half = 1 << (shift - 1)
            val r = if (rem > half || (rem == half && (base & 1) == 1)) base + 1 else base
            sign | r
          }
        } else {
          val base = (e << 10) | (mant >>> 13)
          val rem = mant & 0x1fff
          val r = if (rem > 0x1000 || (rem == 0x1000 && (base & 1) == 1)) base + 1 else base
          sign | r // mantissa carry may bump the exponent — that is correct
        }
      }
    out.toShort
  }

  private def leBuf(n: Int): ByteBuffer =
    ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** Encode one numpy scalar to 'np.<dtype>:<b64 LE bytes>'
    * (numpy.py:52-115). Divergence note: the reference tags np.intp as
    * 'np.incp:' (numpy.py:115, typo); we WRITE the correct 'np.intp:' and
    * ACCEPT both on decode, so queues flow in either direction.
    */
  def encodeNpScalar(s: NpScalar): String = {
    val bytes: Array[Byte] = (s.dtype, s.value) match {
      case ("float16", v: Float) => leBuf(2).putShort(floatToHalf(v)).array()
      case ("float32", v: Float) => leBuf(4).putFloat(v).array()
      case ("float64", v: Double) => leBuf(8).putDouble(v).array()
      case ("complex64", Complex64(re, im)) => leBuf(8).putFloat(re).putFloat(im).array()
      case ("int8", v: Byte) => Array(v)
      case ("int16", v: Short) => leBuf(2).putShort(v).array()
      case ("int32" | "intc", v: Int) => leBuf(4).putInt(v).array()
      case ("int64" | "intp", v: Long) => leBuf(8).putLong(v).array()
      case ("uint8", v: Int) => Array((v & 0xff).toByte)
      case ("uint16", v: Int) => leBuf(2).putShort((v & 0xffff).toShort).array()
      case ("uint32", v: Long) => leBuf(4).putInt((v & 0xffffffffL).toInt).array()
      case ("uint64", v: BigInt) => leBuf(8).putLong(v.longValue).array()
      case ("bool_", v: Boolean) => Array(if (v) 1.toByte else 0.toByte)
      case (d, v) => throw new IllegalArgumentException(
        s"np scalar dtype/value mismatch: $d / ${if (v == null) "null" else v.getClass}")
    }
    s"np.${s.dtype}:${b64e.encodeToString(bytes)}"
  }

  /** Decode 'np.<dtype>:<b64>' (numpy.py:145-211, minus its bugs: int32/
    * int64 prefix-slice mismatch, uint16-as-uint8 — all decoded correctly
    * here; 'np.incp:' accepted as intp for reference-written queues).
    */
  def decodeNpScalar(s: String): NpScalar = {
    require(s.startsWith("np."), s"not an np scalar: ${s.take(20)}")
    val colon = s.indexOf(':')
    require(colon > 3, s"malformed np scalar tag: ${s.take(20)}")
    val rawDtype = s.substring(3, colon)
    val dtype = if (rawDtype == "incp") "intp" else rawDtype // reference typo
    val bb = ByteBuffer.wrap(b64d.decode(s.substring(colon + 1)))
      .order(ByteOrder.LITTLE_ENDIAN)
    val value: Any = dtype match {
      case "float16" => halfToFloat(bb.getShort)
      case "float32" => bb.getFloat
      case "float64" => bb.getDouble
      case "complex64" => Complex64(bb.getFloat, bb.getFloat)
      case "int8" => bb.get
      case "int16" => bb.getShort
      case "int32" | "intc" => bb.getInt
      case "int64" | "intp" => bb.getLong
      case "uint8" => bb.get & 0xff
      case "uint16" => bb.getShort & 0xffff
      case "uint32" => bb.getInt.toLong & 0xffffffffL
      case "uint64" => BigInt(java.lang.Long.toUnsignedString(bb.getLong))
      case "bool_" => bb.get != 0
      case other => throw new IllegalArgumentException(s"unsupported np dtype: $other")
    }
    NpScalar(dtype, value)
  }

  // ---------------------------------------------------------------- tensors

  /** Canonical tensor value: shape + dtype + the flat buffer in
    * COLUMN-MAJOR (Fortran) element order, exactly the reference's ndarray
    * wire layout (numpy.py:117-122 encodes via asfortranarray). In a
    * DataFrame this is a StructType(shape: array<int>, dtype: string,
    * data: array<double>) column — the "multimodal/tensor column".
    */
  final case class Tensor(shape: Seq[Int], dtype: String, data: Seq[Double]) {
    private def want =
      (if (shape.isEmpty) 1 else shape.product) * (if (dtype == "complex64") 2 else 1)
    require(want == data.size,
      s"shape ${shape.mkString("x")} ($dtype) incompatible with ${data.size} elements")
  }

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  /** Bytes per buffer SLOT. complex64 is carried as interleaved (re, im)
    * float32 slots in `data` — two 4-byte slots per logical element —
    * matching numpy's buffer layout exactly.
    */
  private def slotSize(dtype: String): Int = dtype match {
    case "int8" | "uint8" | "bool_" | "bool" => 1
    case "int16" | "uint16" | "float16" => 2
    case "int32" | "uint32" | "intc" | "float32" | "complex64" => 4
    case "int64" | "uint64" | "intp" | "float64" => 8
    case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
  }

  private def writeSlot(bb: ByteBuffer, dtype: String, d: Double): Unit = dtype match {
    case "float16" => bb.putShort(floatToHalf(d.toFloat))
    case "float32" | "complex64" => bb.putFloat(d.toFloat)
    case "float64" => bb.putDouble(d)
    case "int8" => bb.put(d.toByte)
    case "int16" => bb.putShort(d.toShort)
    case "int32" | "intc" => bb.putInt(d.toInt)
    case "int64" | "intp" => bb.putLong(d.toLong)
    case "uint8" => bb.put((d.toInt & 0xff).toByte)
    case "uint16" => bb.putShort((d.toInt & 0xffff).toShort)
    case "uint32" => bb.putInt((d.toLong & 0xffffffffL).toInt)
    // BigInt.longValue wraps two's-complement = value mod 2^64: exactly the
    // unsigned bit pattern (and 2^64 itself, double-rounded from 2^64-1,
    // wraps instead of throwing)
    case "uint64" => bb.putLong(BigDecimal(d).toBigInt.longValue)
    case "bool_" | "bool" => bb.put(if (d != 0.0) 1.toByte else 0.toByte)
    case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
  }

  private def readSlot(bb: ByteBuffer, dtype: String): Double = dtype match {
    case "float16" => halfToFloat(bb.getShort).toDouble
    case "float32" | "complex64" => bb.getFloat.toDouble
    case "float64" => bb.getDouble
    case "int8" => bb.get.toDouble
    case "int16" => bb.getShort.toDouble
    case "int32" | "intc" => bb.getInt.toDouble
    case "int64" | "intp" => bb.getLong.toDouble
    case "uint8" => (bb.get & 0xff).toDouble
    case "uint16" => (bb.getShort & 0xffff).toDouble
    case "uint32" => (bb.getInt.toLong & 0xffffffffL).toDouble
    case "uint64" => new java.math.BigDecimal(
      new java.math.BigInteger(java.lang.Long.toUnsignedString(bb.getLong))).doubleValue
    case "bool_" | "bool" => if (bb.get != 0) 1.0 else 0.0
    case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
  }

  /** Encode to the reference wire string 'np.ndarray:<shape-csv>:<dtype>:<b64>'
    * over the full reference dtype zoo (numpy.py:212-231). `data` carries
    * values as Double — exact for every dtype except int64/intp/uint64
    * magnitudes beyond 2^53, where Double cannot hold the integer
    * (documented divergence, same as the scalar 'int:' narrowing note).
    */
  def encodeTensor(t: Tensor): String = {
    val bb = ByteBuffer.allocate(slotSize(t.dtype) * t.data.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    t.data.foreach(d => writeSlot(bb, t.dtype, d))
    s"np.ndarray:${t.shape.mkString(",")}:${t.dtype}:${b64e.encodeToString(bb.array())}"
  }

  /** Decode the wire string (correctly — see divergence notes above). */
  def decodeTensor(s: String): Tensor = {
    require(s.startsWith("np.ndarray:"), s"not an ndarray encoding: ${s.take(20)}")
    val rest = s.substring("np.ndarray:".length)
    val i1 = rest.indexOf(':')
    val i2 = rest.indexOf(':', i1 + 1)
    val shape =
      if (rest.take(i1).isEmpty) Seq.empty[Int]
      else rest.take(i1).split(',').toSeq.map(_.trim.toInt)
    val dtype = rest.substring(i1 + 1, i2)
    val bytes = b64d.decode(rest.substring(i2 + 1))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length % slotSize(dtype) == 0,
      s"buffer length ${bytes.length} not a multiple of $dtype slot size")
    val data = Iterator.continually(bb).takeWhile(_.hasRemaining)
      .map(b => readSlot(b, dtype)).toSeq
    Tensor(shape, dtype, data)
  }

  // -------------------------------------------------------- column surface

  /** Column-level tagged-scalar decode: classify and extract into a typed
    * struct (kind, s, i, d, b) — mixed-type queue payloads can't widen to
    * one Spark type, so the struct carries each typed slot with the others
    * null. Pure built-ins (codegen'd); the ingest-edge twin of
    * [[decodeScalar]].
    */
  def decodeScalarColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val kind = when(c === "null:", "null")
      .when(c.isin("bool:True", "bool:False"), "bool")
      .when(c.startsWith("int:"), "int")
      .when(c.startsWith("float:"), "float")
      .otherwise("string")
    struct(
      kind.as("kind"),
      when(kind === "string", c).as("s"),
      when(kind === "int", c.substr(lit(5), length(c)).cast("long")).as("i"),
      when(kind === "float", c.substr(lit(7), length(c)).cast("double")).as("d"),
      when(kind === "bool", c === "bool:True").as("b"))
  }

  /** Column-level encode of a typed column into the tag grammar. */
  def encodeScalarColumn(c: org.apache.spark.sql.Column,
      dataType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val tagged = dataType match {
      case BooleanType => concat(lit("bool:"), when(c, "True").otherwise("False"))
      case ByteType | ShortType | IntegerType | LongType => concat(lit("int:"), c.cast("string"))
      case FloatType | DoubleType => concat(lit("float:"), c.cast("string"))
      case StringType => c
      case other => throw new IllegalArgumentException(s"not a tagged scalar type: $other")
    }
    when(c.isNull, "null:").otherwise(tagged)
  }

  /** Row-major → column-major element order for a given shape (what
    * asfortranarray does before the reference encodes). */
  def toFortranOrder(shape: Seq[Int], rowMajor: Seq[Double]): Seq[Double] = {
    if (shape.size <= 1) return rowMajor
    val n = rowMajor.size
    val strides = shape.scanRight(1)(_ * _).tail // row-major strides
    (0 until n).map { fortranIdx =>
      // decompose fortranIdx in column-major, recompose row-major
      var rem = fortranIdx
      val coords = new Array[Int](shape.size)
      for (d <- shape.indices) { // fastest-varying first
        coords(d) = rem % shape(d)
        rem /= shape(d)
      }
      val rmIdx = coords.indices.map(d => coords(d) * strides(d)).sum
      rowMajor(rmIdx)
    }
  }
}
