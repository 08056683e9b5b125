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
    case s: String => s
    case other =>
      throw new IllegalArgumentException(s"not a tagged scalar: ${other.getClass}")
  }

  /** Decode the tag grammar; untagged input is a raw string (matches
    * decode_aws_object's fall-through, base.py:146-153). Python ints are
    * arbitrary-precision, so 'int:' decodes to BigInt and callers narrow
    * explicitly (documented Long-overflow divergence, SURVEY §7.4).
    */
  def decodeScalar(s: String): Any = s match {
    case "null:" => null
    case "bool:True" => true
    case "bool:False" => false
    case _ if s.startsWith("int:") => BigInt(s.substring(4))
    case _ if s.startsWith("float:") => s.substring(6).toDouble
    case _ => s
  }

  // ---------------------------------------------------------------- tensors

  /** Canonical tensor value: shape + dtype + the flat buffer in
    * COLUMN-MAJOR (Fortran) element order, exactly the reference's ndarray
    * wire layout (numpy.py:117-122 encodes via asfortranarray). In a
    * DataFrame this is a StructType(shape: array<int>, dtype: string,
    * data: array<double>) column — the "multimodal/tensor column".
    */
  final case class Tensor(shape: Seq[Int], dtype: String, data: Seq[Double]) {
    require(shape.product == data.size || (shape.isEmpty && data.size == 1),
      s"shape ${shape.mkString("x")} incompatible with ${data.size} elements")
  }

  private val b64e = Base64.getEncoder
  private val b64d = Base64.getDecoder

  /** Encode to the reference wire string 'np.ndarray:<shape-csv>:<dtype>:<b64>'. */
  def encodeTensor(t: Tensor): String = {
    val buf = t.dtype match {
      case "float32" =>
        val bb = ByteBuffer.allocate(4 * t.data.size).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(d => bb.putFloat(d.toFloat)); bb.array()
      case "float64" =>
        val bb = ByteBuffer.allocate(8 * t.data.size).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(bb.putDouble); bb.array()
      case "int32" =>
        val bb = ByteBuffer.allocate(4 * t.data.size).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(d => bb.putInt(d.toInt)); bb.array()
      case "int64" =>
        val bb = ByteBuffer.allocate(8 * t.data.size).order(ByteOrder.LITTLE_ENDIAN)
        t.data.foreach(d => bb.putLong(d.toLong)); bb.array()
      case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
    }
    s"np.ndarray:${t.shape.mkString(",")}:${t.dtype}:${b64e.encodeToString(buf)}"
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
    val data = dtype match {
      case "float32" => Iterator.continually(bb).takeWhile(_.hasRemaining).map(_.getFloat.toDouble).toSeq
      case "float64" => Iterator.continually(bb).takeWhile(_.hasRemaining).map(_.getDouble).toSeq
      case "int32" => Iterator.continually(bb).takeWhile(_.hasRemaining).map(_.getInt.toDouble).toSeq
      case "int64" => Iterator.continually(bb).takeWhile(_.hasRemaining).map(_.getLong.toDouble).toSeq
      case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
    }
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
