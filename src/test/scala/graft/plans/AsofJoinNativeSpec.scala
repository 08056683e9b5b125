package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec
import graft.ops.AsofJoin

/** The native as-of exec must be indistinguishable from the composition
  * path (ops.AsofJoin backward mode) on every input, including the ugly
  * ones: null times, null keys, ties, keys on one side only, empty sides.
  */
class AsofJoinNativeSpec extends SparkSpec with TableDrivenPropertyChecks {

  import scala.jdk.CollectionConverters._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val leftSchema = StructType(Seq(
    StructField("k", LongType), StructField("lt", TimestampType),
    StructField("lv", StringType)))
  private val rightSchema = StructType(Seq(
    StructField("k", LongType), StructField("rt", TimestampType),
    StructField("rv", StringType)))

  private def mkLeft(rows: Seq[(java.lang.Long, java.lang.Long, String)]) =
    spark.createDataFrame(
      rows.map { case (k, t, v) =>
        Row(k, if (t == null) null else ts(t.longValue), v) }.asJava, leftSchema)

  private def mkRight(rows: Seq[(java.lang.Long, java.lang.Long, String)]) =
    spark.createDataFrame(
      rows.map { case (k, t, v) =>
        Row(k, if (t == null) null else ts(t.longValue), v) }.asJava, rightSchema)

  private def both(left: Seq[(java.lang.Long, java.lang.Long, String)],
                   right: Seq[(java.lang.Long, java.lang.Long, String)]) = {
    val l = mkLeft(left)
    val r = mkRight(right)
    val carried = Map("rv" -> "rv_out", "rt" -> "rt_out")
    val native = AsofJoinNative.asof(l, r, "k", "lt", "rt", carried)
    val composed = AsofJoin.asof(l, r, "k", "lt", "rt", carried)
    (native, composed)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("native ≡ composition on a hand-picked edge-case table") {
    val cases = Table(
      ("left", "right"),
      // plain backward matches incl. boundary-equal time
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 10L: java.lang.Long, "a"),
        (1L, 20L, "b"), (2L, 15L, "c")),
       Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 10L: java.lang.Long, "r1"),
        (1L, 15L, "r2"), (2L, 16L, "r3"))),
      // left-only and right-only keys
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 10L: java.lang.Long, "a"), (3L, 10L, "b")),
       Seq[(java.lang.Long, java.lang.Long, String)](
        (2L: java.lang.Long, 5L: java.lang.Long, "r1"))),
      // null left time (no match), null right time (skipped)
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, null, "a"), (1L, 10L, "b")),
       Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, null, "rX"), (1L, 5L, "r1"))),
      // null keys group together (composition semantics)
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (null, 10L: java.lang.Long, "a"), (1L, 10L, "b")),
       Seq[(java.lang.Long, java.lang.Long, String)](
        (null, 5L: java.lang.Long, "rN"), (1L, 5L, "r1"))),
      // empty right
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 10L: java.lang.Long, "a")),
       Seq.empty[(java.lang.Long, java.lang.Long, String)]),
      // all right rows AFTER all left rows (nothing matches)
      (Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 10L: java.lang.Long, "a")),
       Seq[(java.lang.Long, java.lang.Long, String)](
        (1L: java.lang.Long, 20L: java.lang.Long, "r1"))))
    forAll(cases) { (l, r) =>
      val (native, composed) = both(l, r)
      assert(canon(native) == canon(composed))
    }
  }

  test("native ≡ composition on randomized data (fixed seed, 500×200 rows)") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(500)((
      java.lang.Long.valueOf(rnd.nextInt(20).toLong),
      java.lang.Long.valueOf(rnd.nextInt(1000).toLong),
      s"l${rnd.nextInt(100)}"))
    // unique (key, time) right rows: ties are resolved engine-arbitrarily
    // in BOTH implementations, so determinism requires the same
    // pre-aggregation the gated queries use
    val right = Seq.fill(200)((
      java.lang.Long.valueOf(rnd.nextInt(20).toLong),
      java.lang.Long.valueOf(rnd.nextInt(1000).toLong),
      s"r${rnd.nextInt(100)}"))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val (native, composed) = both(left, right)
    assert(canon(native) == canon(composed))
  }

  test("forward direction ≡ composition on randomized data") {
    val rnd = new scala.util.Random(7)
    val left = Seq.fill(400)((
      java.lang.Long.valueOf(rnd.nextInt(15).toLong),
      java.lang.Long.valueOf(rnd.nextInt(800).toLong),
      s"l${rnd.nextInt(50)}"))
    val right = Seq.fill(150)((
      java.lang.Long.valueOf(rnd.nextInt(15).toLong),
      java.lang.Long.valueOf(rnd.nextInt(800).toLong),
      s"r${rnd.nextInt(50)}"))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = mkLeft(left)
    val r = mkRight(right)
    val carried = Map("rv" -> "rv_out", "rt" -> "rt_out")
    val native = AsofJoinNative.asof(l, r, "k", "lt", "rt", carried,
      direction = "forward")
    val composed = AsofJoin.asof(l, r, "k", "lt", "rt", carried,
      direction = "forward")
    assert(canon(native) == canon(composed))
  }

  test("tolerance ≡ composition tolerance, both directions") {
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(300)((
      java.lang.Long.valueOf(rnd.nextInt(10).toLong),
      java.lang.Long.valueOf(rnd.nextInt(500).toLong),
      s"l${rnd.nextInt(50)}"))
    val right = Seq.fill(120)((
      java.lang.Long.valueOf(rnd.nextInt(10).toLong),
      java.lang.Long.valueOf(rnd.nextInt(500).toLong),
      s"r${rnd.nextInt(50)}"))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val l = mkLeft(left)
    val r = mkRight(right)
    val carried = Map("rv" -> "rv_out", "rt" -> "rt_out")
    val tolMicros = 60L * 1000000L // 60 s in timestamp-internal micros
    for (dir <- Seq("backward", "forward")) {
      val native = AsofJoinNative.asof(l, r, "k", "lt", "rt", carried,
        direction = dir, toleranceUnits = Some(tolMicros))
      val sign: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column =
        if (dir == "backward") (lt, rt) => unix_micros(lt) - unix_micros(rt) <= lit(tolMicros)
        else (lt, rt) => unix_micros(rt) - unix_micros(lt) <= lit(tolMicros)
      val composed = AsofJoin.asof(l, r, "k", "lt", "rt", carried,
        direction = dir, tolerance = Some(sign))
      assert(canon(native) == canon(composed), s"direction=$dir")
    }
  }

  test("native ≡ composition across AQE coalescing regimes and partition counts") {
    val rnd = new scala.util.Random(99)
    val left = Seq.fill(300)((
      java.lang.Long.valueOf(rnd.nextInt(12).toLong),
      java.lang.Long.valueOf(rnd.nextInt(600).toLong),
      s"l${rnd.nextInt(40)}"))
    val right = Seq.fill(100)((
      java.lang.Long.valueOf(rnd.nextInt(12).toLong),
      java.lang.Long.valueOf(rnd.nextInt(600).toLong),
      s"r${rnd.nextInt(40)}"))
      .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
    val carried = Map("rv" -> "rv_out", "rt" -> "rt_out")
    val expected = canon(AsofJoin.asof(mkLeft(left), mkRight(right),
      "k", "lt", "rt", carried))
    val regimes = Seq(
      // AQE on + aggressive coalescing (both exchanges must coalesce in
      // lockstep or zipPartitions would see mismatched partition counts)
      Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "13"),
      // AQE off at an odd partition count
      Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "13"),
      Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "1"))
    val saved = regimes.flatMap(_.keys).distinct
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      for (conf <- regimes) {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val got = canon(AsofJoinNative.asof(mkLeft(left), mkRight(right),
          "k", "lt", "rt", carried))
        assert(got == expected, s"divergence under $conf")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("self-join (same source both sides) does not collide attributes") {
    val ev = mkLeft(Seq(
      (1L: java.lang.Long, 10L: java.lang.Long, "a"),
      (1L, 20L, "b"), (2L, 5L, "c")))
    val out = AsofJoinNative.asof(ev, ev.toDF("k", "rt", "rv"),
      "k", "lt", "rt", Map("rv" -> "prev_v"))
    assert(out.count() == 3)
    val row = out.filter(col("lv") === "b").collect().head
    assert(row.getAs[String]("prev_v") == "b") // <=, boundary-equal self
  }

  test("plan: one exchange per side, per-partition sorts, AsofJoinExec node") {
    val l = mkLeft(Seq((1L: java.lang.Long, 10L: java.lang.Long, "a")))
    val r = mkRight(Seq((1L: java.lang.Long, 5L: java.lang.Long, "r")))
    val df = AsofJoinNative.asof(l, r, "k", "lt", "rt", Map("rv" -> "rv_out"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native exec not planned:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected exactly one hash exchange per side:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to the window form")
  }

  test("unmatched rows are NULL even when right columns are non-nullable") {
    // tuples → non-nullable long columns; the result projection must bind
    // the right side as nullable or the no-match row silently emits the
    // type default (0 / epoch) instead of NULL
    import spark.implicits._
    val l = Seq((1L, 100L, "a"), (2L, 100L, "b")).toDF("k", "lt", "lv")
    val r = Seq((1L, 50L, 7L)).toDF("k", "rt", "rv")
    assert(!r.schema("rv").nullable, "fixture must be non-nullable to bite")
    val out = AsofJoinNative.asof(l, r, "k", "lt", "rt",
      Map("rv" -> "rv_out", "rt" -> "rt_out"))
    val unmatched = out.filter(col("k") === 2).collect().head
    assert(unmatched.isNullAt(unmatched.fieldIndex("rv_out")),
      s"unmatched carried value must be NULL, got $unmatched")
    assert(unmatched.isNullAt(unmatched.fieldIndex("rt_out")))
    val matched = out.filter(col("k") === 1).collect().head
    assert(matched.getAs[Long]("rv_out") == 7L)
  }

  test("rejects mismatched or unsupported time types") {
    val l = mkLeft(Seq((1L: java.lang.Long, 10L: java.lang.Long, "a")))
    intercept[IllegalArgumentException] {
      AsofJoinNative.asof(l, l.withColumn("rt", col("lv")), "k", "lt", "rt", Map())
    }
  }

  test("rejects float keys (hash normalization) and clashing carried names") {
    val l = mkLeft(Seq((1L: java.lang.Long, 10L: java.lang.Long, "a")))
    val lf = l.withColumn("k", col("k").cast("double"))
    intercept[IllegalArgumentException] {
      AsofJoinNative.asof(lf, lf.toDF("k", "rt", "rv"), "k", "lt", "rt", Map())
    }
    intercept[IllegalArgumentException] { // "lv" already exists on the left
      AsofJoinNative.asof(l, l.toDF("k", "rt", "rv"), "k", "lt", "rt",
        Map("rv" -> "lv"))
    }
  }

  test("stats above the node are additive, not a cross-join-shaped product") {
    val l = mkLeft(Seq((1L: java.lang.Long, 10L: java.lang.Long, "a")))
    val r = mkRight(Seq((1L: java.lang.Long, 5L: java.lang.Long, "r")))
    val df = AsofJoinNative.asof(l, r, "k", "lt", "rt", Map("rv" -> "rv_out"))
    val node = df.queryExecution.optimizedPlan.collect {
      case p: AsofJoinPlan => p }.head
    assert(node.stats.sizeInBytes ==
      node.left.stats.sizeInBytes + node.right.stats.sizeInBytes)
  }
}
