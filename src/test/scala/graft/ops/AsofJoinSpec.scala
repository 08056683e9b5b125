package graft.ops

import graft.SparkSpec
import graft.io.Seeds

/** AsofJoin edge semantics: <= inclusivity, no-prior-match nulls, key
  * isolation. (The scale query q_asof_join is gated against DuckDB's
  * native ASOF JOIN — this covers the corners cheaply.)
  */
class AsofJoinSpec extends SparkSpec {

  private def df(rows: Seq[Map[String, Any]]) = Seeds.fromMaps(spark, rows)

  test("picks the latest right row at or before left time, per key") {
    val left = df(Seq(
      Map("k" -> "a", "t" -> 10, "l" -> "L1"),
      Map("k" -> "a", "t" -> 20, "l" -> "L2"),
      Map("k" -> "b", "t" -> 15, "l" -> "L3")))
    val right = df(Seq(
      Map("k" -> "a", "rt" -> 5, "rv" -> "R5"),
      Map("k" -> "a", "rt" -> 10, "rv" -> "R10"), // ties with L1: inclusive
      Map("k" -> "a", "rt" -> 18, "rv" -> "R18"),
      Map("k" -> "b", "rt" -> 99, "rv" -> "R99"))) // after L3: no match
    val out = AsofJoin.asof(left, right, "k", "t", "rt", Map("rv" -> "last_rv"))
      .collect().map(r => (r.getAs[String]("l"), r.getAs[String]("last_rv"))).toMap
    assert(out("L1") == "R10") // inclusive <=
    assert(out("L2") == "R18") // latest preceding
    assert(out("L3") == null)  // nothing at or before, other key invisible
  }

  test("left rows keep all their columns") {
    val left = df(Seq(Map("k" -> "a", "t" -> 10, "x" -> 1, "y" -> "z")))
    val right = df(Seq(Map("k" -> "a", "rt" -> 1, "rv" -> 7)))
    val row = AsofJoin.asof(left, right, "k", "t", "rt", Map("rv" -> "rv")).collect().head
    assert(row.getAs[Long]("x") == 1L && row.getAs[String]("y") == "z"
      && row.getAs[Long]("rv") == 7L)
  }

  test("forward direction picks the NEXT right row at or after left time") {
    val left = df(Seq(
      Map("k" -> "a", "t" -> 10, "l" -> "L1"),
      Map("k" -> "a", "t" -> 20, "l" -> "L2"),
      Map("k" -> "b", "t" -> 15, "l" -> "L3")))
    val right = df(Seq(
      Map("k" -> "a", "rt" -> 10, "rv" -> "R10"), // ties with L1: inclusive
      Map("k" -> "a", "rt" -> 18, "rv" -> "R18"),
      Map("k" -> "b", "rt" -> 3, "rv" -> "R3")))  // before L3: no match
    val out = AsofJoin.asof(left, right, "k", "t", "rt", Map("rv" -> "next_rv"),
        direction = "forward")
      .collect().map(r => (r.getAs[String]("l"), r.getAs[String]("next_rv"))).toMap
    assert(out("L1") == "R10") // inclusive >=
    assert(out("L2") == null)  // nothing at or after
    assert(out("L3") == null)
  }

  test("tolerance nulls out matches beyond the bound, keeps close ones") {
    import org.apache.spark.sql.functions.lit
    val left = df(Seq(
      Map("k" -> "a", "t" -> 100, "l" -> "L1"),  // match at 95: diff 5, kept
      Map("k" -> "a", "t" -> 200, "l" -> "L2"))) // match at 95: diff 105, dropped
    val right = df(Seq(Map("k" -> "a", "rt" -> 95, "rv" -> "R95")))
    val out = AsofJoin.asof(left, right, "k", "t", "rt", Map("rv" -> "rv"),
        tolerance = Some((lt, rt) => lt - rt <= lit(10L)))
      .collect().map(r => (r.getAs[String]("l"), r.getAs[String]("rv"))).toMap
    assert(out("L1") == "R95")
    assert(out("L2") == null)
  }

  test("rejects bad direction and reserved carry name") {
    val a = df(Seq(Map("k" -> "a", "t" -> 1)))
    val b = df(Seq(Map("k" -> "a", "rt" -> 1, "rv" -> 1)))
    intercept[IllegalArgumentException] {
      AsofJoin.asof(a, b, "k", "t", "rt", Map("rv" -> "rv"), direction = "sideways")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(a, b, "k", "t", "rt", Map("rv" -> "__rt"))
    }
  }

  test("carried columns come atomically from ONE right row; NULL fields stay NULL") {
    import spark.implicits._
    // latest right row (rt=8) has rv2 = NULL; an older row (rt=5) has rv2 set.
    // Per-column carry would back-fill rv2 from rt=5, mixing two right rows.
    val left = Seq(("a", 10)).toDF("k", "t")
    val right = Seq(
      ("a", 5, Option("old1"), Option("old2")),
      ("a", 8, Option("new1"), None: Option[String])
    ).toDF("k", "rt", "rv1", "rv2")
    val row = AsofJoin.asof(left, right, "k", "t", "rt",
      Map("rv1" -> "rv1", "rv2" -> "rv2")).collect().head
    assert(row.getAs[String]("rv1") == "new1")
    assert(row.getAs[String]("rv2") == null) // from rt=8, not back-filled
  }
}
