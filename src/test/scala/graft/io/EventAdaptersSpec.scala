package graft.io

import org.scalatest.funsuite.AnyFunSuite

import EventAdapters._

/** S5/S6 ingestion adapters: request triage + multipart parsing exactly as
  * the reference handler does it (handler.py:57-187), and the Cognito
  * event round-trip (datatypes.py:27-52).
  */
class EventAdaptersSpec extends AnyFunSuite {

  private val boundary = "x1"
  private def multipart(parts: (String, String)*): String =
    parts.map { case (n, v) =>
      s"""--$boundary\r\nContent-Disposition: form-data; name="$n"\r\n\r\n$v\r\n"""
    }.mkString + s"--$boundary--\r\n"

  private def post(path: String, body: String): String =
    s"POST $path HTTP/1.1\r\n" +
      s"Content-Type: multipart/form-data; boundary=$boundary\r\n\r\n" + body

  test("valid multipart POST parses into the reference work-item shape") {
    val req = post("/prod/ingest", multipart("bucket" -> "stpubdata", "filepath" -> "/tmp/x"))
    val item = parseHttp(req, "post", "prod", "/ingest")
    assert(item == HttpWorkItem("post", "/ingest", 200,
      Map("bucket" -> "stpubdata", "filepath" -> "/tmp/x")))
  }

  test("file parts carry <name> and <name>.content-type entries") {
    val body =
      s"""--$boundary\r\nContent-Disposition: form-data; name="data"; filename="a.fits"\r\nContent-Type: image/fits\r\n\r\nBYTES\r\n""" +
        s"--$boundary--\r\n"
    val item = parseHttp(post("/prod/ingest", body), "post", "prod", "/ingest")
    assert(item.status == 200)
    assert(item.postContents == Map("data" -> "BYTES", "data.content-type" -> "image/fits"))
  }

  test("method mismatch → 405, path mismatch → 400, non-multipart POST → 415") {
    assert(parseHttp("GET /prod/ingest HTTP/1.1\r\n\r\n", "post", "prod", "/ingest").status == 405)
    assert(parseHttp(post("/prod/other", multipart("a" -> "b")), "post", "prod", "/ingest").status == 400)
    val plain = "POST /prod/ingest HTTP/1.1\r\nContent-Type: application/json\r\n\r\n{}"
    assert(parseHttp(plain, "post", "prod", "/ingest").status == 415)
  }

  test("GET on the bound route yields an empty-contents work item (handler.py:59-63)") {
    val item = parseHttp("GET /prod/status HTTP/1.1\r\n\r\n", "get", "prod", "/status")
    assert(item == HttpWorkItem("get", "/status", 200, Map.empty))
  }

  test("cognito event JSON round-trips through the schema to flattened seed columns") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(("alice", "+120555", "a@example.com")).toDF("u", "p", "e")
      .select(cognitoEventJson(lit("us-east-1"), lit("pool"), lit("cli"),
        col("u"), col("e"), col("u"), col("p")).as("event"))
    val row = cognitoSeed(events, "event").collect().head
    assert(row.getAs[String]("trigger_source") == "PostAuthentication_Authentication")
    assert(row.getAs[String]("user_name") == "alice")
    assert(row.getAs[String]("email") == "a@example.com")
    assert(row.getAs[String]("user_status") == "CONFIRMED")
    assert(row.getAs[String]("phone_number") == "+120555")
    assert(row.getAs[String]("email_verified") == "true")
  }
}
