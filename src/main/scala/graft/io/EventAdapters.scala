package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-event ingestion adapters — the reference's two "thin" sources
  * (SURVEY §2.1 S5/S6): the HTTP webservice handler
  * (/root/reference/bert/webservice/handler.py:57-187) and the Cognito
  * trigger events (/root/reference/bert/runner/datatypes.py:9-88). Both
  * reduce, on Spark, to "a batch/stream of external event records → a seed
  * DataFrame for the first pipeline stage" — the webserver/IdP themselves
  * stay outside the engine (as they do in the reference, where Lambda/
  * socketserver hand items to the work queue).
  *
  * S5 (HTTP): the reference parses a raw request, validates method+path
  * (405 / 400 / 200: handler.py:68-80,100-112), and for POST unpacks
  * multipart/form-data parts into `post-contents`; the work item it
  * enqueues is {'method', 'route', 'post-contents'} (handler.py:59-63,
  * 153-160). [[EventAdapters.httpWorkItems]] reproduces exactly that
  * contract over a Dataset[String] of raw request texts. Request parsing is
  * genuinely per-record imperative (multipart boundaries are data-
  * dependent), so this is a typed Dataset.map — an ingest-edge adapter that
  * runs once per event at the boundary, never in the relational hot path,
  * and partitions embarrassingly (no shuffle, no state).
  *
  * S6 (Cognito): trigger events are fixed-schema JSON; the adapter is pure
  * Catalyst — from_json with the event schema + a flattening select. The
  * builder side ([[EventAdapters.cognitoEventJson]]) emits the reference's
  * POST_AUTHENTICATION payload shape (datatypes.py:27-52) with to_json, so
  * fixtures/tests can round-trip engine-side only.
  */
object EventAdapters {

  /** The reference work-item shape, one per HTTP request. `status` carries
    * the handler's triage: 200 parsed, 405 method mismatch, 400 path
    * mismatch (handler.py:68-80). Multipart file parts contribute two map
    * entries — `<name>` → content and `<name>.content-type` — mirroring
    * the reference's nested {'content-type', 'content'} dict
    * (handler.py:139-143).
    */
  final case class HttpWorkItem(
      method: String,
      route: String,
      status: Int,
      postContents: Map[String, String])

  /** Parse raw HTTP request texts into work items, validating against the
    * one (method, stage, route) the API serves — serve_handler binds
    * exactly one route (handler.py:169-187).
    */
  def httpWorkItems(
      spark: SparkSession,
      raw: Dataset[String],
      expectMethod: String,
      stage: String,
      route: String): DataFrame = {
    import spark.implicits._
    raw.map(parseHttp(_, expectMethod.toLowerCase, stage, route)).toDF()
  }

  private[io] def parseHttp(
      request: String,
      expectMethod: String,
      stage: String,
      route: String): HttpWorkItem = {
    val (head, body) = request.indexOf("\r\n\r\n") match {
      case -1 => (request, "")
      case i => (request.substring(0, i), request.substring(i + 4))
    }
    val lines = head.split("\r\n")
    val requestLine = lines.headOption.getOrElse("").split(" ")
    val method = requestLine.headOption.getOrElse("").toLowerCase
    val path = if (requestLine.length > 1) requestLine(1) else ""
    val headers = lines.drop(1).flatMap { l =>
      l.split(":", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _ => None
      }
    }.toMap
    val fullPath = s"/$stage$route"
    if (method != expectMethod) HttpWorkItem(method, route, 405, Map.empty)
    // The reference lowercases the ENTIRE request line before comparing
    // (handler.py:101), so 'POST /PROD/Ingest' routes when stage/route are
    // lowercase; compare the lowercased incoming path against fullPath
    // as constructed (an uppercase stage/route never matches there either).
    else if (path.toLowerCase != fullPath) HttpWorkItem(method, route, 400, Map.empty)
    else if (method == "get") HttpWorkItem(method, route, 200, Map.empty)
    else {
      val ct = headers.getOrElse("Content-Type", "")
      if (!ct.startsWith("multipart/form-data"))
        HttpWorkItem(method, route, 415, Map.empty) // reference raises here
      else {
        val boundary = ct.split(";").map(_.trim)
          .collectFirst { case p if p.startsWith("boundary=") =>
            p.stripPrefix("boundary=").stripPrefix("\"").stripSuffix("\"")
          }.getOrElse("")
        val parts = body.split(java.util.regex.Pattern.quote(s"--$boundary"))
          .filter(p => p.nonEmpty && p != "--\r\n" && p.trim != "--")
        val contents = parts.flatMap { part =>
          part.stripPrefix("\r\n").stripSuffix("\r\n")
            .split("\r\n\r\n", 2) match {
            case Array(ph, pb) =>
              val phMap = ph.split("\r\n").flatMap { l =>
                l.split(":", 2) match {
                  case Array(k, v) => Some(k.trim -> v.trim)
                  case _ => None
                }
              }.toMap
              phMap.get("Content-Disposition").toSeq.flatMap { cd =>
                val props = cd.split(";").drop(1).flatMap { prop =>
                  prop.trim.split("=", 2) match {
                    case Array(k, v) => Some(k.trim -> v.trim.stripPrefix("\"").stripSuffix("\""))
                    case _ => None
                  }
                }.toMap
                props.get("name") match {
                  case Some(n) if props.contains("filename") =>
                    Seq(n -> pb) ++ phMap.get("Content-Type").map(t => s"$n.content-type" -> t)
                  // Reference keeps a filename-less part only when name is
                  // the SOLE Content-Disposition property (handler.py:145's
                  // len(properties)==1); extra properties drop the part.
                  case Some(n) if props.size == 1 => Seq(n -> pb)
                  case _ => Seq.empty
                }
              }
            case _ => Seq.empty
          }
        }.toMap
        HttpWorkItem(method, route, 200, contents)
      }
    }
  }

  // ---------------------------------------------------------------- S6

  /** Schema of the POST_AUTHENTICATION trigger payload the adapter parses
    * (datatypes.py:27-52; attribute keys with ':' are quoted on access).
    */
  val cognitoSchema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("triggerSource", StringType),
    StructField("region", StringType),
    StructField("userPoolId", StringType),
    StructField("userName", StringType),
    StructField("callerContext", StructType(Seq(
      StructField("awsSdkVersion", StringType),
      StructField("clientId", StringType)))),
    StructField("request", StructType(Seq(
      StructField("userAttributes", MapType(StringType, StringType)),
      StructField("newDeviceUsed", BooleanType))))))

  /** Build one POST_AUTHENTICATION event as a JSON column (the
    * CognitoEvent.trigger_content analog, engine-side via to_json).
    */
  def cognitoEventJson(
      region: Column, userPoolId: Column, clientId: Column,
      username: Column, email: Column, name: Column,
      phone: Column): Column =
    to_json(struct(
      lit("1").as("version"),
      lit("PostAuthentication_Authentication").as("triggerSource"),
      region.as("region"),
      userPoolId.as("userPoolId"),
      username.as("userName"),
      struct(
        lit("aws-sdk-unknown-unknown").as("awsSdkVersion"),
        clientId.as("clientId")).as("callerContext"),
      struct(
        map(
          lit("sub"), username,
          lit("email_verified"), lit("true"),
          lit("cognito:user_status"), lit("CONFIRMED"),
          lit("cognito:email_alias"), email,
          lit("name"), name,
          lit("phone_number_verified"), lit("false"),
          lit("phone_number"), phone,
          lit("email"), email).as("userAttributes"),
        lit(false).as("newDeviceUsed")).as("request")))

  /** Parse a column of trigger-event JSON into the flattened seed columns
    * the first stage consumes. Pure from_json + field access (codegen'd).
    */
  def cognitoSeed(events: DataFrame, jsonCol: String): DataFrame = {
    val e = from_json(col(jsonCol), cognitoSchema)
    events.select(
      e.getField("triggerSource").as("trigger_source"),
      e.getField("userPoolId").as("user_pool_id"),
      e.getField("userName").as("user_name"),
      e.getField("request").getField("userAttributes").getItem("email").as("email"),
      e.getField("request").getField("userAttributes").getItem("cognito:user_status").as("user_status"),
      e.getField("request").getField("userAttributes").getItem("email_verified").as("email_verified"),
      e.getField("request").getField("userAttributes").getItem("phone_number").as("phone_number"),
      e.getField("request").getField("userAttributes").getItem("name").as("name"))
  }
}
