package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.xml.Elem

/** One http_ocs message: HTTP envelope + the generic charging-field
  * extraction of `models.py:171-216`. Top-level (encoder requirement). */
final case class OcsMsg(
    framesList: String,
    firstFrame: Long,
    timeEpoch: Long,
    usecondsEpoch: Int,
    srcIp: String,
    srcPort: Int,
    dstIp: String,
    dstPort: Int,
    pcapFilename: String,
    tcpSequence: Long,
    tcpAcknowledge: Long,
    httpIsRequest: Boolean,
    httpRequestMethod: String,
    httpRequestUri: String,
    httpContentType: String,
    httpContentLength: Option[Int],
    httpResponseCode: Option[Int],
    opType: String,
    operationId: Option[Int],
    cdpa: String,
    tempCdpa: String,
    msisdn: String,
    rdn: String,
    periodDuration: Option[Int],
    callActive: Option[Boolean],
    startTime: String,
    endTime: String,
    status: String,
    statusCode: Option[Int],
    maxCallPeriodDuration: Option[Int],
    dtmfRoute: String,
    reqType: String,
    shadowNumber: String,
    called: String,
    calling: String,
    msrn: String,
    phone: String,
    code: Option[Int],
    result: Option[Int],
    dualNum: String,
    mcc: Option[Int],
    mnc: Option[Int],
    imsi: String)

/** http_ocs ingestion (`http_ocs_ingestor.py`): the same TCP pairing as
  * http_ss7, a 17-entry operation-type whitelist (P13 — a miss DROPS the
  * message, `http_ocs_ingestor.py:322-323`), and one generic 25-field
  * extraction applied to every whitelisted type
  * (`http_ocs_ingestor.py:327-458` → `models.py:171-216`).
  */
object HttpOcs {

  /** xmltodict direct-access analog (see [[HttpSs7]]): plain string only
    * when the element has neither attributes nor child elements. */
  private def childPlain(e: Elem, name: String): Option[String] =
    (e \ name).headOption
      .filter(c => c.attributes.isEmpty && !c.child.exists(_.isInstanceOf[Elem]))
      .map(_.text)

  private def childInt(e: Elem, name: String): Option[Int] =
    childPlain(e, name).flatMap(_.trim.toIntOption)

  /** Generic extraction (`http_ocs_ingestor.py:256-461`): every field is
    * best-effort (missing/unparseable → null), the root must be one of
    * the 17 whitelisted operation types or the message is dropped.
    * `starttime` may repeat — the first occurrence wins
    * (`http_ocs_ingestor.py:366-373`). */
  def extract(m: HttpMsg): Option[OcsMsg] = {
    def base = OcsMsg(m.framesList, m.firstFrame, m.timeEpoch, m.usecondsEpoch,
      m.srcIp, m.srcPort, m.dstIp, m.dstPort, m.pcapFilename,
      m.tcpSequence, m.tcpAcknowledge, m.httpIsRequest,
      if (m.httpIsRequest) m.method else null,
      if (m.httpIsRequest) m.uri else null,
      if (m.httpIsRequest && m.contentType.nonEmpty) m.contentType else null,
      m.contentLength, m.responseCode,
      null, None, null, null, null, null, None, None, null, null, null,
      None, None, null, null, null, null, null, null, null, None, None,
      null, None, None, null)
    if (m.bodyType != "content") return Some(base.copy(opType = m.bodyType))
    XmlBody.parse(m.body) match {
      case None => None
      case Some(e) =>
        if (!XmlBody.OcsOperationTypes.contains(e.label)) None // P13 gate
        else Some(base.copy(
          opType = e.label,
          operationId = e.attribute("id").map(_.text.trim).flatMap(_.toIntOption),
          cdpa = childPlain(e, "cdpa").orNull,
          tempCdpa = childPlain(e, "temp_cdpa").orNull,
          msisdn = childPlain(e, "msisdn").orNull,
          rdn = childPlain(e, "rdn").orNull,
          periodDuration = childInt(e, "periodduration"),
          callActive = childPlain(e, "callactive").map(_.toLowerCase == "true"),
          startTime = childPlain(e, "starttime").orNull,
          endTime = childPlain(e, "endtime").orNull,
          status = childPlain(e, "status").orNull,
          statusCode = childInt(e, "status_code"),
          maxCallPeriodDuration = childInt(e, "maxcallperiodduration"),
          dtmfRoute = childPlain(e, "dtmf_route").orNull,
          reqType = childPlain(e, "req_type").orNull,
          shadowNumber = childPlain(e, "shadow_number").orNull,
          called = childPlain(e, "called").orNull,
          calling = childPlain(e, "calling").orNull,
          msrn = childPlain(e, "msrn").orNull,
          phone = childPlain(e, "phone").orNull,
          code = childInt(e, "code"),
          result = childInt(e, "result"),
          dualNum = childPlain(e, "dual_num").orNull,
          mcc = childInt(e, "mcc"),
          mnc = childInt(e, "mnc"),
          imsi = childPlain(e, "imsi").orNull))
    }
  }

  private val FillCols = Seq("msisdn", "called", "calling", "phone", "imsi")

  private val Extras = Seq("opType", "operationId", "cdpa", "msisdn", "rdn",
    "periodDuration", "callActive", "startTime", "endTime", "status",
    "statusCode", "maxCallPeriodDuration", "dtmfRoute", "reqType",
    "shadowNumber", "called", "calling", "msrn", "phone", "code", "result",
    "tempCdpa", "dualNum", "mcc", "mnc", "imsi")

  /** Full pipeline: pcap → TCP reassembly → HTTP parse → whitelisted
    * generic extraction → R4 pairing with bidirectional
    * msisdn/called/calling/phone/imsi exchange → the http_ocs table
    * (`models.py:171-216`). */
  def records(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val msgs = Http.messages(spark, path).flatMap(extract _)
    val paired = HttpSs7.pairAndEnrich(msgs.toDF(), FillCols,
      HttpSs7.Envelope ++ Extras)
    HttpSs7.unpivot(paired, Extras)
      .withColumnRenamed("op_type", "type")
  }
}
