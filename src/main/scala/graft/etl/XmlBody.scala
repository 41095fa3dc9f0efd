package graft.etl

import scala.xml.{Elem, Node, XML}

/** XML-carried protocol bodies (SURVEY §2: P13, F11, F13, F14, F18, F30;
  * `http_ingestor.py:215-357`, `http_ss7_ingestor.py:303-430`,
  * `http_ocs_ingestor.py:30-48,315-430`).
  *
  * The reference parses with xmltodict and walks dicts with a recursive
  * first-match key search; the analog here is scala.xml + a pre-order
  * label search (F12's XML twin). Malformed-attribute fixups (F11) are
  * applied as regex pre-passes before parsing.
  */
object XmlBody {

  /** P13: the OCS operation-type whitelist (17 types,
    * `http_ocs_ingestor.py:30-48`). A non-whitelisted root drops the
    * message entirely (`http_ocs_ingestor.py:322-323`). */
  val OcsOperationTypes: Set[String] = Set(
    "mo-acr-request", "mo-acr-response",
    "mo-idp-request", "mo-idp-response",
    "dest-change-request", "dest-change-response",
    "source-change-request-acr", "source-change-response-acr",
    "source-change-request-idp", "source-change-response-idp",
    "shadow-number-request", "shadow-number-response",
    "roaming_code",
    "volte-acr-request", "volte-acr-response",
    "volte-idp-request", "volte-idp-response")

  /** F11 fixups: strip malformed attribute fragments the reference
    * patches before xmltodict (`http_ingestor.py:216-217`), then parse.
    * None on unparseable bodies (quarantined upstream). */
  def parse(body: String): Option[Elem] = {
    if (body == null || body.trim.isEmpty) return None
    val fixed = body
      .replaceAll("""xmlns(:\w+)?="[^"]*"""", "") // namespace noise
      .replaceAll("&(?!(amp|lt|gt|quot|apos);)", "&amp;") // bare ampersands
    try Some(XML.loadString(fixed.trim))
    catch { case _: Exception => None }
  }

  /** Root element label = the operation type (P13 gate applies to OCS). */
  def rootType(e: Elem): String = e.label

  /** F12 (XML variant): pre-order first match of element label. */
  def findFirst(n: Node, label: String): Option[String] = {
    if (n.label == label) return Some(n.text)
    for (c <- n.child) {
      val r = findFirst(c, label)
      if (r.isDefined) return r
    }
    None
  }

  /** F13: the html-unescape the reference applies to msisdn-ish fields
    * (`http_ss7_ingestor.py:348-428`) — the entities that occur. */
  def htmlUnescape(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")

  /** F14: >32 chars ⇒ first 29 + "..." (`http_ss7_ingestor.py:372-373`). */
  def truncate32(s: String): String =
    if (s != null && s.length > 32) s.substring(0, 29) + "..." else s

  /** F18: "true" (case-insensitive) → true. */
  def boolFromString(s: String): Boolean = s != null && s.trim.toLowerCase == "true"

  /** F30 (SMPP-XML rule): commandId 5 ⇒ msisdn from sourceAddress,
    * commandId 4 ⇒ msisdn from destAddress (`http_ingestor.py:227-246`). */
  def smppXmlMsisdn(e: Elem): Option[String] = {
    findFirst(e, "commandId").flatMap(_.trim.toIntOption).flatMap {
      case 5 => findFirst(e, "sourceAddress")
      case 4 => findFirst(e, "destAddress")
      case _ => None
    }.map(m => htmlUnescape(m.trim))
  }

  /** F30 (Diameter-XML rule): resultCode with "null" ⇒ 0
    * (`http_ingestor.py:310-311`). */
  def diamXmlResultCode(e: Elem): Option[Long] =
    findFirst(e, "resultCode").map { v =>
      if (v.trim.isEmpty || v.trim.equalsIgnoreCase("null")) 0L
      else v.trim.toLongOption.getOrElse(0L)
    }
}
