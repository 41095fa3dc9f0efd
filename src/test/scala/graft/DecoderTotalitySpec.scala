package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Diameter, GsmMap, Gtp, Http, Packets, Sip, Smpp, XmlBody}
import graft.sources.{Frame, Pcap}

/** Totality fuzz for every binary/text decoder in the ingest path: on
  * ARBITRARY input — pure random bytes, and valid captures with random
  * bit flips / truncations — a decoder must return its quarantine value
  * (empty / None), never throw. At fleet scale a single corrupt blob
  * that throws fails its task, its retries, and then the whole job; the
  * reference survives the same inputs because tshark quarantines per
  * packet (`models.py` not_processed counters). The structured
  * mutations matter more than the random bytes: a flipped length field
  * inside an otherwise-valid file walks the deep paths random bytes
  * never reach.
  */
class DecoderTotalitySpec extends AnyFunSuite {

  private var s = org.scalacheck.rng.Seed(2026L)
  private def gen[A](g: Gen[A]): A = {
    val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v
  }
  private def randBytes(max: Int): Array[Byte] = {
    val n = gen(Gen.chooseNum(0, max))
    Array.fill(n)(gen(Gen.chooseNum(-128, 127)).toByte)
  }
  /** Flip up to 4 random bytes and maybe truncate at a random point. */
  private def mutate(valid: Array[Byte]): Array[Byte] = {
    val b = valid.clone()
    if (b.nonEmpty) {
      for (_ <- 0 until gen(Gen.chooseNum(1, 4))) {
        val i = gen(Gen.chooseNum(0, b.length - 1))
        b(i) = gen(Gen.chooseNum(-128, 127)).toByte
      }
      if (gen(Gen.prob(0.5))) java.util.Arrays.copyOfRange(b, 0, gen(Gen.chooseNum(0, b.length)))
      else b
    } else b
  }

  private def ethIpv4Tcp(payload: Array[Byte]): Array[Byte] = {
    import TestBytes._
    cat(Array.fill[Byte](12)(0), be16(0x0800),
      ethPayloadIpv4Tcp(payload))
  }
  // Minimal IPv4+TCP header pair around a payload (IHL 5, data offset 5).
  private def ethPayloadIpv4Tcp(payload: Array[Byte]): Array[Byte] = {
    import TestBytes._
    val totalLen = 20 + 20 + payload.length
    cat(Array[Byte](0x45, 0), be16(totalLen), be16(1), be16(0),
      Array[Byte](64, 6), be16(0), Array[Byte](10, 0, 0, 1), Array[Byte](10, 0, 0, 2),
      be16(3868), be16(40000), be32(1L), be32(1L), Array[Byte](0x50, 0x18), be16(1024),
      be16(0), be16(0), payload)
  }

  test("capture-file decoders are total on random and mutated bytes") {
    for (_ <- 0 until 300) {
      val garbage = randBytes(400)
      assert(Pcap.decodeFile("fuzz.pcap", garbage) != null) // empty on unknown magic
      val valid = TestBytes.pcapFile(Seq((1000L, 1, ethIpv4Tcp(randBytes(40)))))
      Pcap.decodeFile("fuzz.pcap", mutate(valid)).foreach(f => assert(f.data != null))
      val validNg = TestBytes.pcapngFile(1, Seq((1000L, ethIpv4Tcp(randBytes(40)))))
      Pcap.decodeFile("fuzz.pcapng", mutate(validNg)).foreach(f => assert(f.data != null))
    }
  }

  test("capture walkers survive adversarial length fields") {
    import TestBytes._
    val frame = ethIpv4Tcp(Array.fill[Byte](20)(7))
    // classic pcap: per-record incl_len near Int.MaxValue — the naive
    // `off + inclLen` guard wraps negative and copyOfRange throws
    for (bad <- Seq(0x7fffffffL, 0x7ffffff0L, 0x80000000L, 0xffffffffL, 0L)) {
      val rec = cat(le32(1000L), le32(0L), le32(bad), le32(bad), frame)
      val file = cat(pcapFile(Seq((999L, 0, frame))), rec)
      assert(Pcap.decodeFile("adv.pcap", file).nonEmpty) // first record survives
    }
    // pcapng: block total length and EPB captured length with the same
    // wrap, plus blockLen that would loop the walker in place
    val shb = pcapngFile(1, Seq((1000L, frame)))
    for (bad <- Seq(0x7fffffffL, 0x80000000L, 0xffffffffL, 13L)) {
      val epb = cat(le32(6L), le32(bad), le32(0L), le32(0L), le32(bad), le32(bad), frame)
      Pcap.decodeFile("adv.pcapng", cat(shb, epb))
      val blk = cat(le32(6L), le32(32L), le32(0L), le32(0L), le32(bad), le32(20L),
        Array.fill[Byte](4)(0))
      Pcap.decodeFile("adv.pcapng", cat(shb, blk))
    }
    // truncated EPB at end of file: block length 12..31 passes the walk
    // guard but the fixed EPB fields extend past the buffer
    for (bl <- 12 to 31) {
      val trunc = cat(le32(6L), le32(bl.toLong), Array.fill[Byte](bl - 8)(0x7f))
      Pcap.decodeFile("adv.pcapng", cat(shb, trunc))
    }
  }

  test("frame/packet decoders are total on random frames and all DLTs") {
    val dlts = Seq(0, 1, 101, 113, 141, 276, gen(Gen.chooseNum(-5, 300)))
    for (_ <- 0 until 300) {
      val data = randBytes(200)
      for (dlt <- dlts) {
        Pcap.ipv4Offset(dlt, data)
        val f = Frame("fuzz.pcap", 1L, 1000L, 0, dlt, data)
        Packets.decode(f).foreach(p => Packets.sctpChunks(p))
      }
      // mutated well-formed eth+ipv4+tcp frame walks the header arithmetic
      val f2 = Frame("fuzz.pcap", 1L, 1000L, 0, 1, mutate(ethIpv4Tcp(randBytes(60))))
      Packets.decode(f2).foreach(p => Packets.sctpChunks(p))
    }
  }

  test("protocol decoders are total on random and mutated payloads") {
    def diameterMsg(len: Int): Array[Byte] = {
      val b = new Array[Byte](math.max(len, 20))
      b(0) = 1
      b(1) = ((b.length >> 16) & 0xff).toByte
      b(2) = ((b.length >> 8) & 0xff).toByte
      b(3) = (b.length & 0xff).toByte
      b
    }
    for (_ <- 0 until 300) {
      val garbage = randBytes(200)
      Diameter.expectedLength(garbage)
      Diameter.decode(garbage)
      Diameter.decode(mutate(diameterMsg(gen(Gen.chooseNum(20, 120)))))
      Smpp.framePdus(garbage).foreach(Smpp.decodePdu)
      Smpp.decodePdu(garbage)
      GsmMap.m3uaData(garbage)
      GsmMap.sccpParse(1, 2, garbage)
      GsmMap.tcapParse(garbage)
      GsmMap.m3uaData(mutate(garbage)).foreach { case (opc, dpc, _, d) =>
        GsmMap.sccpParse(opc, dpc, d).foreach(m => GsmMap.reassembleSegments(Seq(m)))
      }
      Gtp.decode(garbage)
    }
  }

  test("text decoders are total on random and mutated strings") {
    val httpValid = "POST /x HTTP/1.1\r\nContent-Length: 5\r\nX-Id: 7\r\n\r\nhello"
    val sipValid = "INVITE sip:alice@h SIP/2.0\r\nFrom: <sip:bob@h>\r\nTo: <sip:alice@h>\r\nCall-ID: 1@h\r\n\r\n"
    val xmlValid = "<request><msisdn>123</msisdn></request>"
    for (_ <- 0 until 300) {
      val junk = new String(randBytes(200), java.nio.charset.StandardCharsets.ISO_8859_1)
      val mutated = new String(mutate(httpValid.getBytes), java.nio.charset.StandardCharsets.ISO_8859_1)
      val sipMut = new String(mutate(sipValid.getBytes), java.nio.charset.StandardCharsets.ISO_8859_1)
      val xmlMut = new String(mutate(xmlValid.getBytes), java.nio.charset.StandardCharsets.ISO_8859_1)
      Http.isHttpStart(junk)
      for (t <- Seq(junk, mutated)) {
        Http.parse("1", 1L, 1000L, 0, "1.1.1.1", "2.2.2.2", "f.pcap", 80, 81, 1L, 1L, t)
      }
      for (t <- Seq(junk, sipMut)) {
        Sip.parse("1", 1L, 1000L, 0, "1.1.1.1", "2.2.2.2", "f.pcap", t)
      }
      for (t <- Seq(junk, xmlMut)) {
        XmlBody.parse(t).foreach { e =>
          XmlBody.rootType(e); XmlBody.smppXmlMsisdn(e); XmlBody.diamXmlResultCode(e)
        }
      }
      XmlBody.htmlUnescape(junk)
    }
  }
}
