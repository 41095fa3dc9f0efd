package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Http, HttpSs7}
import graft.operators.Stateful.Piece

/** Random-cut property harness for the HTTP content-length machine —
  * the round-7 Diameter header-cut bug class (`expectedLength`
  * conflating "too short to read the length field" with "garbage")
  * lives wherever a length/offset field can straddle a segment
  * boundary. Message trains are cut at ARBITRARY byte positions:
  * inside the request line, inside headers, inside Content-Length's
  * digits, inside bodies, multiple messages per segment (pipelining),
  * one-char segments — reassembly must recover exactly the original
  * messages, and the R4 seq/ack pairing must survive interior cuts.
  * Bodies are \r\n-free by construction: a body octet sequence that
  * *is* a valid HTTP start line at a segment boundary is
  * indistinguishable from a truncated-capture restart, which the
  * machine (like the reference) resolves as a new message. */
class HttpReassemblePropSpec extends AnyFunSuite {

  private val BodyChars = ('a' to 'z') ++ ('0' to '9')

  private def piece(no: Long, text: String, src: String = "1.1.1.1",
      dst: String = "2.2.2.2"): Piece =
    Piece(no, 1000L + no, 0, src, dst, "cap.pcap",
      text.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** (text, isRequest, tag, body) — every message carries a
    * Content-Length matching its body so framing is length-decided. */
  private def msg(isReq: Boolean, tag: Int, body: String): String =
    if (isReq)
      s"POST /p$tag HTTP/1.1\r\nHost: h\r\nContent-Length: ${body.length}\r\n\r\n$body"
    else
      s"HTTP/1.1 200 OK\r\nContent-Type: text/p$tag\r\nContent-Length: ${body.length}\r\n\r\n$body"

  test("arbitrary cuts: trains reassemble to exactly the original messages") {
    var s = org.scalacheck.rng.Seed(907L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 60) {
      val n = gen(Gen.chooseNum(1, 5))
      val specs = (0 until n).map { t =>
        val body = (0 until gen(Gen.chooseNum(1, 40)))
          .map(_ => BodyChars(gen(Gen.chooseNum(0, BodyChars.length - 1)))).mkString
        (gen(Gen.prob(0.5)), t, body)
      }
      val texts = specs.map { case (isReq, t, b) => msg(isReq, t, b) }
      val train = texts.mkString
      val nCuts = gen(Gen.chooseNum(0, 12))
      val cuts = (0 until nCuts)
        .map(_ => gen(Gen.chooseNum(1, math.max(1, train.length - 1))))
        .distinct.sorted
      val bounds = (0 +: cuts :+ train.length).distinct.sorted
      val pieces = bounds.zip(bounds.tail).zipWithIndex.map { case ((a, b), i) =>
        // seq = byte offset (every segment's (seq, ack) unique, as TCP's)
        (piece(i + 1, train.substring(a, b)), a.toLong, 999L)
      }
      val out = Http.reassembleFlow(pieces, srcPort = 10, dstPort = 20)
      assert(out.length == specs.length, s"round $round cuts=$cuts: " +
        s"got ${out.length} of ${specs.length} messages")
      for ((got, (isReq, t, body)) <- out.zip(specs)) {
        assert(got.httpIsRequest == isReq, s"round $round cuts=$cuts")
        assert(got.contentLength.contains(body.length), s"round $round cuts=$cuts")
        assert(got.body == body, s"round $round cuts=$cuts: body mismatch")
        if (isReq) {
          assert(got.method == "POST", s"round $round")
          assert(got.uri == s"http://2.2.2.2:20/p$t ", s"round $round")
        } else {
          assert(got.responseCode.contains(200), s"round $round")
          assert(got.contentType == s"text/p$t", s"round $round")
        }
        // frame attribution: an ascending contiguous run of segment ids
        val fs = got.framesList.split(" ").map(_.toLong).toSeq
        assert(fs == (fs.min to fs.max), s"round $round: frames $fs")
      }
      // messages emit in stream order; spanning segments may appear in
      // two adjacent messages but order can't regress
      for ((a, b) <- out.zip(out.tail))
        assert(a.firstFrame <= b.firstFrame, s"round $round: order regressed")

      // truncated tail: the final body cut short still surfaces at EOF
      val shortBy = math.min(gen(Gen.chooseNum(1, 5)), specs.last._3.length - 1)
      if (shortBy >= 1) {
        val cutTrain = train.dropRight(shortBy)
        val out2 = Http.reassembleFlow(
          Seq((piece(1, cutTrain), 0L, 999L)), srcPort = 10, dstPort = 20)
        assert(out2.length == specs.length, s"round $round: truncated tail lost")
        assert(out2.last.body == specs.last._3.dropRight(shortBy), s"round $round")
      }

      // retransmissions (duplicate (seq, ack)) must not change the output
      if (pieces.length > 1) {
        val dupIdx = gen(Gen.chooseNum(0, pieces.length - 1))
        val (dp, dseq, dack) = pieces(dupIdx)
        val withDup = pieces :+ (dp.copy(frameNo = 1000L + dupIdx), dseq, dack)
        val out3 = Http.reassembleFlow(withDup, srcPort = 10, dstPort = 20)
        assert(out3.map(m => (m.httpIsRequest, m.body)) ==
          out.map(m => (m.httpIsRequest, m.body)),
          s"round $round: retransmission changed the output")
      }
    }
  }

  test("R4 pairing survives interior cuts in both directions") {
    val spark = SparkTest.spark
    import spark.implicits._
    var s = org.scalacheck.rng.Seed(908L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    val QBase = 10000L
    val RBase = 50000L
    for (round <- 0 until 8) {
      val k = gen(Gen.chooseNum(1, 4))
      val reqBodies = (0 until k).map(t => s"q${t}_" + "x" * gen(Gen.chooseNum(1, 20)))
      val resBodies = (0 until k).map(t => s"r${t}_" + "y" * gen(Gen.chooseNum(1, 20)))
      val reqTexts = reqBodies.zipWithIndex.map { case (b, t) => msg(isReq = true, t, b) }
      val resTexts = resBodies.zipWithIndex.map { case (b, t) => msg(isReq = false, t, b) }

      /** Cut a direction's stream: message starts are ALWAYS segment
        * boundaries (TCP pushes each application write), plus random
        * interior cuts — inside request lines' tails, headers,
        * Content-Length digits, bodies. */
      def segment(texts: Seq[String]): (Seq[(Int, Int)], Seq[Int]) = {
        val starts = texts.scanLeft(0)(_ + _.length)
        val total = starts.last
        val interior = (0 until gen(Gen.chooseNum(0, 8)))
          .map(_ => gen(Gen.chooseNum(1, math.max(1, total - 1))))
        val bounds = (starts ++ interior).distinct.sorted.filter(_ < total) :+ total
        (bounds.zip(bounds.tail), starts.init)
      }

      val (reqSegs, _) = segment(reqTexts)
      val (resSegs, resStarts) = segment(resTexts)
      val reqTrain = reqTexts.mkString
      val resTrain = resTexts.mkString
      // a request-direction segment of message k carries ack = response
      // stream offset of response k (what TCP has acked when it sends)
      def msgOf(starts: Seq[Int], off: Int): Int =
        starts.lastIndexWhere(_ <= off)
      val reqStarts = reqTexts.scanLeft(0)(_ + _.length).init
      val reqPieces = reqSegs.zipWithIndex.map { case ((a, b), i) =>
        (piece(i + 1, reqTrain.substring(a, b), "10.0.0.1", "10.0.0.2"),
          QBase + a, RBase + resStarts(msgOf(reqStarts, a)))
      }
      val resPieces = resSegs.zipWithIndex.map { case ((a, b), i) =>
        (piece(i + 1, resTrain.substring(a, b), "10.0.0.2", "10.0.0.1"),
          RBase + a, QBase + 900000L + a)
      }
      val reqMsgs = Http.reassembleFlow(reqPieces, srcPort = 1111, dstPort = 80)
      val resMsgs = Http.reassembleFlow(resPieces, srcPort = 80, dstPort = 1111)
      assert(reqMsgs.length == k && resMsgs.length == k, s"round $round")

      val df = (reqMsgs ++ resMsgs).toDF()
      val paired = HttpSs7.pairAndEnrich(df, fillCols = Seq("contentType"),
        carryCols = Seq("body"))
      val matched = paired.filter(org.apache.spark.sql.functions.col("matched"))
        .select("q_body", "r_body").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(matched.length == k, s"round $round: ${matched.length} of $k pairs")
      for (((qb, rb), t) <- matched.zipWithIndex) {
        assert(qb == reqBodies(t), s"round $round pair $t")
        assert(rb == resBodies(t), s"round $round pair $t")
      }
    }
  }
}
