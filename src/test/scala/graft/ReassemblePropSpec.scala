package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.Diameter
import graft.operators.Stateful
import graft.operators.Stateful.Piece

/** Property check for the stash-and-prepend reassembly machine: random
  * message trains cut at random byte boundaries — including cuts inside
  * the 4-byte length header, one-byte segments, segments spanning
  * several messages, and a trailing incomplete message — must
  * reassemble to exactly the original messages with frame attribution
  * following the batch rule (a message's frames are every segment that
  * contributed bytes to its buffer since the last empty-buffer point).
  * The unit examples pin representative shapes; this pins the boundary
  * arithmetic under arbitrary segmentation. */
class ReassemblePropSpec extends AnyFunSuite {

  /** One well-formed Diameter frame of `len` bytes (len ≥ 20): version
    * byte 1, 3-byte big-endian declared length, deterministic body. */
  private def msg(len: Int, tag: Int): Array[Byte] = {
    val b = new Array[Byte](len)
    b(0) = 1
    b(1) = ((len >> 16) & 0xff).toByte
    b(2) = ((len >> 8) & 0xff).toByte
    b(3) = (len & 0xff).toByte
    var i = 4
    while (i < len) { b(i) = ((tag * 31 + i) & 0xff).toByte; i += 1 }
    b
  }

  private def piece(no: Long, payload: Array[Byte]): Piece =
    Piece(no, 1000L + no, 0, "1.1.1.1", "2.2.2.2", "cap.pcap", payload)

  test("random trains at random cuts reassemble to the original messages") {
    var s = org.scalacheck.rng.Seed(88L)
    def gen[A](g: Gen[A]): A = { val v = g.apply(Gen.Parameters.default, s).get; s = s.next; v }
    for (round <- 0 until 60) {
      val msgs = (0 until gen(Gen.chooseNum(1, 5))).map(t => msg(gen(Gen.chooseNum(20, 60)), t))
      val train = msgs.reduce(_ ++ _)
      // random distinct cut points anywhere in the byte stream
      val nCuts = gen(Gen.chooseNum(0, 8))
      val cuts = (0 until nCuts).map(_ => gen(Gen.chooseNum(1, math.max(1, train.length - 1))))
        .distinct.sorted
      val bounds = (0 +: cuts :+ train.length).distinct.sorted
      val pieces = bounds.zip(bounds.tail).zipWithIndex.map { case ((a, b), i) =>
        piece(i + 1, java.util.Arrays.copyOfRange(train, a, b))
      }
      val out = Stateful.reassemble(pieces, Diameter.expectedLength).toSeq
      assert(out.length == msgs.length, s"round $round cuts=$cuts")
      for ((got, want) <- out.zip(msgs))
        assert(java.util.Arrays.equals(got.payload, want),
          s"round $round: payload mismatch at cuts $cuts")
      // frame attribution: every emitted message's frames are a
      // contiguous ascending run, and together they cover all segments
      val frames = out.map(_.framesList.split(" ").map(_.toLong).toSeq)
      frames.foreach(f => assert(f == (f.min to f.max), s"non-contiguous frames $f"))
      assert(frames.flatten.toSet == pieces.map(_.frameNo).toSet
        || frames.flatten.toSet.subsetOf(pieces.map(_.frameNo).toSet),
        s"round $round: frames outside the segment set")
      // a trailing incomplete message must stash (dropped without
      // emitResidue) and surface with it
      val cutTrain = java.util.Arrays.copyOfRange(train, 0, train.length - 5)
      val pieces2 = Seq(piece(1, cutTrain))
      val out2 = Stateful.reassemble(pieces2, Diameter.expectedLength).toSeq
      assert(out2.length == msgs.length - 1, s"round $round: truncated tail must stash")
      val out3 = Stateful.reassemble(pieces2, Diameter.expectedLength, emitResidue = true).toSeq
      assert(out3.length == msgs.length, s"round $round: residue must surface when asked")
    }
  }
}
