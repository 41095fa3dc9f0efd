package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order key semantics: bit-exact interleave against a reference
  * bit-by-bit construction, and the locality property the layout
  * exists for (quadrant prefixes).
  */
class ZOrderSpec extends AnyFunSuite {

  private def refInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleave2 matches the bit-by-bit reference") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val got = rows.toDF("a", "b")
      .select(ZOrder.interleave2($"a", $"b")).as[Long].collect()
    assert(got.toSeq === rows.map { case (a, b) => refInterleave(a, b) })
  }

  test("quadrant locality: keys in the same power-of-two tile share a prefix") {
    // all (x, y) inside tile [512,1024)x[512,1024) sort AFTER every key
    // in [0,512)x[0,512) — the clustering property min/max pruning uses
    val lowMax = refInterleave(511L, 511L)
    val hiMin = refInterleave(512L, 512L)
    assert(lowMax < hiMin)
  }
}
