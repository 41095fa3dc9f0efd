package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Property check for the alternating large-star/small-star connected
  * components (the iterative operator with the most room for subtle
  * round-rule bugs): random edge sets — dense multi-component graphs,
  * chains (the high-diameter case the algorithm exists for), self-loops
  * and duplicate edges — against a driver-side union-find.
  */
class ComponentsPropSpec extends AnyFunSuite {

  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("random graphs: distributed components equal the union-find reference") {
    val spark = SparkTest.spark
    import spark.implicits._
    val edge = for {
      a <- Gen.chooseNum(0L, 30L)
      b <- Gen.chooseNum(0L, 30L)
    } yield (a, b)
    var s = org.scalacheck.rng.Seed(314L)
    for (round <- 0 until 5) {
      val n = Gen.chooseNum(1, 60).apply(Gen.Parameters.default, s).get; s = s.next
      val edges = Gen.listOfN(n, edge).apply(Gen.Parameters.default, s).get
      s = s.next
      // drop pure self-loop-only nodes from the expectation: the
      // operator ignores self-loops, so nodes appearing ONLY in them
      // never surface (documented contract)
      val real = edges.filter { case (a, b) => a != b }
      if (real.nonEmpty) {
        val expected = reference(real)
        val got = Components.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        assert(got === expected, s"round $round edges $edges")
      }
    }
  }

  test("a long chain converges (the high-diameter case)") {
    val spark = SparkTest.spark
    import spark.implicits._
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = Components.connectedComponents(chain.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }
}
