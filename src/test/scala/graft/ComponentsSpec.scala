package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected components checked against a driver-side union-find on
  * random graphs, plus the adversarial shapes: a long chain (the
  * diameter case naive min-propagation handles badly) and duplicate /
  * self-loop / reversed edges.
  */
class ComponentsSpec extends AnyFunSuite {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
    touched.map(v => v -> find(v.toInt).toLong).toMap
  }

  test("random graphs match union-find") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(4)
    for (trial <- 0 until 3) {
      val n = 200 + trial * 100
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Components
        .connectedComponents(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got === unionFind(n, edges), s"trial $trial")
    }
  }

  test("long chain collapses to the minimum") {
    val spark = SparkTest.spark
    import spark.implicits._
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect()
    assert(got.length === 1000 && got.forall(_._2 === 0L))
  }

  test("the driver union-find fold matches the distributed star algorithm") {
    val spark = SparkTest.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(500)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
    val viaStar = Components
      .connectedComponents(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap
    val viaFold = Components.unionFindComponents(edges.toArray).toMap
    assert(viaFold === viaStar)
  }

  test("self-loops, duplicates and reversed edges are harmless") {
    val spark = SparkTest.spark
    import spark.implicits._
    val edges = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
      .toDF("src", "dst")
    val got = Components.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }
}
