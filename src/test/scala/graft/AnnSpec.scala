package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** Unit coverage for the LSH near-dup operator beyond the (sparse at
  * small SF) oracle query: constructed near-identical vectors must land
  * in one bucket and be emitted; an anti-correlated vector must not
  * pair with them.
  */
class AnnSpec extends AnyFunSuite {

  test("lshNearDupPairs: near-identical vectors pair, anti-correlated do not") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dim = 8
    val base = Array.tabulate(dim)(i => 1.0f + 0.1f * i)
    val near = base.clone(); near(0) += 0.01f
    val anti = base.map(v => -v)
    val vecs = Seq(
      (1L, base.toSeq), (2L, near.toSeq), (3L, anti.toSeq)
    ).toDF("vec_id", "embedding")
    val planes = (0 until 4).map(p => Ann.hyperplane(p, dim))
    val pairs = Ann.lshNearDupPairs(vecs, "vec_id", "embedding", planes, 0.9)
      .collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L)
    assert(pairs.head.getDouble(2) > 0.99)
  }

  test("lshNearDupPairs agrees with exact pairs when buckets coincide") {
    val spark = SparkTest.spark
    import spark.implicits._
    // All vectors share the sign pattern (positive orthant scaled copies)
    // → one bucket → LSH output == exact output.
    val dim = 8
    val vecs = (1L to 5L).map { k =>
      (k, Array.tabulate(dim)(i => (1.0f + 0.05f * i) * k).toSeq)
    }.toDF("vec_id", "embedding")
    val planes = (0 until 4).map(p => Ann.hyperplane(p, dim))
    val lsh = Ann.lshNearDupPairs(vecs, "vec_id", "embedding", planes, 0.5).count()
    // scaled copies of one vector: cosine == 1 for every pair
    assert(lsh == 10L) // C(5,2)
  }
}
