package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** IVF append tick ([[Ann.ivfIndexAppend]]): appended vectors land in
  * the cells the shared centroids dictate, and serving from a
  * built-then-appended index equals serving from an index built over
  * the union in one shot.
  */
class IvfAppendSpec extends AnyFunSuite {

  test("build+append == build-over-union, cell by cell and serve by serve") {
    val spark = SparkTest.spark
    import spark.implicits._
    val dim = 8
    def vec(seed: Int) = Seq.tabulate(dim)(j =>
      (((seed * 31 + j * 17) % 13) - 6).toFloat / 3f)
    val initial = (100 until 160).map(i => (i.toLong, vec(i)))
    val appended = (10 until 40).map(i => (i.toLong, vec(i)))
    val cents = Array.tabulate(4)(c => vec(c * 7 + 1).toArray)

    val dirA = Files.createTempDirectory("ivfappA").toString
    Ann.assignCells(initial.toDF("cid", "cvec"), cents)
      .write.partitionBy("cell").mode("overwrite").parquet(dirA)
    Ann.ivfIndexAppend(dirA, appended.toDF("cid", "cvec"), cents)

    val dirB = Files.createTempDirectory("ivfappB").toString
    Ann.assignCells((initial ++ appended).toDF("cid", "cvec"), cents)
      .write.partitionBy("cell").mode("overwrite").parquet(dirB)

    def cells(dir: String) = spark.read.parquet(dir)
      .select(col("cid"), col("cell").cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(dirA) == cells(dirB) && cells(dirA).size == 90)

    val queries = (0 until 5).map(i => (i.toLong, vec(i + 500))).toDF("qid", "qvec")
    def serve(dir: String) = Ann.ivfTopKAssigned(
        spark.read.parquet(dir).withColumn("cell", col("cell").cast("int")),
        queries, cents, k = 5, nprobe = 2)
      .orderBy(col("qid"), col("rank")).collect().map(_.toSeq).toSeq
    val served = serve(dirA)
    assert(served == serve(dirB) && served.nonEmpty)
    // the appended batch is actually retrievable: some appended id surfaces
    assert(served.exists(r => { val id = r(2).asInstanceOf[Long]; id >= 10L && id < 40L }))
  }
}
