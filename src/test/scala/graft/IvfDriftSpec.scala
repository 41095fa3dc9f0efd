package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ann

/** [[Ann.ivfGeometryDrift]]: the rebuild-alarm report is computable
  * from the COMMITTED ARTIFACTS ALONE — every file it reads lives
  * under the index dir (no source corpus, no retrain), and its
  * per-version (n, mean fixed-point cosine-to-assigned-centroid) rows
  * match a driver-side replay of the frozen-geometry assignment.
  */
class IvfDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  private val dim = 8
  private def vec(seed: Int) = Seq.tabulate(dim)(j =>
    (((seed * 31 + j * 17) % 13) - 6).toFloat / 3f)
  private val initial = (100 until 160).map(i => (i.toLong, vec(i)))
  private val appended = (10 until 40).map(i => (i.toLong, vec(i)))
  private val cents = Array.tabulate(4)(c => vec(c * 7 + 1).toArray)

  test("drift report reads only committed artifacts and replays frozen-geometry assignment") {
    val dir = Files.createTempDirectory("ivfdriftspec").toString
    Ann.ivfIndexBuild(initial.toDF("cid", "cvec"), dir, cents)
    Ann.ivfIndexAppend(spark, dir, appended.toDF("cid", "cvec"))

    val report = Ann.ivfGeometryDrift(spark, dir)
    // artifacts-only: every input file lives under the index dir
    val files = report.inputFiles
    assert(files.nonEmpty && files.forall(_.contains(dir)),
      s"drift must read only the index dir, saw ${files.filterNot(_.contains(dir)).toSeq}")

    // driver replay: version 1 = the build batch, 2 = the append
    def expect(batch: Seq[(Long, Seq[Float])]): (Long, Long, Long) = {
      val fps = batch.map { case (_, v) =>
        val a = v.toArray
        math.floor(Ann.cosineD(a,
          cents(Ann.nearestCell(cents, a))) * 1000000.0).toLong
      }
      val sum = fps.sum
      (batch.size.toLong, sum, sum / batch.size) // all non-negative here
    }
    val rows = report.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == expect(initial), s"build version drift row: ${rows(1L)}")
    assert(rows(2L) == expect(appended), s"appended version drift row: ${rows(2L)}")

    // a fully-deleted index has nothing to drift — empty, not a crash
    Ann.ivfIndexDelete(spark, dir, (initial ++ appended).toDF("cid", "cvec"))
    assert(Ann.ivfGeometryDrift(spark, dir).collect().isEmpty)
  }
}
