package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bm25

/** BM25 index append tick ([[Bm25.appendToIndex]]): df refresh parity
  * with a one-shot rebuild, and the bucket-granularity claim — a batch
  * touching one term bucket leaves every other bucket's files alone.
  */
class Bm25AppendSpec extends AnyFunSuite {

  test("build+append == build-over-union: postings rows and stats identical") {
    val spark = SparkTest.spark
    import spark.implicits._
    val initial = Seq(
      (1L, "apple banana cherry date"),
      (2L, "banana cherry date elderberry fig"),
      (3L, "apple grape melon"))
    val batch = Seq(
      (10L, "banana grape kiwi kiwi"),
      (11L, "melon date apple apple apple"))

    val dirA = Files.createTempDirectory("bm25appA").toString
    Bm25.buildIndex(initial.toDF("doc_id", "text"), "doc_id", "text", dirA)
    Bm25.appendToIndex(spark, dirA, batch.toDF("doc_id", "text"), "doc_id", "text")

    val dirB = Files.createTempDirectory("bm25appB").toString
    Bm25.buildIndex((initial ++ batch).toDF("doc_id", "text"), "doc_id", "text", dirB)

    def postings(dir: String) = spark.read.parquet(s"$dir/postings")
      .select("t", "doc_id", "tf", "df", "dl", "bucket")
      .collect().map(_.toSeq).toSet
    assert(postings(dirA) == postings(dirB) && postings(dirA).nonEmpty)
    def stats(dir: String) = spark.read.parquet(s"$dir/stats")
      .select("n", "sdl").head().toSeq
    assert(stats(dirA) == stats(dirB))

    // and serving from the appended index retrieves an appended doc
    val q = Seq((1L, "kiwi")).toDF("qid", "term")
    val served = Bm25.serveTopK(spark, dirA, q, 3).collect()
    assert(served.map(_.getLong(1)).contains(10L))
  }

  test("a single-term batch rewrites only that term's bucket") {
    val spark = SparkTest.spark
    import spark.implicits._
    val initial = (0 until 40).map(i => (i.toLong, s"w$i common$i filler$i"))
    val dir = Files.createTempDirectory("bm25appC").toString
    Bm25.buildIndex(initial.toDF("doc_id", "text"), "doc_id", "text", dir)

    def bucketFiles(): Map[String, Set[String]] =
      Files.list(Paths.get(s"$dir/postings")).toArray.toSeq
        .map(_.toString).filter(_.contains("bucket="))
        .map { b =>
          b -> Files.list(Paths.get(b)).toArray.toSeq.map(_.toString)
            .filter(_.endsWith(".parquet")).toSet
        }.toMap
    val before = bucketFiles()

    Bm25.appendToIndex(spark, dir,
      Seq((100L, "solo solo solo")).toDF("doc_id", "text"), "doc_id", "text")
    val after = bucketFiles()

    val soloBucket = spark.range(1).select(
      pmod(xxhash64(lit("solo")), lit(Bm25.IndexBuckets)).cast("int"))
      .head().getInt(0)
    val changed = before.keySet.union(after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.forall(_.endsWith(s"bucket=$soloBucket")),
      s"only the solo bucket may change, got $changed")
    // the appended term is served with correct df=1 scoring
    val served = Bm25.serveTopK(spark, dir,
      Seq((1L, "solo")).toDF("qid", "term"), 3).collect()
    assert(served.map(_.getLong(1)).toSeq == Seq(100L))
  }
}
