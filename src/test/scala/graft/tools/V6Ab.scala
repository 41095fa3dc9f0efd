package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** One-JVM interleaved A/B of the v6 kernel (round-9 verdict watch item):
  * the current `Ann.lshNearDupPairs` (r8: cappedBucket + accumulator +
  * id-type require) vs the pre-r8 body reproduced verbatim below. Run:
  *
  *   sbt "Test/runMain graft.tools.V6Ab /root/testdata/sf0.1 5"
  *
  * Prints per-run times and medians for both variants, interleaved so
  * both see the identical window (the r7 A/B protocol).
  */
object V6Ab {

  /** Pre-r8 kernel body: same bucket map, `it.toArray`, no cap/acc. */
  private def preR8(vecs: org.apache.spark.sql.DataFrame,
      planes: Seq[Seq[Float]], threshold: Double): org.apache.spark.sql.DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val planesArr = planes.map(_.toArray).toArray
    vecs.select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        var b = 0L
        var p = 0
        while (p < planesArr.length) {
          if (Ann.dotD(v, planesArr(p)) >= 0) b |= 1L << p
          p += 1
        }
        (b, id, v)
      }
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._2)
        val out = Iterator.newBuilder[(Long, Long, Double)]
        var i = 0
        while (i < rows.length) {
          var j = i + 1
          while (j < rows.length) {
            val c = Ann.cosineD(rows(i)._3, rows(j)._3)
            if (c >= threshold) out += ((rows(i)._2, rows(j)._2, c))
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("da", "db", "cosine")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planes = (0 until 6).map(p => Ann.hyperplane(p, 64))

    def time(f: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      require(n >= 0)
      dt
    }
    def cur(): Long = Ann.lshNearDupPairs(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", planes, 0.5).count()
    def old(): Long = preR8(Tables.embeddings(spark, sfDir), planes, 0.5).count()

    cur(); old() // warm codegen both ways
    val (cs, os) = (1 to runs).map(_ => (time(cur()), time(old()))).unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[v6ab] current: ${cs.map(t => f"$t%.3f").mkString(" ")} median=${med(cs)}%.3f")
    println(f"[v6ab] pre-r8 : ${os.map(t => f"$t%.3f").mkString(" ")} median=${med(os)}%.3f")
    println(f"[v6ab] ratio current/pre-r8 = ${med(cs) / med(os)}%.3f")
    spark.stop()
  }
}
