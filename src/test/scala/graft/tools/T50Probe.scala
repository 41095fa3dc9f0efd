package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object T50Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)
    val dir = java.nio.file.Files.createTempDirectory("t50probe").toString
    graft.operators.Bm25.buildIndex(docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", dir)
    graft.operators.Bm25.appendToIndex(spark, dir, docs.filter(col("doc_id") % 3 === 2), "doc_id", "text")
    val q = {
      val w = graft.functions.TextFunctions.tokens(col("text"))
      docs.filter(col("doc_id") % 100 === 13)
        .select(col("doc_id").as("qid"),
          explode(array(Seq(1, 4, 6, 9).map(p => element_at(w, p)): _*)).as("term"))
    }
    def time(f: => Unit): Double = { val t0=System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length/2)
    def serve() = graft.operators.Bm25.serveTopK(spark, dir, q, 6).count()
    serve() // warm
    println(f"[probe] fragmented serve: ${med(Seq.fill(5)(time(serve())))}%5.2fs")
    graft.operators.Bm25.compactIndex(spark, dir)
    serve()
    println(f"[probe] compacted serve:  ${med(Seq.fill(5)(time(serve())))}%5.2fs")
    val m = graft.operators.Bm25.readManifest(spark, dir)
    println(s"[probe] files per artifact: postings=" +
      (1L to m.version).map(v => { val p=java.nio.file.Paths.get(s"$dir/data/$v/postings")
        if (java.nio.file.Files.exists(p)) java.nio.file.Files.walk(p).filter(java.nio.file.Files.isRegularFile(_)).count() else 0L }).mkString("/"))
    spark.stop()
  }
}
