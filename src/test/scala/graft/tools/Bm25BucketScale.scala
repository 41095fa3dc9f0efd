package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bucket-count sizing receipt for the BM25 standing index
  * ([[graft.operators.Bm25.buildIndex]]'s `buckets` parameter): the
  * bucket is the append tick's REWRITE unit and the serve path's
  * LISTING unit, so the same corpus built at 16 / 64 / 256 buckets
  * quantifies the trade a 100 TB deployment sizes:
  *
  *   - append rewrite bytes for a skewed (few-term) batch fall ~1/B —
  *     each bucket holds ~1/B of the postings, and a batch touching k
  *     terms rewrites ≤ k buckets regardless of B;
  *   - serve listings for a fixed query batch stay ≤ |query terms|
  *     bucket dirs at every B (manifest path selection), while the
  *     BYTES read per listed bucket fall ~1/B;
  *   - more buckets cost more files per full-index operation (build
  *     time, small-file pressure) — the reason B is a knob, not "max".
  *
  * Run: sbt "Test/runMain graft.tools.Bm25BucketScale"
  */
object Bm25BucketScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.exists(root)) return 0L
      val s = java.nio.file.Files.walk(root)
      try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(java.nio.file.Files.isRegularFile(_))
        .filterNot(_.getFileName.toString.startsWith("."))
        .map(java.nio.file.Files.size(_)).sum
      finally s.close()
    }

    // 20k docs x 30 tokens over a 2k-word vocabulary: every bucket
    // materializes at all three counts
    val corpus = spark.range(20000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(2000)))): _*).as("text"))
      .cache()
    corpus.count()
    // skewed append batch: an 8-term template storm (one domain)
    val batch = spark.range(2000).select((col("id") + 1000000L).as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("narrow"), pmod(hash(col("id") * 31 + j), lit(8)))): _*).as("text"))
      .cache()
    batch.count()
    val queryTerms = (0 until 5).map(t => (t.toLong, s"w${t * 397}"))

    val load = scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").head).getOrElse("?")
    println(s"bm25_bucket_scale window load=$load corpus=20000x30tok batch=2000x8terms")

    for (buckets <- Seq(16, 64, 256)) {
      val dir = java.nio.file.Files.createTempDirectory(s"bm25bs$buckets").toString
      val buildT = time(graft.operators.Bm25
        .buildIndex(corpus, "doc_id", "text", dir, buckets))
      val appendT = time(graft.operators.Bm25
        .appendToIndex(spark, dir, batch, "doc_id", "text"))
      val m = graft.operators.Bm25.readManifest(spark, dir)
      val rewritten = m.bucketVersions.count(_._2.contains(m.version))
      val rewriteBytes = dirBytes(s"$dir/data/${m.version}/postings")
      val totalBytes = dirBytes(s"$dir/data/1/postings")
      // the takedown tick pays the same bucket-granular cost: deleting
      // the skewed batch back out rewrites only its terms' buckets
      val deleteT = time(graft.operators.Bm25
        .deleteFromIndex(spark, dir, batch, "doc_id", "text"))
      val md = graft.operators.Bm25.readManifest(spark, dir)
      val delRewritten = md.bucketVersions.count(_._2.contains(md.version))
      val delBytes = dirBytes(s"$dir/data/${md.version}/postings")
      // the ID-ONLY tick (round 15): re-append the batch, then take it
      // back out by bare ids. The docmap reverse index makes the locate
      // a pure-function dbucket read (docmap_kb — a doc-sized artifact)
      // where the legacy fallback scanned the postings (postings_kb);
      // the REWRITE is bucket-granular either way.
      graft.operators.Bm25.appendToIndex(spark, dir, batch, "doc_id", "text")
      val mPre = graft.operators.Bm25.readManifest(spark, dir)
      val postingsKb = mPre.bucketVersions.toSeq.flatMap { case (b, vs) =>
        vs.map(v => dirBytes(s"$dir/data/$v/postings/bucket=$b")) }.sum / 1024
      val docmapKb = mPre.docVersions.toSeq
        .flatMap { case (k, vs) =>
          vs.map(v => dirBytes(s"$dir/data/$v/docmap/dbucket=$k")) }
        .sum / 1024
      val delIdsT = time(graft.operators.Bm25.deleteByIds(spark, dir,
        batch.select(col("doc_id")), "doc_id"))
      val mIds = graft.operators.Bm25.readManifest(spark, dir)
      val idsRewritten = mIds.bucketVersions.count(_._2.contains(mIds.version))
      val idsBytes = dirBytes(s"$dir/data/${mIds.version}/postings")
      val q = queryTerms.toDF("qid", "term")
      val served = graft.operators.Bm25.serveTopK(spark, dir, q, 10)
      val serveT = med(Seq.fill(3)(time(served.count())))
      val listedBuckets = served.inputFiles.filter(_.contains("/postings/"))
        .map(f => f.split("bucket=").last.split("/").head.toInt).distinct.length
      val listedBytes = served.inputFiles.filter(_.contains("/postings/"))
        .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(
          f.stripPrefix("file:")))).sum
      println(f"bm25_bucket_scale buckets=$buckets%4d build=$buildT%5.1fs " +
        f"append=$appendT%5.1fs rewritten_buckets=$rewritten%3d " +
        f"rewrite_kb=${rewriteBytes / 1024}%6d of_total_kb=${totalBytes / 1024}%6d " +
        f"delete=$deleteT%5.1fs del_rewritten=$delRewritten%3d " +
        f"del_kb=${delBytes / 1024}%6d " +
        f"del_ids=$delIdsT%5.1fs ids_rewritten=$idsRewritten%3d " +
        f"ids_kb=${idsBytes / 1024}%6d docmap_kb=$docmapKb%5d " +
        f"vs_postings_kb=$postingsKb%6d " +
        f"serve=$serveT%5.2fs listed_buckets=$listedBuckets%3d " +
        f"listed_kb=${listedBytes / 1024}%5d")
    }

    // ── ACCRETIVE-APPEND receipt (round 16; VERDICT-r15 "done" bar:
    // append wall-clock flat as the index grows 8×): the same
    // 2000-doc broad-vocabulary batch — the old model's worst case, it
    // touches every bucket — appended to indexes built over 5k / 10k /
    // 20k / 40k docs. The tick writes only batch rows, so time and
    // bytes must stay ~flat while the standing index grows 8×. A
    // five-append chain then shows the read amplification compaction
    // collapses: file count and serve time before vs after ONE
    // compact+vacuum.
    val broadBatch = spark.range(2000).select((col("id") + 2000000L).as("doc_id"),
      concat_ws(" ", (0 until 30).map(j =>
        concat(lit("w"), pmod(hash(col("id") * 37 + j), lit(2000)))): _*).as("text"))
      .cache()
    broadBatch.count()
    for (n <- Seq(5000, 10000, 20000, 40000)) {
      val c = spark.range(n).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 30).map(j =>
          concat(lit("w"), pmod(hash(col("id") * 31 + j), lit(2000)))): _*).as("text"))
      val dir = java.nio.file.Files.createTempDirectory(s"bm25acc$n").toString
      graft.operators.Bm25.buildIndex(c, "doc_id", "text", dir, 64)
      val indexKb = dirBytes(s"$dir/data/1/postings") / 1024
      val appendT = med(Seq.fill(3) {
        // re-time against a fresh slot each run: delete the batch back
        // out first so every timed append does identical work
        val t = time(graft.operators.Bm25
          .appendToIndex(spark, dir, broadBatch, "doc_id", "text"))
        graft.operators.Bm25.deleteByIds(spark, dir,
          broadBatch.select(col("doc_id")), "doc_id")
        t
      })
      // the round-17 reverse-map receipt: one more append, then measure
      // the bytes IT wrote under its own data version — docmap included.
      // Accretive maps write batch rows only, so docmap_kb must stay
      // FLAT as the index grows 8× (the old rewrite-on-append model
      // paid ~N/B existing rows per touched dbucket — index-bound)
      graft.operators.Bm25.appendToIndex(spark, dir, broadBatch, "doc_id", "text")
      val mA = graft.operators.Bm25.readManifest(spark, dir)
      val postKbA = dirBytes(s"$dir/data/${mA.version}/postings") / 1024
      val docmapKbA = dirBytes(s"$dir/data/${mA.version}/docmap") / 1024
      println(f"bm25_append_scale corpus=$n%6d index_kb=$indexKb%7d " +
        f"append=$appendT%5.2fs postings_kb=$postKbA%5d docmap_kb=$docmapKbA%5d " +
        f"(batch-bounded at any index size)")
    }
    // read-amplification: five accreted appends, then one compact
    locally {
      val dir = java.nio.file.Files.createTempDirectory("bm25accC").toString
      graft.operators.Bm25.buildIndex(corpus, "doc_id", "text", dir, 64)
      for (k <- 0 until 5) {
        val b = spark.range(400).select((col("id") + 3000000L + k * 1000L).as("doc_id"),
          concat_ws(" ", (0 until 30).map(j =>
            concat(lit("w"), pmod(hash(col("id") * 41 + j + k), lit(2000)))): _*).as("text"))
        graft.operators.Bm25.appendToIndex(spark, dir, b, "doc_id", "text")
      }
      def serveFiles(): (Double, Int) = {
        val served = graft.operators.Bm25.serveTopK(spark, dir,
          queryTerms.toDF("qid", "term"), 10)
        (med(Seq.fill(3)(time(served.count()))),
          served.inputFiles.count(_.contains("/postings/")))
      }
      val (serveBefore, filesBefore) = serveFiles()
      graft.operators.Bm25.compactIndex(spark, dir)
      graft.operators.Bm25.vacuumIndex(spark, dir, graceVersions = 0L)
      val (serveAfter, filesAfter) = serveFiles()
      println(f"bm25_append_compact files=$filesBefore%4d -> $filesAfter%4d " +
        f"serve=$serveBefore%5.2fs -> $serveAfter%5.2fs after one compact+vacuum")
    }
    spark.stop()
  }
}
