package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Streaming embedding-space decontamination / radius search: arriving
  * vectors are flagged against a STATIC corpus by cosine similarity —
  * the embedding-modality sibling of [[CrossDedupStream]] (n-gram) and
  * the streaming form of the v5/v6 near-dup family.
  *
  * Scale design — the corpus stays DISTRIBUTED (unlike the broadcast
  * LSH index of CrossDedupStream, a vector corpus does not fit a
  * broadcast): it is assigned once to IVF cells
  * ([[assignCells]] — the caller materializes/persists that frame and
  * owns its lifecycle, the same explicit-cache contract as the batch
  * operators), and each arrival fans out to its `nprobe` nearest cells
  * (broadcast CENTROIDS only — k·dim floats) into a stream-static
  * equi-join on the cell id. Only probed cells' members are scored;
  * emission is append-friendly (one row per (arrival, member) with
  * cosine ≥ τ), so there is no per-key top-k aggregation state and no
  * watermark requirement.
  */
object AnnStream {

  /** Static-side preparation: corpus (`idCol`, `vecCol`) → (cid, cvec,
    * cell), cell = max-cosine centroid. Materialize (persist/write)
    * before starting the stream — the static side of a stream-static
    * join is re-read every micro-batch. */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    corpus.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .map { case (cid, v) => (cid, v, Ann.nearestCell(bc.value, v)) }
      .toDF("cid", "cvec", "cell")
  }

  /** stream(`idCol`, `vecCol`) → (qid, cid, cosine ≥ `threshold`), each
    * arrival probing its `nprobe` nearest cells of the prepared static
    * corpus. */
  def nearCorpus(stream: DataFrame, assigned: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], nprobe: Int, threshold: Double): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val probes = stream.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .flatMap { case (qid, v) =>
        Ann.nearestCells(bc.value, v, nprobe).iterator.map(cell => (qid, v, cell))
      }
      .toDF("qid", "qvec", "cell")
    probes.join(assigned, "cell")
      .select(col("qid"), col("cid"),
        Ann.cosine(col("qvec"), col("cvec")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
