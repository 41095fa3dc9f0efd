package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP SS7/OCS request↔response pairing + enrichment (SURVEY §2: R4,
  * J5, D4; `http_ss7_ingestor.py:180-241,506-549`,
  * `http_ocs_ingestor.py:198-253,511-550`).
  *
  * The reference pairs a request with the response whose TCP sequence
  * equals the request's acknowledge (per flow); paired rows exchange
  * subscriber fields bidirectionally; unpaired rows are emitted to the
  * "unlinked" output and unioned back (§2.7). Expressed as a full-outer
  * self-join on (flow, request.ack == response.seq) + symmetric coalesce
  * — the dict-free J5.
  */
object HttpSs7 {

  /** `msgs` must carry: pcapFilename, srcIp, dstIp, srcPort, dstPort,
    * tcpSequence, tcpAcknowledge, httpIsRequest, plus `fillCols`.
    * Returns one row per message with `matched` + `link_state`, enriched
    * bidirectionally on `fillCols` (empty strings count as missing —
    * the reference's null-or-empty semantics). D4: only the first
    * request/response per slot pairs (`row_number() == 1`). */
  def pairAndEnrich(msgs: DataFrame, fillCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    // flow id with direction removed: both sides of the conversation map
    // to one key (requests a→b pair with responses b→a)
    val flow = array_join(array_sort(array(
      concat_ws(":", col("srcIp"), col("srcPort")),
      concat_ws(":", col("dstIp"), col("dstPort")))), "|")
    val base = msgs.withColumn("flowId", flow)

    def side(isReq: Boolean, slotKey: org.apache.spark.sql.Column, prefix: String) = {
      val w = Window.partitionBy(col("pcapFilename"), col("flowId"), slotKey)
        .orderBy(col("firstFrame"))
      base.filter(if (isReq) col("httpIsRequest") else !col("httpIsRequest"))
        .withColumn("slot", slotKey)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn") // D4
        .select((Seq(col("pcapFilename").as(s"${prefix}_file"), col("flowId").as(s"${prefix}_flow"),
          col("slot").as(s"${prefix}_slot"), col("framesList").as(s"${prefix}_frames"),
          col("firstFrame").as(s"${prefix}_frame")) ++
          fillCols.map(c => col(c).as(s"${prefix}_$c"))): _*)
    }
    // R4 key arithmetic: request keyed by its ack, response by its seq
    val req = side(isReq = true, col("tcpAcknowledge"), "q")
    val res = side(isReq = false, col("tcpSequence"), "r")

    val joined = req.join(res,
      col("q_file") === col("r_file") && col("q_flow") === col("r_flow")
        && col("q_slot") === col("r_slot"), "full_outer")

    val matched = col("q_frames").isNotNull && col("r_frames").isNotNull
    val enriched = fillCols.foldLeft(joined) { (df, c) =>
      val qc = nullif(col(s"q_$c"), lit(""))
      val rc = nullif(col(s"r_$c"), lit(""))
      df.withColumn(s"q_$c", coalesce(qc, rc))
        .withColumn(s"r_$c", coalesce(rc, qc))
    }
    enriched
      .withColumn("matched", matched)
      .withColumn("link_state", when(matched, "linked").otherwise("unlinked"))
  }
}
