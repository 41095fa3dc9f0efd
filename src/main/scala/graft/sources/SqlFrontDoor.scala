package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StringType

import graft.etl._
import graft.functions.{CodecExpressions, VectorExpressions}

/** SQL front door (SURVEY NEXT #5): every protocol pipeline becomes a
  * table-valued function, so `spark.sql` alone reaches the whole
  * operator surface —
  *
  * {{{
  *   SELECT sessionId, count(1) FROM diameter_records('/captures/x.pcap')
  *   GROUP BY sessionId
  * }}}
  *
  * plus the scalar registrations (`tbcd_decode`, `bcd_swap`, `fvec_dot`).
  * A TVF call resolves to the pipeline's logical plan, so Catalyst sees
  * straight through it — column pruning and filters compose with the
  * pipeline output exactly as with the DataFrame API.
  */
object SqlFrontDoor {

  private def argString(exprs: Seq[Expression], fn: String, pos: Int): String = {
    require(exprs.length > pos && exprs(pos).foldable
        && exprs(pos).dataType == StringType,
      s"$fn expects literal string argument ${pos + 1} (the input path)")
    exprs(pos).eval(InternalRow.empty).toString
  }

  /** Register every TVF + scalar function on the session. */
  def register(spark: SparkSession): Unit = {
    CodecExpressions.register(spark)
    VectorExpressions.register(spark)

    def tvf(name: String)(build: String => DataFrame): Unit =
      GraftBridge.registerTableFunction(spark, name,
        exprs => GraftBridge.logicalPlan(build(argString(exprs, name, 0))))

    tvf("pcap_frames")(p => Pcap.frames(spark, p).toDF())
    tvf("diameter_records")(p => DiameterPipeline.records(spark, p).toDF())
    tvf("http_records")(p => Http.records(spark, p))
    tvf("http_ss7_records")(p => HttpSs7.records(spark, p))
    tvf("http_ocs_records")(p => HttpOcs.records(spark, p))
    tvf("sip_records")(p => Sip.records(spark, p))
    tvf("smpp_records")(p => SmppPipeline.records(spark, p))
    tvf("gtp_records")(p => GtpPipeline.records(spark, p))
    tvf("gsm_map_records")(p => GsmMapPipeline.records(spark, p))
    tvf("tcap_transactions")(p =>
      Sigshark.tcapTransactions(spark, p)
        .map(t => (t.key, t.startTsSec, t.startUsec, t.frames.mkString(" ")))(
          org.apache.spark.sql.Encoders.product[(String, Long, Int, String)])
        .toDF("key", "start_ts_sec", "start_usec", "frames_list"))
    // camel_records takes (tshark_json_path, pcap_name)
    GraftBridge.registerTableFunction(spark, "camel_records", exprs =>
      GraftBridge.logicalPlan(Camel.records(spark,
        argString(exprs, "camel_records", 0), argString(exprs, "camel_records", 1))))
  }
}
