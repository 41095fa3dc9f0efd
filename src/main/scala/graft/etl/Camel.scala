package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CAMEL ingestion from a `tshark -T json` export (SURVEY §2: S5, F15,
  * F17, F19, F26; `cap_ingestor.py`).
  *
  * The export is a JSON array of packets, each with `_source.layers.*`
  * field arrays whose names contain dots (`"tcap.otid": ["0x1234"]`).
  * Spark reads it with multiLine JSON + schema inference (the one place
  * SURVEY §1.3 allows inference), then pure column work: hex→long with
  * `:`-strip (F19), epoch split (F15), op-code→name broadcast map (F17),
  * and the tid derivation rule (F26: otid iff initialDP else dtid).
  */
object Camel {

  /** F17: CAMEL local operation names (`cap_ingestor.py:7-54` subset). */
  val OpNames: Map[Int, String] = Map(
    0 -> "initialDP", 16 -> "assistRequestInstructions",
    17 -> "establishTemporaryConnection", 18 -> "disconnectForwardConnection",
    19 -> "connectToResource", 20 -> "connect", 22 -> "releaseCall",
    23 -> "requestReportBCSMEvent", 24 -> "eventReportBCSM",
    31 -> "continue", 32 -> "initiateCallAttempt", 34 -> "furnishChargingInformation",
    35 -> "applyCharging", 36 -> "applyChargingReport", 55 -> "activityTest")

  /** F19: tshark hex field ("0x1234" or "12:34") → long. */
  def hexToLong(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(regexp_replace(regexp_replace(c, "^0x", ""), ":", ""), 16, 10).cast("long")

  def records(spark: SparkSession, jsonPath: String, pcapName: String): DataFrame =
    extract(spark.read.option("multiLine", "true").json(jsonPath), pcapName)

  /** Column work over the raw `_source.layers` structure, factored so
    * the q42 oracle query drives the identical extraction on a
    * synthesized structure. */
  def extract(raw: DataFrame, pcapName: String): DataFrame = {
    val layers = col("_source").getField("layers")
    def fieldArr(name: String) = layers.getField(name)
    def first(name: String) = element_at(fieldArr(name), 1)

    val opNameMap = typedLit(OpNames.map { case (k, v) => (k.toLong, v) })

    raw.select(
      first("frame.number").cast("long").as("frame_number"),
      // F15: "sec.frac" epoch split
      split(first("frame.time_epoch"), "\\.").getItem(0).cast("long").as("time_epoch"),
      substring(split(first("frame.time_epoch"), "\\.").getItem(1), 1, 6).cast("int").as("useconds_epoch"),
      first("ip.src").as("src_ip"),
      first("ip.dst").as("dst_ip"),
      hexToLong(first("tcap.otid")).as("tcap_otid"),
      hexToLong(first("tcap.dtid")).as("tcap_dtid"),
      first("camel.local").cast("int").as("camel_local"),
      lit(pcapName).as("pcap_filename"))
      .withColumn("camel_op_name", element_at(opNameMap, col("camel_local").cast("long")))
      // F26 (CAMEL variant): tid = otid iff initialDP (local 0) else dtid
      .withColumn("tcap_tid",
        when(col("camel_local") === 0, col("tcap_otid")).otherwise(col("tcap_dtid")))
  }
}
