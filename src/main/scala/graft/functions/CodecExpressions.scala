package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the BCD decode family (SURVEY §2.11:
  * "tbcd_decode, bcd_swap ... custom Catalyst Expression with doGenCode,
  * registered via FunctionRegistry"). Native expressions, not UDFs: they
  * participate in whole-stage codegen (each `doGenCode` emits a direct
  * static call, no closure/serialization overhead) and are SQL-visible.
  */
abstract class BinaryToStringExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY argument, got ${child.dataType.catalogString}")

  /** Fully-qualified static method implementing the decode. */
  protected def staticCall: String

  override def nullSafeEval(input: Any): Any = {
    val s = eval0(input.asInstanceOf[Array[Byte]])
    if (s == null) null else UTF8String.fromString(s)
  }
  protected def eval0(bytes: Array[Byte]): String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"UTF8String.fromString($staticCall($c))")
}

/** F1: `tbcd_decode(binary) -> string` (`gtp_ingestor.py:268-281`). */
case class TbcdDecode(child: Expression) extends BinaryToStringExpression {
  override def prettyName: String = "tbcd_decode"
  override protected def staticCall: String = "graft.functions.BinaryCodecs.tbcdDecode"
  override protected def eval0(bytes: Array[Byte]): String = BinaryCodecs.tbcdDecode(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** F2/F3: `bcd_swap(binary) -> string` (`gsm_map.py:312-347`). */
case class BcdSwapDecode(child: Expression) extends BinaryToStringExpression {
  override def prettyName: String = "bcd_swap"
  override protected def staticCall: String = "graft.functions.BinaryCodecs.bcdSwapDecode"
  override protected def eval0(bytes: Array[Byte]): String = BinaryCodecs.bcdSwapDecode(bytes)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Static backing for [[NfcNormalize]] — must be an `object` method so
  * codegen can emit a direct static call. The `isNormalized` fast path
  * matters at corpus scale: crawl text is overwhelmingly already-NFC
  * ASCII, and the check is a scan with zero allocation, so the common
  * row costs one pass and returns the input UTF8String unchanged. */
object TextCodecs {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string) -> string`: Unicode NFC canonical composition —
  * the first step of a text-normalization pipeline (Spark has no
  * builtin; DuckDB's `nfc_normalize` is the cross-engine oracle).
  * Codegen-native so it stays inside whole-stage codegen like the BCD
  * family. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    TextCodecs.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextCodecs.nfc($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object CodecExpressions {
  import org.apache.spark.sql.GraftBridge

  def tbcd_decode(c: Column): Column = GraftBridge.column(TbcdDecode(GraftBridge.expression(c)))
  def bcd_swap(c: Column): Column = GraftBridge.column(BcdSwapDecode(GraftBridge.expression(c)))
  def nfc_normalize(c: Column): Column = GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** Register all under their SQL names so `spark.sql("SELECT
    * tbcd_decode(...)")` works (FunctionRegistry path from SURVEY §2.11). */
  def register(spark: SparkSession): Unit = {
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "tbcd_decode", exprs => TbcdDecode(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "bcd_swap", exprs => BcdSwapDecode(exprs.head), "scala_udf")
    GraftBridge.functionRegistry(spark).createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}
