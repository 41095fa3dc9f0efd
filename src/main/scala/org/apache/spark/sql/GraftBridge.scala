package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column ↔ Expression conversion
  * (Spark 4 moved Column to a backend-agnostic ColumnNode representation;
  * classic-backend extension libraries reach the Catalyst expression
  * through `classic.ExpressionUtils`). This is the only file outside the
  * `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def functionRegistry(spark: SparkSession): org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.functionRegistry

  /** Register a table-valued function (the `SELECT * FROM fn(...)`
    * surface): the builder maps the call's argument expressions to the
    * logical plan the reference resolves to. */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState.tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Analyzed-input logical plan of a DataFrame (classic backend). */
  def logicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame].queryExecution.logical

  /** A sibling session over the same SparkContext with the given
    * extensions applied — what `spark.sql.extensions` would produce at
    * session build (that static conf cannot be changed on a live
    * context, so extension tests construct the session directly). */
  def sessionWithExtensions(spark: SparkSession,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    val ext = new SparkSessionExtensions
    configure(ext)
    // the constructor is private[classic] in Scala but public in
    // bytecode — reflection is the sanctioned-enough path for a test
    // bridge (mirrors what Builder.getOrCreate does internally).
    // Matched by parameter types, not arity, so a Spark minor bump that
    // adds an overload fails loudly here instead of picking the wrong one
    val wanted = Seq(
      classOf[org.apache.spark.SparkContext], classOf[Option[_]],
      classOf[Option[_]], classOf[SparkSessionExtensions],
      classOf[Map[_, _]], classOf[Map[_, _]])
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession]
      .getConstructors.find(_.getParameterTypes.toSeq == wanted)
      .getOrElse(throw new IllegalStateException(
        "classic.SparkSession no longer has the (SparkContext, Option, Option, " +
          "SparkSessionExtensions, Map, Map) constructor — update GraftBridge " +
          "for this Spark version"))
    ctor.newInstance(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sparkContext,
      None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
