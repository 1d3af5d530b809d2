package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension exposing the engine's custom Catalyst expressions to
  * SQL: `spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * For an already-built session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("equal_lane_count"),
      new ExpressionInfo(classOf[LongArrayEqualCount].getName, "equal_lane_count"),
      (exprs: Seq[Expression]) => LongArrayEqualCount(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "equal_lane_count", exprs => LongArrayEqualCount(exprs(0), exprs(1)), "built-in")
}
