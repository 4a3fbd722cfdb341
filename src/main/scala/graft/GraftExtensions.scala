package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ExactDistinctLong, RollingMin5Hash, WinnowFps}

/**
 * Engine extension point: registers graft's custom Catalyst functions at
 * session build time so SQL users get them without imperative registration:
 *
 * {{{
 * SparkSession.builder()
 *   .withExtensions(new GraftExtensions)   // or
 *   .config("spark.sql.extensions", "graft.GraftExtensions")
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite())
    ext.injectFunction((
      FunctionIdentifier("exact_distinct"),
      new ExpressionInfo(classOf[ExactDistinctLong].getName, "exact_distinct"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ExactDistinctLong(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_min5"),
      new ExpressionInfo(classOf[RollingMin5Hash].getName, "rolling_min5"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingMin5Hash(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFps.build(exprs)))
  }
}
