package graft

import graft.functions.JavaHashExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension installer for the library's custom Catalyst surface —
  * add `.config("spark.sql.extensions", "graft.GraftExtensions")` to the
  * session builder and `graft_java_hash` resolves in SQL text and
  * `call_function` without any manual registration (the same registry hook
  * GeoFunctions.javaHash falls back to lazily for caller-provided
  * sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier(JavaHashExpr.name),
      new ExpressionInfo(classOf[JavaHashExpr].getName, JavaHashExpr.name),
      JavaHashExpr.builder))
}
