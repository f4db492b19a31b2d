package graft

import graft.functions.{DotProductExpr, GramKeyExpr, JavaHashExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension installer for the library's custom Catalyst surface —
  * add `.config("spark.sql.extensions", "graft.GraftExtensions")` to the
  * session builder and `graft_java_hash` / `graft_dot` resolve in SQL text
  * and `call_function` without any manual registration (the same registry
  * hook the Column-level helpers fall back to lazily for caller-provided
  * sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(JavaHashExpr.name),
      new ExpressionInfo(classOf[JavaHashExpr].getName, JavaHashExpr.name),
      JavaHashExpr.builder))
    ext.injectFunction((
      FunctionIdentifier(DotProductExpr.name),
      new ExpressionInfo(classOf[DotProductExpr].getName, DotProductExpr.name),
      DotProductExpr.builder))
    ext.injectFunction((
      FunctionIdentifier(GramKeyExpr.name),
      new ExpressionInfo(classOf[GramKeyExpr].getName, GramKeyExpr.name),
      GramKeyExpr.builder))
  }
}
