package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The ExactSubstr 63-bit gram key as ONE codegen pass:
  * `unsigned32(hashCode(s)) << 31 | (hashCode(reverse(s)) & 0x7FFFFFFF)` —
  * semantically identical to composing `graft_java_hash` with `reverse`
  * (FunctionsSpec asserts the equivalence), but computed with a single
  * forward + backward fold over one decoded string: no reversed-string
  * allocation, no second toString, and the forward fold is
  * `String.hashCode` itself (JIT-intrinsic, vectorized). The gram
  * exchanges are the hot path of the whole ExactSubstr family
  * (q159/q161/q163–q165), so the key computation must cost like a hash,
  * not like three string allocations — GramLab measured the composed form
  * ADDING more CPU than its shuffle savings bought back; this form is the
  * one that nets positive.
  *
  * Reversal is UTF-16-unit-wise (the backward loop). That matches the
  * DuckDB oracle's `reverse()` + code-point fold exactly on ASCII — the
  * shipped corpus and every store key — but NOT in general: DuckDB
  * reverses by grapheme cluster, so surrogate pairs and combining-mark
  * sequences can reverse differently and land in different hash classes.
  * On a non-ASCII corpus, re-derive the oracle pairing before trusting
  * hashed-arm equality; the q177 collision audit (hashed vs string arms
  * on the actual corpus) is the check that would surface any divergence.
  */
case class GramKeyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    GramKeyExpr.key63(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GramKeyExpr.key63($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): GramKeyExpr =
    copy(child = newChild)
}

object GramKeyExpr {
  val name = "graft_gram_key63"

  /** Shared by the interpreted and codegen paths. */
  def key63(s: String): Long = {
    val h1 = s.hashCode // forward base-31 fold, JIT intrinsic
    var h2 = 0
    var i = s.length - 1
    while (i >= 0) { h2 = 31 * h2 + s.charAt(i); i -= 1 }
    ((h1.toLong & 0xFFFFFFFFL) << 31) | (h2.toLong & 0x7FFFFFFFL)
  }

  val builder: Seq[Expression] => Expression = {
    case Seq(child) => GramKeyExpr(child)
    case other => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "internal")
}
