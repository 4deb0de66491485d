package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.norm.Normalize

/** The survey's v2 stretch (SURVEY §7.3): Unicode normalization as
  * codegen'd `UnaryExpression`s instead of Scala UDFs — no
  * encoder/serialization round-trip per row, stays inside whole-stage
  * codegen (one static kernel call). Kernels mirror the reference's
  * helpers (PIPE:97-122).
  */
object NormalizeKernel {
  // static entry points for generated code
  def nfcClean(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalize.normNfcJvm(s.toString)) // C1
  def nfkdKey(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalize.normKeyJvm(s.toString)) // C2
  def htmlUnescape(s: UTF8String): UTF8String =
    UTF8String.fromString(Normalize.unescapeHtml(s.toString))
}

/** C1 — unescape + NFC + whitespace collapse (null-safe; call sites add
  * the reference's null→"" coalescing).
  */
case class NfcClean(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeKernel.nfcClean(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeKernel.nfcClean($c)")
  override protected def withNewChildInternal(c: Expression): NfcClean =
    copy(child = c)
}

/** C2 — unescape + NFKD + accent fold + lower. */
case class NfkdKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeKernel.nfkdKey(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeKernel.nfkdKey($c)")
  override protected def withNewChildInternal(c: Expression): NfkdKey =
    copy(child = c)
}

/** Full HTML entity unescape (named + numeric forms). */
case class HtmlUnescape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    NormalizeKernel.htmlUnescape(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NormalizeKernel.htmlUnescape($c)")
  override protected def withNewChildInternal(c: Expression): HtmlUnescape =
    copy(child = c)
}

object NormalizeFunctions {
  def nfcClean(c: Column): Column =
    Bridge.column(NfcClean(Bridge.expression(c)))
  def nfkdKey(c: Column): Column =
    Bridge.column(NfkdKey(Bridge.expression(c)))
  def htmlUnescape(c: Column): Column =
    Bridge.column(HtmlUnescape(Bridge.expression(c)))
}
