package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram shingling kernel. Called from generated code —
  * one static call per row instead of one interpreted lambda per shingle
  * (the `transform(sequence(...), ...)` formulation measured ~10× slower
  * on the documents corpus).
  */
object ShingleKernel {
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toString.trim.split("\\s+")
    if (toks.length >= n) {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    }
  }
}

/** Word n-gram shingles of a string column: tokens i..i+n-1 joined by a
  * single space, one shingle per starting position; texts shorter than n
  * tokens yield one whole-text shingle (so no document is dropped).
  * Matches `list_transform(range(len(w)-n+1), ...)` over
  * `string_split_regex(trim(text), '\s+')` in the DuckDB oracle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
}

object ShingleFunctions {
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}
