package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** IVF coarse-quantizer kernel: all-centroid squared-L2 distances,
  * argmin cell, and argsorted probe lists over a centroid matrix held
  * ONCE as a plan-referenced object.
  *
  * Why this exists: the original `ivfCell`/probe-argsort built an
  * `array(sqDist(v, c0), ..., sqDist(v, cN))` expression TREE — N fused
  * dot-product loops plus an N·dim literal array, all INLINED into the
  * generated code. Generated-code size grew O(nCells·dim): at the r12
  * 30× probe (120 cells × 64 dims) Janino failed whole-stage
  * compilation with "Code grows beyond 64 KB" and the ENTIRE stage fell
  * back to interpreted expression evaluation — the silent 50× deopt
  * class BUILD_NOTES documents. This kernel makes generated code O(1):
  * one method call per row; the loops live in compiled Scala the JIT
  * optimizes independently of stage size. The matrix rides task
  * serialization exactly as the former literals did.
  *
  * Bit-exactness contract (oracle replay depends on it): distances are
  * `(VecDot(v,v) - 2.0·VecDot(v,c)) + seqDot(c,c)` with left-to-right
  * double folds over min-length prefixes — the exact fold shapes of the
  * expression tree it replaces; argmin takes the FIRST index attaining
  * the minimum (array_position semantics) and probe selection sorts by
  * (distance, index) under the same total order Spark's array_sort
  * gives doubles (java.lang.Double.compare: NaN greatest, -0.0 < 0.0).
  */
final class IvfKernel(matrix: Array[Array[Float]]) extends Serializable {
  require(matrix.nonEmpty, "IvfKernel: need at least one centroid")
  val nCells: Int = matrix.length

  private val cNorms: Array[Double] = matrix.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i).toDouble * c(i).toDouble; i += 1 }
    acc
  }

  /** Per-centroid squared L2, the exact sqDist fold shapes. */
  def dists(v: ArrayData): Array[Double] = {
    val vn = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < vn) {
      val x = v.getFloat(i).toDouble; vv += x * x; i += 1
    }
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val cent = matrix(c)
      val n = math.min(vn, cent.length)
      var vc = 0.0
      var j = 0
      while (j < n) {
        vc += v.getFloat(j).toDouble * cent(j).toDouble; j += 1
      }
      out(c) = (vv - 2.0 * vc) + cNorms(c)
      c += 1
    }
    out
  }

  /** Argmin cell id, first index on ties (array_position semantics). */
  def cell(v: ArrayData): Int = {
    val d = dists(v)
    var best = 0
    var i = 1
    while (i < d.length) {
      if (java.lang.Double.compare(d(i), d(best)) < 0) best = i
      i += 1
    }
    best
  }

  /** The `nProbe` nearest cell ids, (distance, index)-sorted — the
    * argsort-of-structs shape of the expression tree it replaces.
    */
  def probes(v: ArrayData, nProbe: Int): ArrayData = {
    val d = dists(v)
    val order = Array.range(0, d.length)
      .map(i => (d(i), i))
      .sortBy(identity)(Ordering.Tuple2(Ordering.Double.TotalOrdering,
        Ordering.Int))
    new GenericArrayData(order.take(nProbe).map(_._2))
  }
}

/** Argmin IVF cell assignment — O(1) generated code (see [[IvfKernel]]). */
case class IvfCellExpr(child: Expression, kernel: IvfKernel)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(v: Any): Any =
    kernel.cell(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfKernel", kernel,
      classOf[IvfKernel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.cell($c);")
  }

  override protected def withNewChildInternal(n: Expression): IvfCellExpr =
    copy(child = n)
}

/** Top-`nProbe` IVF probe cells — O(1) generated code (see [[IvfKernel]]). */
case class IvfProbesExpr(child: Expression, kernel: IvfKernel, nProbe: Int)
    extends UnaryExpression {
  require(nProbe > 0 && nProbe <= kernel.nCells,
    s"IvfProbesExpr: nProbe must be in [1, ${kernel.nCells}], got $nProbe")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    kernel.probes(v.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfKernel", kernel,
      classOf[IvfKernel].getName)
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $ref.probes($c, $nProbe);")
  }

  override protected def withNewChildInternal(n: Expression): IvfProbesExpr =
    copy(child = n)
}

object IvfFunctions {
  /** Build one kernel per centroid set; reuse across cell/probe columns
    * of the same operator so the matrix serializes once per task.
    */
  def kernel(centroids: Seq[Array[Float]]): IvfKernel =
    new IvfKernel(centroids.toArray)

  def cellOf(v: Column, k: IvfKernel): Column =
    Bridge.column(IvfCellExpr(Bridge.expression(v), k))

  def probesOf(v: Column, k: IvfKernel, nProbe: Int): Column =
    Bridge.column(IvfProbesExpr(Bridge.expression(v), k, nProbe))
}
