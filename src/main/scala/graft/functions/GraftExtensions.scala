package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  * into the codegen'd `VecDot(a, b)` kernel when both inputs are
  * `array<float>`. Users (and our own older call sites) writing the
  * idiomatic HOF form get kernel performance without changing code; the
  * accumulation order is identical (left-to-right double adds).
  *
  * Semantics guards (the HOF form null-pads unequal lengths and
  * null-propagates null elements, while VecDot folds over min(length)
  * and reads raw floats):
  *  - the replacement is wrapped in `If(size(a) = size(b), VecDot, null)`
  *    so unequal-length (and null) inputs still yield null, exactly like
  *    the zip_with form;
  *  - when either element type is nullable (`containsNull=true`) the
  *    rewrite only fires under
  *    `spark.graft.vecDotRewrite.assumeNoNullElements=true` — the flag is
  *    the user's assertion that the vectors carry no null elements (our
  *    sessions set it; embeddings/features never hold nulls).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, containsNull) =>
      !containsNull || org.apache.spark.sql.internal.SQLConf.get.getConfString(
        "spark.graft.vecDotRewrite.assumeNoNullElements", "false") == "true"
    case _ => false
  }

  /** x (a lambda variable), possibly wrapped in a cast to double. */
  private def isVarOrDoubleCast(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(macc, mv, _),
            Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish @ LambdaFunction(fin: NamedLambdaVariable,
            Seq(fv: NamedLambdaVariable), _))
          if isFloatArray(a) && isFloatArray(b) &&
            cheapInput(a) && cheapInput(b) &&
            isVarOrDoubleCast(mx, x) && isVarOrDoubleCast(my, y) &&
            isVarOrDoubleCast(macc, acc) && isVarOrDoubleCast(mv, v) &&
            fin.exprId == fv.exprId =>
        If(EqualTo(Size(a), Size(b)), VecDot(a, b),
          Literal(null, DoubleType))
    }

  // the rewrite references each input twice (Size guard + kernel);
  // that is free for a column reference but would evaluate a COMPUTED
  // array expression (slice/transform over the embedding) twice per
  // row — exactly the hot path it exists to speed up — so the rule
  // only fires on attribute/literal inputs and leaves computed ones
  // on the single-evaluation zip_with form
  private def cheapInput(e: Expression): Boolean = e match {
    case _: org.apache.spark.sql.catalyst.expressions.Attribute => true
    case _: Literal => true
    case _ => false
  }
}

/** Optimizer rule: rewrite
  * {{{ size(array_intersect(array_distinct(a), array_distinct(b))) }}}
  * over string arrays into the one-hash-set [[StringIntersectSize]]
  * kernel (~35µs → sub-µs per pair at ~50-element sets — it was the
  * dominant cost of the set-similarity verify before the kernel).
  * The `array_distinct` guard is what makes the rewrite EXACT: the
  * kernel counts big-side members of the small-side set, which equals
  * |A ∩ B| only when the sides are duplicate-free, while Spark's
  * `array_intersect` dedups its OUTPUT — on inputs with duplicates
  * the two disagree, so the bare pattern must not fire. Nullable
  * elements are excluded (shingle/token arrays never carry them), and
  * `legacySizeOfNull` must be off (kernel yields null, not -1).
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {
  private def distinctStringArray(e: Expression): Boolean = e match {
    case ad: ArrayDistinct => ad.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, cn) => !cn
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if distinctStringArray(a) && distinctStringArray(b) =>
        StringIntersectSize(a, b)
    }
}

/** Session extension entry point:
  * {{{ spark.sql.extensions=graft.functions.GraftExtensions }}}
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Injects the VecDot optimizer rule and the engine's SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => VecDotRewrite)
    e.injectOptimizerRule(_ => CollapseRollupExplode) // flag-gated, see doc
    e.injectOptimizerRule(_ => IntersectSizeRewrite)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Int])))
  }
}
