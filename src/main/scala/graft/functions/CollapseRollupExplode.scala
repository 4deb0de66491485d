package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Opt-in optimizer rule (SURVEY §7.4 stretch): collapse the dashboard
  * round-trip
  * {{{
  * explode(split(concat_ws(SEP, array_sort(collect_set(x))), SEP))
  * }}}
  * — i.e. "collapse a multi-valued attribute to a joined string, then
  * re-explode it" (the Vista_Analisis → chart pattern, A2+E4) — into a
  * direct distinct aggregate over (groupKeys, x), skipping the string
  * materialization, the sort, and the generator entirely.
  *
  * The rewrite is NOT universally semantics-preserving, hence the flag
  * (`spark.graft.collapseRollupExplode`, default false):
  *  - if a value of `x` itself contains the separator, the original
  *    splits it into pieces while the rewrite keeps it whole;
  *  - a group whose `x` values are all null produces one empty-string
  *    row in the original (concat_ws of an empty set → "" → [""]) and
  *    no row in the rewrite.
  * Enable it when the collapsed column is separator-free and non-null —
  * true for the engine's own rollup outputs.
  */
object CollapseRollupExplode extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.collapseRollupExplode", "false")
      .equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case Generate(
          Explode(StringSplit(splitChild: Attribute,
            Literal(sep: UTF8String, StringType),
            Literal(-1, _))),
          unrequired, false, _, Seq(outAttr),
          Aggregate(groupExprs,
            Seq(Alias(ConcatWs(Seq(Literal(sep2: UTF8String, StringType),
              ArraySort(ae: AggregateExpression, _, _))), aliasName)),
            child, _))
          if sep == sep2 &&
            // the aggregate's string column must not be needed upstream
            // (otherwise the rewrite would drop a referenced attribute)
            unrequired == Seq(0) &&
            // split() treats the separator as a REGEX — only collapse
            // when it has no metacharacters, else semantics differ
            sep.toString.matches("[A-Za-z0-9;,_/: -]+") &&
            ae.aggregateFunction.isInstanceOf[CollectSet] &&
            !ae.isDistinct =>
        val x = ae.aggregateFunction.asInstanceOf[CollectSet].child
        // null values never enter collect_set — mirror that before the
        // distinct aggregate
        Aggregate(
          groupExprs :+ x,
          Seq(Alias(x, outAttr.name)(exprId = outAttr.exprId)),
          Filter(IsNotNull(x), child), None)
    }
}
