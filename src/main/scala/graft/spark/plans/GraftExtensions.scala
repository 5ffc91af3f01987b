package graft.spark.plans

import org.apache.spark.sql.{Encoders, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.types.StringType

import graft.ext.Hll
import graft.spark.aggs.HllCountAgg

/** Optimizer rule: rewrite exact `COUNT(DISTINCT stringCol)` into the HLL
  * sketch aggregate (SURVEY.md §4.3's optional rule). Opt-in per session:
  *
  *   spark.conf.set("spark.graft.hll.rewriteCountDistinct", "true")
  *
  * Why this matters at scale: exact COUNT(DISTINCT) expands to an Expand +
  * two exchanges keyed by the distinct value (shuffling every distinct key);
  * the HLL aggregate is one partial-agg pass with a 16KB buffer per group —
  * the distinct values never cross the wire. The trade is the documented
  * ~1.04/sqrt(2^p) relative error.
  */
case class RewriteCountDistinctToHll() extends Rule[LogicalPlan] {
  private val hllP = 14

  private def enabled: Boolean =
    conf.getConfString("spark.graft.hll.rewriteCountDistinct", "false").toBoolean

  private def hllAggExpr(child: Expression, filter: Option[Expression]): AggregateExpression = {
    import org.apache.spark.sql.catalyst.encoders.AgnosticEncoder
    val inEnc = ExpressionEncoder(
      Encoders.STRING.asInstanceOf[AgnosticEncoder[String]]).resolveAndBind()
    // buffers cross the shuffle in the REFERENCE byte format (project
    // invariant — same TransformingEncoder codec every other agg path uses)
    val bufEnc = graft.spark.aggs.SketchEncoders.hllEnc
      .asInstanceOf[ExpressionEncoder[Hll]].resolveAndBind()
    new ScalaAggregator[String, Hll, Long](
      Seq(child), new HllCountAgg(hllP), inEnc, bufEnc,
      false, true, 0, 0, Some("graft_hll_count"))
      .toAggregateExpression(isDistinct = false, filter = filter)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, filter, _)
              if child.dataType == StringType && child.resolved =>
            hllAggExpr(child, filter)
        }
    }
  }
}

/** Session extensions entry point:
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)           // or
  *     .config("spark.sql.extensions", "graft.spark.plans.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteCountDistinctToHll())
  }
}
